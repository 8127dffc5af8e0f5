"""Distributed Lloyd's k-means over an embedding column (IVF index builder).

The scalable decomposition (same as Spark MLlib's, reimplemented on the
DataFrame API from the public algorithm):

- **assign** — centroids are k·d floats, so they ride to executors as a
  broadcast *literal*; assignment is a narrow map (argmin over k squared
  distances via ``aggregate``/``zip_with``), NO join and NO shuffle.
- **update** — one shuffle: posexplode(vector) → groupBy(cluster, dim) avg
  → re-assemble arrays. Linear in n·d, partial aggregation map-side.
- per-iteration driver collect is k·d values (KB), not data — the classic
  "small state to driver, big data stays put" iterative pattern.

Deterministic throughout: initial centroids are the k lowest-id vectors,
ties in argmin break toward the lower cluster id — reruns and tests get
identical clusterings (no seeded RNG to disagree about).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def train_sample(
    df: DataFrame, cap: int, id_col: str
) -> DataFrame:
    """Deterministic hash-stride subsample down to ~``cap`` rows for
    codebook/centroid training (Faiss's ``max_points_per_centroid``
    convention: k-means quality saturates at a few hundred points per
    centroid, so training on the full corpus is pure waste — the fit
    becomes O(corpus) when it should be O(k)).

    Keeps rows where ``xxhash64(id) % stride == 0`` — unbiased w.r.t. any
    id ordering, and *deterministic*: reruns, retries, and the
    train-vs-serve split all see the same sample (a seeded
    ``df.sample`` would depend on partitioning). No-op when the input
    already fits under the cap, so small/driver-scale fixtures are
    byte-identical with or without the cap.
    """
    n = df.count()
    if cap <= 0 or n <= cap:
        return df
    stride = -(-n // cap)  # ceil: expected kept rows ≈ cap
    return df.filter(F.pmod(F.xxhash64(F.col(id_col)), F.lit(stride)) == 0)


def _dist2(vec_col: str, centroid: list[float]) -> F.Column:
    arr = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(F.col(vec_col), arr, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def assign_clusters(
    vectors: DataFrame, centroids: list[list[float]], vec_col: str = "v"
) -> DataFrame:
    """Narrow-map nearest-centroid assignment: adds ``cluster`` (and the
    squared distance ``_d2``) against a literal centroid array."""
    dists = F.array(*[_dist2(vec_col, c) for c in centroids])
    best = F.array_position(dists, F.array_min(dists)) - 1
    return vectors.withColumn("cluster", best.cast("int")).withColumn(
        "_d2", F.array_min(dists)
    )


def _update_centroids(assigned: DataFrame, vec_col: str) -> dict[int, list[float]]:
    """{cluster_id: new centroid} for every non-empty cluster — keyed so
    the driver loop needs no second job to learn which clusters survived."""
    per_dim = (
        assigned.select(
            "cluster", F.posexplode(F.col(vec_col)).alias("dim", "x")
        )
        .groupBy("cluster", "dim")
        .agg(F.avg("x").alias("mu"))
    )
    rows = (
        per_dim.groupBy("cluster")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "mu"))).alias("pairs"))
        .select("cluster", F.transform("pairs", lambda p: p["mu"]).alias("centroid"))
        .collect()
    )
    return {r["cluster"]: list(r["centroid"]) for r in rows}


def kmeans_fit(
    vectors: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "v",
    max_iter: int = 10,
    tol: float = 1e-6,
    max_points_per_centroid: int = 256,
) -> list[list[float]]:
    """Fit k centroids; returns them as plain lists (k·d floats).

    Empty clusters keep their previous centroid (standard Lloyd's fix).

    Training runs on a deterministic :func:`train_sample` capped at
    ``max_points_per_centroid * k`` rows (0 disables) — assignment of the
    full corpus happens at *serve* time, never inside the fit loop, so
    index-build cost is constant in corpus size. The cap does not bind at
    the driver fixture scale (≤2 K vectors), so fitted centroids there are
    identical to the uncapped fit.
    """
    sampled = train_sample(vectors, max_points_per_centroid * k, id_col)
    # persist only when the cap actually bound: the iteration loop re-reads
    # the training set max_iter times, and without the pin each pass would
    # re-scan (and re-filter) the full source — O(corpus·iters), exactly
    # what the cap exists to avoid
    pinned = sampled is not vectors
    train = sampled.select(id_col, vec_col)
    if pinned:
        train = train.persist()
    try:
        init = (
            train.orderBy(id_col)
            .limit(k)
            .select(vec_col)
            .collect()
        )
        if len(init) < k:
            raise ValueError(
                f"k={k} exceeds the number of input vectors ({len(init)})"
            )
        centroids = [list(map(float, r[vec_col])) for r in init]
        for _ in range(max_iter):
            assigned = assign_clusters(train, centroids, vec_col)
            got = _update_centroids(assigned, vec_col)
            merged = [got.get(i, centroids[i]) for i in range(k)]
            shift = max(
                sum((a - b) ** 2 for a, b in zip(old, nw))
                for old, nw in zip(centroids, merged)
            )
            centroids = merged
            if shift < tol:
                break
    finally:
        if pinned:
            train.unpersist()
    return centroids


def inertia(vectors: DataFrame, centroids: list[list[float]], vec_col: str = "v") -> float:
    """Sum of squared distances to the nearest centroid (the k-means loss)."""
    return (
        assign_clusters(vectors, centroids, vec_col)
        .agg(F.sum("_d2").alias("s"))
        .collect()[0]["s"]
    )
