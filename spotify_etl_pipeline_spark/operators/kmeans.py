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
) -> list[list[float]]:
    """Fit k centroids; returns them as plain lists (k·d floats).

    Empty clusters keep their previous centroid (standard Lloyd's fix).
    """
    init = (
        vectors.orderBy(id_col)
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
        assigned = assign_clusters(vectors, centroids, vec_col)
        got = _update_centroids(assigned, vec_col)
        merged = [got.get(i, centroids[i]) for i in range(k)]
        shift = max(
            sum((a - b) ** 2 for a, b in zip(old, nw))
            for old, nw in zip(centroids, merged)
        )
        centroids = merged
        if shift < tol:
            break
    return centroids


def inertia(vectors: DataFrame, centroids: list[list[float]], vec_col: str = "v") -> float:
    """Sum of squared distances to the nearest centroid (the k-means loss)."""
    return (
        assign_clusters(vectors, centroids, vec_col)
        .agg(F.sum("_d2").alias("s"))
        .collect()[0]["s"]
    )
