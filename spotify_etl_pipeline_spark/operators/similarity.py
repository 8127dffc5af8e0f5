"""Similarity search over embedding columns (SURVEY.md X3).

Two tiers:

- :func:`brute_force_topk` — exact cosine top-k: query×corpus join, dot
  products in double precision via ``zip_with``/``aggregate`` (JVM-side, no
  UDF), per-query top-k via a rank window. Exact and oracle-checkable; cost
  O(|Q|·|C|·d) — the baseline and the verifier for the approximate tier.
- :func:`ivf_topk` — IVF-style blocking: assign every vector to its nearest
  centroid (here the data's ``label`` cluster centroids, computed with one
  groupBy — at scale you'd run k-means the same shape), then search only
  within the query's ``n_probe`` nearest clusters. Shuffle is an equi-join
  on centroid id, cutting the pairwise work by ~n_clusters/n_probe. Recall
  vs brute force is asserted in tests (approximate ⇒ rows-only oracle).

Papers: inverted-file ANN (IVF) per Jégou et al.; LSH banding per the
classic MinHash scheme — public-domain algorithms, implemented here from
scratch on DataFrame ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _as_double(df: DataFrame, id_col: str = "vec_id") -> DataFrame:
    # zero-norm guard: a 0-vector's cosine is undefined; 0/0 throws
    # DIVIDE_BY_ZERO under Spark 4's default ANSI mode (and yields NaN,
    # which Spark sorts ABOVE every real value in DESC order, with ANSI
    # off) — nulling the norm makes the cosine null, which comparisons
    # and filters drop and DESC ordering sorts last.
    norm = F.sqrt(F.aggregate("v", F.lit(0.0), lambda acc, x: acc + x * x))
    return df.select(
        F.col(id_col),
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    ).select(id_col, "v", F.when(norm > 0, norm).alias("nrm"))


def _cosine(a_v, b_v, a_n, b_n):
    dot = F.aggregate(
        F.zip_with(a_v, b_v, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    return dot / (a_n * b_n)


def brute_force_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 5
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector (self-matches
    excluded). Deterministic rank: (cosine desc, neighbor id asc)."""
    c = _as_double(corpus).alias("c")
    q = _as_double(queries).alias("q")
    cos = _cosine(F.col("q.v"), F.col("c.v"), F.col("q.nrm"), F.col("c.nrm"))
    scored = (
        q.join(c, F.col("q.vec_id") != F.col("c.vec_id"))
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("c.vec_id").alias("neighbor_id"),
            cos.alias("cos"),
        )
        .filter(F.col("cos").isNotNull())  # zero-norm pairs have no cosine
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos", 4).alias("cosine"))
    )


def cluster_centroids(corpus: DataFrame, cluster_col: str = "label") -> DataFrame:
    """Per-cluster mean vector via posexplode + groupBy(cluster, dim) —
    the distributed centroid computation (same shape as a k-means step)."""
    exploded = corpus.select(
        F.col(cluster_col).alias("cluster"),
        F.posexplode(F.transform("embedding", lambda x: x.cast("double"))).alias(
            "dim", "x"
        ),
    )
    per_dim = exploded.groupBy("cluster", "dim").agg(F.avg("x").alias("mu"))
    return (
        per_dim.groupBy("cluster")
        .agg(
            F.array_sort(F.collect_list(F.struct("dim", "mu"))).alias("pairs")
        )
        .select(
            "cluster", F.transform("pairs", lambda p: p["mu"]).alias("centroid")
        )
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 2,
    cluster_col: str = "label",
) -> DataFrame:
    """IVF ANN: search only the ``n_probe`` clusters whose centroids are
    nearest (cosine) to the query. Returns the same schema as
    :func:`brute_force_topk`; recall < 1 by construction."""
    cents = cluster_centroids(corpus, cluster_col)
    q = _as_double(queries).alias("q")
    ce = cents.alias("ce")
    cnorm = F.sqrt(
        F.aggregate(F.col("ce.centroid"), F.lit(0.0), lambda acc, x: acc + x * x)
    )
    qc_cos = _cosine(F.col("q.v"), F.col("ce.centroid"), F.col("q.nrm"), cnorm)
    wq = Window.partitionBy("query_id").orderBy(F.desc("c_cos"), F.asc("cluster"))
    probes = (
        q.crossJoin(F.broadcast(ce))
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("ce.cluster").alias("cluster"),
            qc_cos.alias("c_cos"),
        )
        .withColumn("crank", F.row_number().over(wq))
        .filter(F.col("crank") <= n_probe)
        .select("query_id", "cluster")
    )
    c = (
        corpus.select(F.col("vec_id"), F.col(cluster_col).alias("cluster"), "embedding")
        .alias("corp")
    )
    cd = _as_double(c.select("vec_id", "embedding")).alias("c")
    member = c.select("vec_id", "cluster").alias("m")
    qd = _as_double(queries).alias("q2")
    cos = _cosine(F.col("q2.v"), F.col("c.v"), F.col("q2.nrm"), F.col("c.nrm"))
    candidates = (
        probes.join(member, "cluster")
        .select("query_id", F.col("m.vec_id").alias("cand_id"))
        .filter(F.col("query_id") != F.col("cand_id"))
    )
    scored = (
        candidates.join(qd, candidates.query_id == F.col("q2.vec_id"))
        .join(cd, candidates.cand_id == F.col("c.vec_id"))
        .select("query_id", F.col("cand_id").alias("neighbor_id"), cos.alias("cos"))
        .filter(F.col("cos").isNotNull())  # zero-norm pairs have no cosine
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos", 4).alias("cosine"))
    )
