"""Similarity search over embedding columns (SURVEY.md X3).

Three tiers:

- :func:`brute_force_topk` — exact cosine top-k: query×corpus join, dot
  products in double precision via ``zip_with``/``aggregate`` (JVM-side, no
  UDF), per-query top-k via a rank window. Exact and oracle-checkable; cost
  O(|Q|·|C|·d) — the baseline and the verifier for the approximate tiers.
- :func:`ivf_topk` — IVF-style blocking: assign every vector to its nearest
  centroid (here the data's ``label`` cluster centroids, computed with one
  groupBy — at scale you'd run k-means the same shape), then search only
  within the query's ``n_probe`` nearest clusters. Shuffle is an equi-join
  on centroid id, cutting the pairwise work by ~n_clusters/n_probe. Recall
  vs brute force is asserted in tests (approximate ⇒ rows-only oracle).
- :func:`lsh_bucketed_ann` — random-hyperplane LSH for *threshold pairs*
  (the blocked scale path of ``dedup.embedding_neardup_pairs``): sign-bit
  signatures from a deterministic coefficient family, candidates from a
  (band, bucket) equi-join, exact cosine verify. No centroids needed, so it
  works on unclustered corpora.

Papers: inverted-file ANN (IVF) per Jégou et al.; LSH banding per the
classic MinHash scheme — public-domain algorithms, implemented here from
scratch on DataFrame ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .skew import widen_narrow_scan

# Deterministic random-hyperplane family for LSH-bucketed ANN: plane p's
# coefficient at (1-based) dimension i is ((A[p]*i + B[p]) % M)/M - 0.5 —
# a fixed LCG-style pseudo-random value in [-0.5, 0.5) that any engine can
# rederive exactly (no RNG state to ship to an oracle). 64 planes
# available; band shape is the recall-vs-blocking dial (see
# lsh_bucketed_ann's docstring for the regime table).
LSH_ANN_M = 997
LSH_ANN_A = (317, 367, 409, 449, 491, 547, 593, 631, 673, 727, 769, 823, 863, 919, 971, 1019, 1061, 1103, 1163, 1217, 1277, 1303, 1373, 1433, 1481, 1523, 1571, 1613, 1667, 1723, 1783, 1847, 1889, 1951, 2003, 2063, 2111, 2153, 2237, 2281, 2339, 2381, 2423, 2477, 2551, 2621, 2677, 2711, 2753, 2803, 2861, 2927, 2999, 3049, 3119, 3187, 3251, 3307, 3347, 3407, 3467, 3529, 3571, 3623)
LSH_ANN_B = (337, 401, 463, 547, 613, 677, 757, 829, 911, 991, 1061, 1129, 1223, 1297, 1399, 1471, 1549, 1613, 1699, 1787, 1877, 1979, 2053, 2131, 2237, 2309, 2383, 2467, 2579, 2671, 2729, 2803, 2903, 3001, 3089, 3203, 3301, 3371, 3467, 3547, 3631, 3719, 3821, 3911, 4003, 4091, 4177, 4261, 4363, 4463, 4561, 4651, 4751, 4861, 4951, 5021, 5113, 5231, 5333, 5431, 5507, 5623, 5693, 5801)


def _as_double(
    df: DataFrame, id_col: str = "vec_id", keep: tuple[str, ...] = ()
) -> DataFrame:
    # zero-norm guard: a 0-vector's cosine is undefined; 0/0 throws
    # DIVIDE_BY_ZERO under Spark 4's default ANSI mode (and yields NaN,
    # which Spark sorts ABOVE every real value in DESC order, with ANSI
    # off) — nulling the norm makes the cosine null, which comparisons
    # and filters drop and DESC ordering sorts last.
    norm = F.sqrt(F.aggregate("v", F.lit(0.0), lambda acc, x: acc + x * x))
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in keep],
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    ).select(id_col, *keep, "v", F.when(norm > 0, norm).alias("nrm"))


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
    # the pairwise cosines evaluate on the corpus side's partitioning (the
    # query side broadcasts) — widen a 1-split corpus scan first
    c = _as_double(widen_narrow_scan(corpus)).alias("c")
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


def filtered_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    match_cols: tuple[str, ...] = ("label",),
) -> DataFrame:
    """Filtered (hybrid) vector search: exact top-k cosine among ONLY the
    candidates matching the query's metadata on ``match_cols``.

    The predicate is part of the join condition, so candidates are pruned
    BEFORE pairwise scoring — pre-filtering. The alternative (post-filter
    an ANN shortlist) silently under-fills top-k when the filter is
    selective; with an equality predicate the filter also acts as a
    blocking key, so at corpus scale this join shuffles on
    ``match_cols`` (hash-partitioned per metadata bucket) instead of
    broadcasting every query against every vector.
    """
    keep = tuple(match_cols)
    c = _as_double(widen_narrow_scan(corpus), keep=keep).alias("c")
    q = _as_double(queries, keep=keep).alias("q")
    cond = F.col("q.vec_id") != F.col("c.vec_id")
    for m in keep:
        cond = cond & (F.col(f"q.{m}") == F.col(f"c.{m}"))
    cos = _cosine(F.col("q.v"), F.col("c.v"), F.col("q.nrm"), F.col("c.nrm"))
    scored = (
        q.join(c, cond)
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("c.vec_id").alias("neighbor_id"),
            cos.alias("cos"),
        )
        .filter(F.col("cos").isNotNull())
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos", 4).alias("cosine"))
    )


def _hyperplane_bit(v_col: str, plane: int) -> F.Column:
    """Sign bit of <v, w_plane> with the deterministic coefficient family.

    Reference formulation (one column per plane) kept for tests/verifiers;
    the production signature stage is :func:`_band_buckets_expr`, which
    folds the same arithmetic into a single expression — the two are
    asserted tuple-identical in tests/test_similarity.py.
    """
    a, b, m = LSH_ANN_A[plane], LSH_ANN_B[plane], LSH_ANN_M
    proj = F.transform(
        v_col,
        lambda x, i: x * (((F.lit(a) * (i + 1) + F.lit(b)) % m) / F.lit(float(m)) - 0.5),
    )
    dot = F.aggregate(proj, F.lit(0.0), lambda acc, x: acc + x)
    return (dot > 0).cast("long")


def _band_buckets_expr(n_planes: int, n_bands: int) -> str:
    """SQL expression: array of per-band bucket ids for the row's vector
    ``v`` — the whole (n_planes signatures → n_bands buckets) stage fused
    into ONE expression tree.

    Why not n_planes separate :func:`_hyperplane_bit` columns: Catalyst
    evaluates higher-order functions interpreted (no whole-stage codegen),
    so expression-tree size is a per-ROW cost — 64 independent aggregate
    folds re-walk their operand setup 64 times and measure 2.2× slower
    than this single nested fold at equal arithmetic (the plane loop
    becomes a data-level ``sequence``, not 64 copies of the subtree). The
    arithmetic and its evaluation order are bit-identical to the
    reference formulation — plane p's coefficient at 1-based dim i is
    ((A[p]*i + B[p]) % M)/M - 0.5, summed in index order — so the DuckDB
    oracle twin (queries/similarity_scale._bit_exprs) needs no change.
    """
    rows_per_band = n_planes // n_bands
    a_arr = "array(" + ",".join(str(a) for a in LSH_ANN_A[:n_planes]) + ")"
    b_arr = "array(" + ",".join(str(b) for b in LSH_ANN_B[:n_planes]) + ")"
    m = LSH_ANN_M
    return f"""
    transform(sequence(0, {n_bands - 1}), band ->
      aggregate(sequence(0, {rows_per_band - 1}), 0L, (acc, r) ->
        acc + CASE WHEN aggregate(
            transform(v, (x, i) ->
              x * ((({a_arr}[band * {rows_per_band} + r] * (i + 1)
                     + {b_arr}[band * {rows_per_band} + r]) % {m})
                   / CAST({m} AS DOUBLE) - 0.5)),
            0.0D, (a2, y) -> a2 + y) > 0
          THEN shiftleft(1L, r) ELSE 0L END))
    """


def lsh_ann_candidates(
    vectors: DataFrame,
    n_planes: int = 30,
    n_bands: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Candidate (vec_a, vec_b) pairs from random-hyperplane LSH banding —
    the blocking stage of :func:`lsh_bucketed_ann`, exposed so candidate
    volume (the thing banding exists to control) can be measured and
    tested without paying the verify step."""
    if n_planes % n_bands:
        raise ValueError("n_planes must divide evenly into n_bands")
    if n_planes > len(LSH_ANN_A):
        raise ValueError(f"at most {len(LSH_ANN_A)} planes available")
    # signatures are the per-row-expensive map stage — widen a 1-split scan
    d = _as_double(widen_narrow_scan(vectors), id_col)
    banded = d.select(
        id_col,
        F.posexplode(F.expr(_band_buckets_expr(n_planes, n_bands))).alias(
            "band", "bucket"
        ),
    )
    from .dedup import _pair_expr

    return (
        banded.groupBy("band", "bucket")
        .agg(F.sort_array(F.collect_list(id_col)).alias("ids"))
        .filter(F.size("ids") >= 2)
        .select(
            F.explode(F.expr(_pair_expr("ids", "x AS vec_a, y AS vec_b"))).alias("p")
        )
        .select("p.vec_a", "p.vec_b")
        .distinct()
    )


def lsh_bucketed_ann(
    vectors: DataFrame,
    threshold: float = 0.45,
    n_planes: int = 30,
    n_bands: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Blocked embedding near-dup pairs: random-hyperplane LSH buckets →
    equi-join candidates → exact cosine verify.

    The scale path for :func:`..dedup.embedding_neardup_pairs`: instead of
    the all-pairs a<b join, vectors only meet inside an LSH bucket. Per
    band, the bucket key packs that band's sign bits into an int; candidate
    pairs are expanded *inside* the (band, bucket) aggregation (same
    no-self-join shape as MinHash-LSH banding — the signature pipeline runs
    once), then verified with an exact double-precision cosine so every
    emitted pair is truly ≥ threshold. Approximate only in RECALL: a pair
    colliding in no band is never scored.

    Band shape is the recall-vs-blocking dial, and it is threshold-bound
    (sign-bit collision prob is 1−θ/π, so low-similarity pairs barely
    correlate): candidate volume ≈ n_bands/2^bits of brute force.

    - threshold ~0.45 (this fixture's near-dup regime): recall forces
      shallow bands — the default 10 bands × 3 bits measures recall
      1.0 / 0.97 at sf0.01 / sf0.1 but candidate volume ≈ brute force.
      Blocking at this threshold is intrinsically weak for ANY sign-bit
      LSH; when the corpus is centroid-clusterable, IVF blocking
      (:func:`ivf_probe_routing`) is the better scale path.
    - threshold ≥0.8 (production near-dup dedup): deepen to 8 bands ×
      8 bits — measured 27× candidate reduction on the fixture (72K vs
      2.0M pairs at sf0.1); catch prob ≈93.5% at cosine 0.9, ≥95% from
      cosine ≈0.92 up (p_bit = 1−acos(s)/π; catch = 1−(1−p_bit^8)^8).

    Recall (shallow config) and blocking factor (deep config) are both
    asserted in tests/test_similarity.py.

    Output schema matches ``embedding_neardup_pairs``:
    (vec_a, vec_b, cosine).
    """
    cand = lsh_ann_candidates(vectors, n_planes, n_bands, id_col)
    d = _as_double(vectors, id_col)
    a = d.select(F.col(id_col).alias("vec_a"), F.col("v").alias("va"), F.col("nrm").alias("na"))
    b = d.select(F.col(id_col).alias("vec_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb"))
    cos = _cosine(F.col("va"), F.col("vb"), F.col("na"), F.col("nb"))
    return (
        cand.join(a, "vec_a")
        .join(b, "vec_b")
        .select("vec_a", "vec_b", cos.alias("cos"))
        .filter(F.col("cos") >= threshold)
        .select("vec_a", "vec_b", F.round("cos", 4).alias("cosine"))
    )


def int8_topk(pairs: DataFrame, k: int = 5) -> DataFrame:
    """Rank (query, neighbor) pairs by INTEGER dot product of their int8
    code vectors and keep the top-k per query.

    ``pairs`` carries (query_id, neighbor_id, qcodes, ccodes); how the pair
    set was generated — brute force or IVF probe routing — is the caller's
    plan. Shared here: the long-seeded zip_with/aggregate dot (codes are
    int8-ranged but held as longs, so no overflow) and the deterministic
    (dot desc, neighbor asc) tie-break. Zero floating point anywhere, so
    the ranking is bit-exact across engines.
    """
    dot = F.aggregate(
        F.zip_with("qcodes", "ccodes", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = pairs.select("query_id", "neighbor_id", dot.alias("dot"))
    w = Window.partitionBy("query_id").orderBy(F.desc("dot"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "dot")
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


def ivf_probe_routing(
    corpus: DataFrame,
    queries: DataFrame,
    n_probe: int = 2,
    cluster_col: str = "label",
    mode: str = "mean",
) -> DataFrame:
    """(query_id, cluster) rows: the ``n_probe`` clusters whose centroids
    are nearest (cosine) to each query — the routing stage shared by every
    IVF-blocked search (float :func:`ivf_topk`, int8-quantized variants).

    ``mode="mean"`` (default) routes against per-cluster MEAN vectors —
    the quality choice, but float means are summation-order-dependent,
    so an external SQL engine cannot rederive them bit-for-bit (the
    reason the IVF-probed entries are rows-only).  ``mode="pinned"``
    routes against each cluster's lowest-vec_id member vector instead
    (the ``pq_fit(max_iter=0)`` determinism convention applied to the
    coarse quantizer): representatives are data rows, cosines are
    index-ordered folds, ties break (cos DESC, cluster ASC) — every
    step bit-reproducible cross-engine, which is what lets an IVFADC
    pipeline carry a full value-hash oracle.

    The centroid table is k rows, so the query×centroid crossJoin is a
    broadcast of a tiny build side by construction — never an all-pairs
    shuffle."""
    if mode == "pinned":
        cents = (
            corpus.select(
                F.col(cluster_col).alias("cluster"),
                "vec_id",
                F.transform("embedding", lambda x: x.cast("double")).alias("v"),
            )
            .groupBy("cluster")
            .agg(F.min_by("v", "vec_id").alias("centroid"))
        )
    elif mode == "mean":
        cents = cluster_centroids(corpus, cluster_col)
    else:
        raise ValueError(f'mode must be "mean" or "pinned", got {mode!r}')
    q = _as_double(queries).alias("q")
    ce = cents.alias("ce")
    cnorm = F.sqrt(
        F.aggregate(F.col("ce.centroid"), F.lit(0.0), lambda acc, x: acc + x * x)
    )
    qc_cos = _cosine(F.col("q.v"), F.col("ce.centroid"), F.col("q.nrm"), cnorm)
    wq = Window.partitionBy("query_id").orderBy(F.desc("c_cos"), F.asc("cluster"))
    return (
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
    probes = ivf_probe_routing(corpus, queries, n_probe, cluster_col)
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
