"""Product quantization (PQ) for billion-scale ANN (SURVEY.md X3 tier).

Public algorithm per Jégou, Douze, Schmid, "Product Quantization for
Nearest Neighbor Search" (TPAMI 2011), implemented from scratch on
DataFrame ops. Complements the existing ANN tiers: int8 scalar
quantization keeps d bytes/vector (4× smaller than float32); PQ keeps
``m`` bytes/vector (m=4 on d=64 → 64× smaller), which is what makes a
RAM-resident index possible at 10⁹+ vectors.

Decomposition (all public Spark API, no UDFs):

- **fit** — split each vector into ``m`` contiguous subvectors; run the
  existing distributed Lloyd's k-means (:mod:`.kmeans`) per subspace for a
  ``k``-entry codebook each. Codebooks are m·k·(d/m) = k·d floats — driver
  state, like k-means centroids.
- **encode** — per subspace, nearest-codeword id via the same
  literal-centroid argmin as k-means assignment: a narrow map producing
  ``m`` small ints per vector. No shuffle.
- **ADC scoring** (asymmetric distance computation) — the query stays
  un-quantized: per (query, subspace, codeword) the squared distance to
  the codeword is computed ONCE into a lookup table of |Q|·m·k rows
  (tiny — broadcasts), and every candidate's approximate distance is the
  sum of its ``m`` table hits. Scoring a candidate reads m CODES + m
  table lookups instead of d floats — the memory-traffic win that defines
  PQ. In DataFrame terms: explode corpus codes to (vec_id, sub, code)
  rows, equi-join the broadcast LUT, groupBy pair → sum. The explosion is
  linear (n·m rows) and the join is broadcast-hash — no all-pairs
  anything; compose with IVF probe routing for candidate generation at
  scale (IVFADC), exactly as the int8 tier composes.

Approximate by construction (codebooks are k-means fits) → rows-only
driver checks; recall floors vs the exact L2 baseline are asserted in
tests/test_similarity.py.

Measured dead end, do not re-try: replacing the per-query top-k window
with a two-phase grouped top-k (local ``slice(array_sort(collect_list))``
per (spark_partition_id, query), then a tiny merge — shuffle ≤
keys·partitions·k rows) benched 6× SLOWER on a persisted 30 M-row scored
set at the sf10 tile (12.6 s vs the window's 2.1 s), even with
``objectHashAggregate.sortBased.fallbackThreshold`` raised so the hash
path never degraded to sort. ObjectHashAggregate's per-row struct
allocation and unbounded list buffers cost more than the window's single
linear re-shuffle + tight radix-ish sort. The window IS the fast per-key
top-k on Spark; shrink its INPUT (IVF probing, shortlists) rather than
re-plumbing the operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .kmeans import _dist2
from .skew import widen_narrow_scan


def _as_double_vec(df: DataFrame, id_col: str = "vec_id") -> DataFrame:
    return df.select(
        F.col(id_col),
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )


def _sub_slice(vec_col, sub: int, sub_d: int):
    # slice() is 1-based
    return F.slice(vec_col, sub * sub_d + 1, sub_d)


def _books_literal_sql(codebooks: list[list[list[float]]]) -> str:
    """The codebooks as one nested array literal
    (array<array<array<double>>>, indexed [sub][code][dim]). Every element
    is a foldable literal, so Catalyst constant-folds the whole tree into
    a single Literal — evaluated zero times per row, broadcast with the
    plan. The data-level loops below (`transform` over the codeword axis)
    keep the EXPRESSION tree O(1) in m and k; building m·k separate
    fold-columns instead measures ~4× slower at identical arithmetic
    (same interpreted-HOF lesson as similarity._band_buckets_expr)."""
    return (
        "array("
        + ", ".join(
            "array("
            + ", ".join(
                "array(" + ", ".join(f"{x!r}D" for x in cw) + ")" for cw in book
            )
            + ")"
            for book in codebooks
        )
        + ")"
    )


def _sub_dists_sql(books_sql: str, vec_sql: str, sub_sql: str) -> str:
    """Squared L2 distances from ``vec_sql`` (a sub_d-length array) to
    every codeword of subspace ``sub_sql`` — a data-level loop over the
    codeword axis, ONE aggregate-fold expression regardless of k."""
    return f"""
    transform(element_at({books_sql}, {sub_sql} + 1), cw ->
      aggregate(zip_with({vec_sql}, cw, (a, b) -> (a - b) * (a - b)),
                0.0D, (acc, x) -> acc + x))
    """


def _argmin_sql(dists_sql: str) -> str:
    """0-based argmin (ties toward the lower index) with the distance
    array evaluated ONCE: Spark SQL has no let-binding, so the array is
    bound through a single-element `transform` lambda — without it,
    array_position + array_min would each re-evaluate the fold chain."""
    return f"""
    element_at(transform(array(({dists_sql})), ds ->
      CAST(array_position(ds, array_min(ds)) - 1 AS INT)), 1)
    """


def pq_fit(
    vectors: DataFrame,
    m: int = 4,
    k: int = 16,
    id_col: str = "vec_id",
    max_iter: int = 4,
    tol: float = 1e-6,
    max_points_per_centroid: int = 256,
) -> list[list[list[float]]]:
    """Fit ``m`` codebooks of ``k`` codewords each. Returns
    codebooks[sub][code] = centroid (length d/m).

    All ``m`` subspace k-means run FUSED in one iteration loop: the
    corpus explodes once into (id, sub, subvector) rows (persisted —
    every iteration re-reads this, not the source scan), assignment picks
    the row's own subspace codebook via a CASE chain, and the update step
    is ONE groupBy(sub, cluster, dim) shuffle returning m·k·(d/m) = k·d
    floats to the driver. Per iteration: 1 job, not m — on a driver-loop
    iterative algorithm the job count IS the wall time (measured 14 s →
    3 s at sf0.1 for m=4). Same determinism contract as
    :func:`.kmeans.kmeans_fit`: init = each subspace's k lowest-id
    subvectors, argmin ties toward the lower code id, empty clusters
    keep their previous centroid.

    Measured dead end, do not re-try: binding the codebook from a
    broadcast-joined COLUMN instead of the literal (to reuse codegen
    across iterations) is ~40% SLOWER at this size — the per-iteration
    createDataFrame + broadcast round-trip costs more than the literal's
    recompile.
    """
    from .kmeans import train_sample

    # Faiss-style training cap (max_points_per_centroid * k rows via a
    # deterministic hash-stride sample): codebook quality saturates at a
    # few hundred points per codeword, so the fit loop must not scale with
    # the corpus — encode/serve passes see every vector, training doesn't.
    # Does not bind at driver fixture scale (≤2 K vectors): codebooks
    # there are identical to the uncapped fit.
    d = _as_double_vec(
        train_sample(vectors, max_points_per_centroid * k, id_col), id_col
    )
    init_rows = d.orderBy(id_col).limit(k).select("v").collect()
    if len(init_rows) < k:
        raise ValueError(f"k={k} exceeds the number of input vectors")
    n_dims = len(init_rows[0]["v"])
    if n_dims % m:
        raise ValueError(f"dim {n_dims} not divisible into {m} subspaces")
    sub_d = n_dims // m
    books = [
        [
            [float(x) for x in r["v"][sub * sub_d : (sub + 1) * sub_d]]
            for r in init_rows
        ]
        for sub in range(m)
    ]
    sub_rows = None
    for s in range(m):
        part = d.select(
            F.lit(s).alias("sub"), _sub_slice(F.col("v"), s, sub_d).alias("v")
        )
        sub_rows = part if sub_rows is None else sub_rows.unionByName(part)
    sub_rows = sub_rows.persist()
    try:
        for _ in range(max_iter):
            assigned = sub_rows.withColumn(
                "cluster",
                F.expr(
                    _argmin_sql(
                        _sub_dists_sql(_books_literal_sql(books), "v", "sub")
                    )
                ),
            )
            # update step: ONE groupBy(sub, cluster) with a per-dim AVG
            # column per subspace dimension (sub_d small by construction
            # — it is the codeword width).  r12: previously posexplode'd
            # the subvectors to (sub, cluster, dim, x) rows and
            # re-assembled per-dim means with a SECOND groupBy +
            # array_sort — an extra exchange and a sub_d× wider shuffle
            # per iteration for the same means (guide §2.3/§2.4); on a
            # driver-loop fit the per-iteration stage count IS the wall
            # time (the docstring's 14 s → 3 s lesson, same lever).
            got = {
                (r["sub"], r["cluster"]): [r[f"_m{i}"] for i in range(sub_d)]
                for r in assigned.groupBy("sub", "cluster")
                .agg(
                    *[
                        F.avg(F.col("v")[i]).alias(f"_m{i}")
                        for i in range(sub_d)
                    ]
                )
                .collect()
            }
            merged = [
                [
                    list(got[(s, c)]) if (s, c) in got else books[s][c]
                    for c in range(k)
                ]
                for s in range(m)
            ]
            shift = max(
                sum((a - b) ** 2 for a, b in zip(old, nw))
                for s in range(m)
                for old, nw in zip(books[s], merged[s])
            )
            books = merged
            if shift < tol:
                break
    finally:
        sub_rows.unpersist()
    return books


def _encode_batches(codebooks: list[list[list[float]]]):
    """mapInArrow kernel for :func:`pq_encode`: per-row nearest codeword
    per subspace, BIT-IDENTICAL to the HOF fold it replaces (guide §4.2
    — the encode pass is the index build's one corpus-scale map, and
    interpreted ``transform``/``aggregate`` lambdas cost ~µs/row where
    the vectorized kernel costs ~ns/row):

    - distances accumulate (a-b)² LEFT-TO-RIGHT over the sub_d axis
      (an explicit loop of vectorized adds — NOT np.sum, whose 8-way
      pairwise accumulation associates differently above n=8), starting
      from the same +0.0, in float64 — the identical IEEE operation
      sequence as the SQL ``aggregate`` fold;
    - np.argmin returns the FIRST index attaining the minimum — the
      same tie rule as ``array_position(ds, array_min(ds))``.

    The input batch's id/keep columns pass through untouched; the
    kernel appends ``pq_codes`` (list<int32>, m per row) built from one
    flat values buffer."""

    def fn(batches):
        import numpy as np
        import pyarrow as pa

        m = len(codebooks)
        sub_d = len(codebooks[0][0])
        books = np.asarray(codebooks, dtype=np.float64)  # (m, k, sub_d)
        k = books.shape[1]
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            emb = batch.column(batch.num_columns - 1)
            vals = emb.flatten()  # offset-safe, zero-copy child slice
            if len(vals) != n * m * sub_d:
                raise ValueError(
                    "pq_encode: ragged/null embedding batch "
                    f"({len(vals)} values for {n} rows of dim {m * sub_d})"
                )
            flat = np.asarray(vals, dtype=np.float64).reshape(n, m * sub_d)
            codes = np.empty((n, m), dtype=np.int32)
            for s in range(m):
                x = flat[:, s * sub_d : (s + 1) * sub_d]
                diff = x[:, None, :] - books[s][None, :, :]  # (n, k, sub_d)
                sq = diff * diff
                acc = sq[:, :, 0].copy()
                for j in range(1, sub_d):  # left-to-right, as the fold
                    acc += sq[:, :, j]
                codes[:, s] = np.argmin(acc, axis=1)
            offsets = pa.array(
                np.arange(0, (n + 1) * m, m, dtype=np.int32)
            )
            pq_codes = pa.ListArray.from_arrays(
                offsets, pa.array(codes.reshape(-1))
            )
            yield pa.record_batch(
                [batch.column(i) for i in range(batch.num_columns - 1)]
                + [pq_codes],
                names=[
                    batch.schema.names[i]
                    for i in range(batch.num_columns - 1)
                ]
                + ["pq_codes"],
            )

    return fn


def pq_encode(
    vectors: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, *keep_cols, pq_codes array<int> length m): nearest codeword
    per subspace, ties toward the lower code id. The index build's only
    data pass — no shuffle; r13 runs the m-subspace argmin as ONE
    vectorized mapInArrow kernel (:func:`_encode_batches`) instead of
    the interpreted ``transform``/``aggregate`` HOF expression, with the
    fold order and tie rule preserved bit-for-bit (docstring there).
    ``keep_cols`` rides extra columns through (e.g. the IVF coarse-cell
    id, so the stored index needs no membership join at query time — the
    IVFADC layout)."""
    from pyspark.sql.types import ArrayType, IntegerType, StructField, StructType

    m = len(codebooks)
    sub_d = len(codebooks[0][0])
    src = widen_narrow_scan(vectors)
    d = src.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        # cast to double BEFORE the kernel so rotated (already-double)
        # and raw (float) inputs arrive identically; the kernel's
        # float64 view is then a no-op reinterpretation
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    out_schema = StructType(
        [d.schema[c] for c in ([id_col, *keep_cols])]
        + [StructField("pq_codes", ArrayType(IntegerType(), False), False)]
    )
    return d.mapInArrow(_encode_batches(codebooks), out_schema)


def pq_query_lut(
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
) -> DataFrame:
    """(query_id, sub, code, d2): squared distance from each query's
    subvector to every codeword — |Q|·m·k rows, the broadcast side of ADC
    scoring.

    One data-level expression (the same shape as :func:`pq_encode`'s
    argmin: loops over the sub and codeword axes are ``transform``s over
    the constant-folded codebook literal), then two posexplodes. The
    previous form — m unioned selects, each an ``array()`` of k separate
    fold expressions — generated m·k copies of the fold chain and spent
    whole seconds in Janino before touching a row; the arithmetic and the
    fold order here are element-identical, only the generated-code size
    changes."""
    m = len(codebooks)
    sub_d = len(codebooks[0][0])
    q = _as_double_vec(queries, id_col)
    dists = _sub_dists_sql(
        _books_literal_sql(codebooks), f"slice(v, s * {sub_d} + 1, {sub_d})", "s"
    )
    return (
        q.select(
            F.col(id_col).alias("query_id"),
            F.posexplode(
                F.expr(f"transform(sequence(0, {m - 1}), s -> {dists})")
            ).alias("sub", "d2s"),
        )
        .select("query_id", "sub", F.posexplode("d2s").alias("code", "d2"))
    )


def pq_adc_topk(
    corpus_codes: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 5,
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k by ADC approximate squared L2 distance (ascending), self
    excluded. ``corpus_codes`` is :func:`pq_encode` output.

    Returns (query_id, neighbor_id, rank, adc_d2_micro) — the distance as
    an integer (µ-units) so downstream consumers never compare raw floats.
    """
    lut = pq_query_lut(queries, codebooks, id_col)
    exploded = corpus_codes.select(
        F.col(id_col).alias("neighbor_id"),
        F.posexplode("pq_codes").alias("sub", "code"),
    )
    scored = (
        exploded.join(F.broadcast(lut), ["sub", "code"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("d2").alias("adc_d2"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_d2"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.floor(F.col("adc_d2") * 1_000_000).alias("adc_d2_micro"),
        )
    )


def _exact_rerank(
    short: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact-L2 rerank of shortlisted (query_id, neighbor_id) pairs —
    the refine stage shared by every PQ search variant. Only the
    |Q|·shortlist pairs touch the float vectors; output is the
    :func:`brute_force_l2_topk` schema (query_id, neighbor_id, rank,
    d2_micro)."""
    c = _as_double_vec(corpus, id_col).select(
        F.col(id_col).alias("neighbor_id"), F.col("v").alias("cv")
    )
    q = _as_double_vec(queries, id_col).select(
        F.col(id_col).alias("query_id"), F.col("v").alias("qv")
    )
    d2 = F.aggregate(
        F.zip_with(F.col("qv"), F.col("cv"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = short.join(q, "query_id").join(c, "neighbor_id").select(
        "query_id", "neighbor_id", d2.alias("d2")
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("d2"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.floor(F.col("d2") * 1_000_000).alias("d2_micro"),
        )
    )


def pq_adc_rerank_topk(
    corpus: DataFrame,
    corpus_codes: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 5,
    shortlist: int = 50,
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC shortlist → exact rerank (the production PQ pattern, e.g.
    Faiss ``IndexRefine``): the compressed index ranks a ``shortlist`` of
    candidates per query with approximate distances, then ONLY those
    (|Q|·shortlist) pairs are scored with exact L2 against the float
    vectors. The exact scan touches shortlist/n of the corpus — the
    recall of near-exact search at the memory cost of the PQ index plus
    a bounded refine read.

    Candidate generation here is the FULL corpus (every code row meets
    every query's LUT) — exhaustive-ADC, Faiss ``IndexPQ``. For corpora
    past RAM scale compose with IVF routing instead:
    :func:`pq_ivfadc_topk` scores only probed clusters.

    Returns the :func:`brute_force_l2_topk` schema (query_id, neighbor_id,
    rank, d2_micro) — exact distances, approximate candidate set.
    """
    short = pq_adc_topk(
        corpus_codes, queries, codebooks, k=shortlist, id_col=id_col
    ).select("query_id", "neighbor_id")
    return _exact_rerank(short, corpus, queries, k, id_col)


def pq_ivfadc_topk(
    corpus: DataFrame,
    corpus_codes: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 5,
    shortlist: int = 50,
    n_probe: int = 3,
    cluster_col: str = "label",
    id_col: str = "vec_id",
    probe_mode: str = "mean",
    int_units: bool = False,
    route_corpus: DataFrame | None = None,
) -> DataFrame:
    """IVFADC (Jégou et al. 2011 §IV): IVF probe routing generates the
    candidates, ADC scores ONLY those, exact L2 reranks the shortlist —
    the composition that removes exhaustive-ADC's one scale-killer.

    Per stage at corpus scale (n vectors, C clusters, |Q| queries):

    - **route** — query × C-row centroid table, broadcast by construction
      (:func:`..similarity.ivf_probe_routing`);
    - **ADC** — ONE broadcast join, the same plan shape as exhaustive
      :func:`pq_adc_topk` but with cluster-restricted fan-out: the
      routing table and the per-query LUT pre-join into a
      (cluster, query_id, sub, code, d2) broadcast side (|Q|·n_probe·m·k
      rows — KBs for any sane query batch), and the cluster-tagged
      exploded codes stream through it straight into the map-side
      partial aggregate. Each code row fans out only to queries probing
      its cluster, so the groupBy input is |Q|·n·(n_probe/C)·m rows,
      never |Q|·n·m — and there are ZERO extra shuffles vs the
      exhaustive plan. (A first cut materialized a (query_id,
      neighbor_id) candidate table via probes ⋈ membership and re-joined
      codes on neighbor_id — two added shuffles that made probing
      SLOWER than exhaustive ADC at 200 K × 500 queries, 72 s vs 39 s;
      this fused form is the measured fix.) For |Q| past broadcast
      range, chunk the query batch — each chunk is this same plan;
    - **rerank** — exact L2 on |Q|·shortlist pairs only.

    ``corpus_codes`` may already carry ``cluster_col`` (the stored-index
    layout — encode once, store codes WITH their coarse cell as
    :func:`pq_encode` ``keep_cols`` does); otherwise one linear join
    against ``corpus`` attaches it.

    Recall loses only mass outside probed clusters (vs exhaustive ADC's
    codebook error alone); floors are gated in tests and by the
    ``knn_ivfadc_recall`` driver query.

    Determinism dials (both default off — the quality path): ``probe_mode
    ="pinned"`` routes against lowest-vec_id member vectors instead of
    float cluster means (see :func:`..similarity.ivf_probe_routing`);
    ``int_units=True`` floors each LUT entry to integer micro-units
    BEFORE the m-term ADC sum, making the sum exact integer arithmetic
    with no float addition-order dependence (the ``knn_pq_pinned_topk``
    convention).  Together with init-only codebooks they make the whole
    pipeline value-hash-reproducible on an external SQL engine.

    ``route_corpus`` (default: ``corpus``) is the relation the coarse
    quantizer's representatives derive from — the FROZEN-INDEX dial: an
    append-maintained index routes against the representatives of the
    ORIGINAL build (appends must not move cells or change routing), so
    the incremental serve passes the base corpus here while ``corpus``
    itself is the base∪appended union the rerank scans.
    """
    from .similarity import ivf_probe_routing

    probes = ivf_probe_routing(
        corpus if route_corpus is None else route_corpus,
        queries, n_probe, cluster_col, mode=probe_mode,
    )
    lut = pq_query_lut(queries, codebooks, id_col)
    if int_units:
        lut = lut.select(
            "query_id", "sub", "code",
            F.floor(F.col("d2") * 1_000_000).alias("d2"),
        )
    probe_lut = probes.join(lut, "query_id").select(
        F.col("cluster"), "query_id", "sub", "code", "d2"
    )
    if cluster_col in corpus_codes.columns:
        coded = corpus_codes
    else:
        coded = corpus_codes.join(
            corpus.select(id_col, cluster_col), id_col
        )
    exploded = coded.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(cluster_col).alias("cluster"),
        F.posexplode("pq_codes").alias("sub", "code"),
    )
    scored = (
        exploded.join(F.broadcast(probe_lut), ["cluster", "sub", "code"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("d2").alias("adc_d2"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adc_d2"), F.asc("neighbor_id")
    )
    short = (
        scored.withColumn("srank", F.row_number().over(w))
        .filter(F.col("srank") <= shortlist)
        .select("query_id", "neighbor_id")
    )
    return _exact_rerank(short, corpus, queries, k, id_col)


def cluster_reference_vectors(
    corpus: DataFrame,
    cluster_col: str = "label",
    id_col: str = "vec_id",
    mode: str = "pinned",
) -> DataFrame:
    """(cluster, cv): one reference vector per coarse cell — the value
    residual encoding subtracts.  ``mode="pinned"`` takes each cell's
    lowest-``id_col`` member vector (a data row: bit-reproducible on an
    external SQL engine, the coarse-quantizer analogue of
    ``pq_fit(max_iter=0)``); ``mode="mean"`` takes the float per-cell
    mean (the quality choice; summation-order-dependent, so rows-only).
    One partial-agg groupBy over the corpus, C output rows — always a
    broadcast side."""
    d = corpus.select(
        F.col(cluster_col).alias("cluster"),
        F.col(id_col),
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    if mode == "pinned":
        return d.groupBy("cluster").agg(F.min_by("v", id_col).alias("cv"))
    if mode == "mean":
        from .similarity import cluster_centroids

        return cluster_centroids(corpus, cluster_col).select(
            "cluster", F.col("centroid").alias("cv")
        )
    raise ValueError(f'mode must be "pinned" or "mean", got {mode!r}')


def pq_ivfadc_residual_topk(
    corpus: DataFrame,
    queries: DataFrame,
    m: int = 4,
    k_codes: int = 16,
    k: int = 5,
    shortlist: int = 50,
    n_probe: int = 3,
    cluster_col: str = "label",
    id_col: str = "vec_id",
    coarse_mode: str = "pinned",
    books_max_iter: int = 0,
    int_units: bool = True,
    materialize_index: bool = True,
) -> DataFrame:
    """IVFADC with RESIDUAL encoding — the composition as Jégou et al.
    2011 §IV.A actually publish it (and as Faiss ``IndexIVFPQ`` ships
    it): PQ quantizes the residual r(x) = x − c(cell(x)) instead of x,
    so the codebooks spend their 2^codebits only on what the coarse
    quantizer failed to explain — residual variance is what is left
    AFTER cell assignment, so quantization error drops at the same code
    budget (reconstruction-error differential pinned in
    tests/test_pq_residual.py).  :func:`pq_ivfadc_topk` is the
    raw-vector variant kept for the shared-LUT optimization it enables
    (ONE LUT per query); residual encoding needs one LUT per (query,
    probed cell) — |Q|·n_probe·m·k broadcast rows instead of |Q|·m·k,
    still KBs for any sane batch, and the heavy ADC stage is the
    IDENTICAL fused broadcast-join + map-side partial aggregate over
    cluster-restricted code rows (no extra shuffle vs the raw variant;
    the only added corpus-side work is one broadcast join subtracting
    the cell reference at encode time).

    Determinism dials (all default ON — this operator's driver entry is
    full value-hash): ``coarse_mode="pinned"`` cell references +
    routing against lowest-id member vectors, ``books_max_iter=0``
    init-only residual codebooks, ``int_units=True`` micro-unit integer
    ADC.  The quality configuration (kmeans cells, ``coarse_mode=
    "mean"``, trained books, float ADC) is exercised by the recall
    differential test against the raw-vector variant.
    """
    from .similarity import ivf_probe_routing

    cents = cluster_reference_vectors(corpus, cluster_col, id_col, coarse_mode)
    d = corpus.select(
        F.col(id_col),
        F.col(cluster_col).alias("cluster"),
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    resid = d.join(F.broadcast(cents), "cluster").select(
        id_col,
        "cluster",
        F.zip_with("v", "cv", lambda a, b: a - b).alias("embedding"),
    )
    books = pq_fit(
        resid, m=m, k=k_codes, id_col=id_col, max_iter=books_max_iter
    )
    codes = pq_encode(resid, books, id_col=id_col, keep_cols=("cluster",))
    if materialize_index:
        # The encoded index IS the stored artifact (in production it is
        # written once and served many times — the raw variant's entries
        # persist it for the same reason). Leaving it lazy lets the
        # search DAG's several jobs (broadcast builds, AQE stages, the
        # rerank branch) re-evaluate the join+encode lineage repeatedly:
        # measured 61.7 s → ~18 s at the 200 K-vector tile with this
        # eager localCheckpoint (SCALE.md §Round-7). localCheckpoint,
        # not persist: nothing left registered in the cache manager
        # (the iterative-operator hygiene convention).
        codes = codes.localCheckpoint(eager=True)
    probes = ivf_probe_routing(
        corpus, queries, n_probe, cluster_col, mode=coarse_mode
    )
    q = _as_double_vec(queries, id_col)
    qres = (
        probes.join(
            q.select(F.col(id_col).alias("query_id"), "v"), "query_id"
        )
        .join(F.broadcast(cents), "cluster")
        .select(
            "query_id",
            "cluster",
            F.zip_with("v", "cv", lambda a, b: a - b).alias("v"),
        )
    )
    sub_d = len(books[0][0])
    dists = _sub_dists_sql(
        _books_literal_sql(books), f"slice(v, s * {sub_d} + 1, {sub_d})", "s"
    )
    lut = (
        qres.select(
            "query_id",
            "cluster",
            F.posexplode(
                F.expr(f"transform(sequence(0, {m - 1}), s -> {dists})")
            ).alias("sub", "d2s"),
        )
        .select(
            "query_id", "cluster", "sub", F.posexplode("d2s").alias("code", "d2")
        )
    )
    if int_units:
        lut = lut.select(
            "query_id", "cluster", "sub", "code",
            F.floor(F.col("d2") * 1_000_000).alias("d2"),
        )
    exploded = codes.select(
        F.col(id_col).alias("neighbor_id"),
        "cluster",
        F.posexplode("pq_codes").alias("sub", "code"),
    )
    scored = (
        exploded.join(F.broadcast(lut), ["cluster", "sub", "code"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("d2").alias("adc_d2"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adc_d2"), F.asc("neighbor_id")
    )
    short = (
        scored.withColumn("srank", F.row_number().over(w))
        .filter(F.col("srank") <= shortlist)
        .select("query_id", "neighbor_id")
    )
    return _exact_rerank(short, corpus, queries, k, id_col)


#: Fixed-stage overhead of the IVFADC plan (coarse routing + probe-LUT
#: pre-join + the rerank stage's smaller-but-extra jobs), expressed in the
#: currency of the cost model: equivalent exhaustive-ADC candidate pairs.
#: Calibrated from the sf10 crossover measurements (SCALE.md): at 200 K
#: vectors / C=10 / n_probe=3, |Q|=10 (2 M pairs, 1.4 M saved) ran FASTER
#: exhaustive, |Q|=500 (100 M pairs, 70 M saved) ran 3.5× faster through
#: IVFADC — 10⁷ sits at the geometric middle of the bracket.
PQ_DISPATCH_OVERHEAD_PAIRS = 10_000_000


def pq_route(
    n_corpus: int, n_queries: int, n_probe: int, n_clusters: int
) -> str:
    """Pick the PQ search plan by estimated candidate volume.

    Exhaustive ADC scores ``|Q|·n`` pairs in one broadcast join;
    IVFADC scores ``|Q|·n·n_probe/C`` but pays fixed extra stages.
    Route to IVFADC exactly when the pairs it AVOIDS outweigh that
    overhead::

        |Q|·n·(1 - n_probe/C)  >  PQ_DISPATCH_OVERHEAD_PAIRS

    ``n_probe >= C`` degenerates to searching everything — exhaustive
    wins by construction (the saved fraction is ≤ 0).
    Returns ``"exhaustive"`` or ``"ivfadc"``.
    """
    if n_probe >= n_clusters:
        return "exhaustive"
    saved = n_queries * n_corpus * (1.0 - n_probe / n_clusters)
    return "ivfadc" if saved > PQ_DISPATCH_OVERHEAD_PAIRS else "exhaustive"


def pq_topk_auto(
    corpus: DataFrame,
    corpus_codes: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 5,
    shortlist: int = 50,
    n_probe: int = 3,
    cluster_col: str = "label",
    id_col: str = "vec_id",
    n_corpus: int | None = None,
    n_queries: int | None = None,
    n_clusters: int | None = None,
    probe_mode: str = "mean",
    int_units: bool = False,
) -> DataFrame:
    """|Q|-aware PQ search dispatch: :func:`pq_adc_rerank_topk`
    (exhaustive ADC, Faiss ``IndexPQ``+refine) below the
    :func:`pq_route` crossover, :func:`pq_ivfadc_topk` above it.

    Both arms return the identical schema and the identical EXACT
    rerank stage, so the dispatch changes cost, not the contract —
    modulo IVFADC's candidate set missing mass outside probed clusters
    (its declared recall trade, gated by ``knn_ivfadc_recall``).

    Sizing constants default to bounded scalar jobs (two counts + one
    distinct-count over the cluster column, the pagerank |V|
    convention); callers that track their index metadata pass them in
    and the dispatch plans with zero extra jobs — the stored-index
    serving path.

    ``probe_mode``/``int_units`` are the IVFADC arm's determinism dials
    (see :func:`pq_ivfadc_topk`); the exhaustive arm ignores them.
    """
    if n_corpus is None:
        n_corpus = corpus.count()
    if n_queries is None:
        n_queries = queries.count()
    if n_clusters is None:
        n_clusters = corpus.select(cluster_col).distinct().count()
    route = pq_route(n_corpus, n_queries, n_probe, n_clusters)
    if route == "exhaustive":
        return pq_adc_rerank_topk(
            corpus, corpus_codes, queries, codebooks,
            k=k, shortlist=shortlist, id_col=id_col,
        )
    return pq_ivfadc_topk(
        corpus, corpus_codes, queries, codebooks,
        k=k, shortlist=shortlist, n_probe=n_probe,
        cluster_col=cluster_col, id_col=id_col,
        probe_mode=probe_mode, int_units=int_units,
    )


def brute_force_l2_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 5
) -> DataFrame:
    """Exact squared-L2 top-k (ascending), self excluded — the baseline
    and recall reference for PQ. Same deterministic tie-break shape as the
    cosine baseline: (distance asc, neighbor id asc)."""
    c = _as_double_vec(widen_narrow_scan(corpus)).alias("c")
    q = _as_double_vec(queries).alias("q")
    d2 = F.aggregate(
        F.zip_with(F.col("q.v"), F.col("c.v"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = q.join(c, F.col("q.vec_id") != F.col("c.vec_id")).select(
        F.col("q.vec_id").alias("query_id"),
        F.col("c.vec_id").alias("neighbor_id"),
        d2.alias("d2"),
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("d2"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.floor(F.col("d2") * 1_000_000).alias("d2_micro"),
        )
    )


# --- OPQ: PCA-rotated product quantization (Ge et al. 2013) -----------------


def _dot_lr(a: list[float], b: list[float]) -> float:
    """Left-to-right IEEE dot product — the index-ordered fold both
    engines (Spark ``aggregate``/``zip_with``, DuckDB ``list_sum``/
    ``list_transform``/``list_zip``) evaluate identically."""
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc


def opq_householders(
    components: list[list[float]], m: int
) -> list[tuple[list[float], float]]:
    """Householder reflections realizing a partial-spectrum OPQ rotation
    (Ge et al. 2013 §3.1, the parametric/eigenvalue-allocation case):
    reflection c maps principal component c onto the FIRST dimension of
    subspace c, so the top-r variance directions land in r DIFFERENT
    subspaces — the balance full OPQ optimizes for, realized for the
    dominant directions the deflated power iteration actually resolves
    (:func:`..ml.power_iteration_components`); the orthogonal
    complement rides along untouched.  Full (non-parametric) OPQ
    alternates rotation and codebook updates; this is the one-shot
    spectral construction.

    Returns ``[(u, s)]`` with u the UNNORMALIZED Householder vector and
    s = u·u: the reflection is x ↦ x − (2·(u·x)/s)·u, which needs no
    square root — every scalar is an index-ordered fold and every
    elementwise op a correctly-rounded IEEE op, so an external SQL
    engine applying the same formulas reproduces the rotation
    bit-for-bit (the pinned-dial oracle convention).  Reflections
    compose left-to-right (reflection c is built from component c
    ALREADY passed through reflections 1..c-1 — the QR recurrence).
    A component already lying on its target axis contributes s ≈ 0 and
    is skipped on BOTH engines (the same s < 1e-24 test).
    """
    d = len(components[0])
    if d % m:
        raise ValueError(f"dim {d} not divisible into {m} subspaces")
    if len(components) > m:
        raise ValueError(
            f"{len(components)} components > {m} subspaces — one balanced "
            "axis target per subspace"
        )
    sub_d = d // m
    hs: list[tuple[list[float], float]] = []
    for c, comp in enumerate(components):
        w = [float(x) for x in comp]
        for u, s in hs:
            t = _dot_lr(w, u)
            coef = 2.0 * t / s
            w = [a - coef * b for a, b in zip(w, u)]
        u = list(w)
        u[c * sub_d] = u[c * sub_d] - 1.0
        s = _dot_lr(u, u)
        if s < 1e-24:
            continue  # already on the target axis — identity reflection
        hs.append((u, s))
    return hs


def opq_rotate(
    vectors: DataFrame,
    householders: list[tuple[list[float], float]],
    id_col: str = "vec_id",
) -> DataFrame:
    """Apply the OPQ rotation: (id, embedding array<double>) with every
    reflection applied in order — rank-1 updates, one narrow projection
    per reflection.  The per-row scalar t = u·x is bound through the
    single-element-``transform`` let-binding (the ``_argmin_sql``
    trick): a plain ``withColumn`` is collapsed into the consuming
    projection by Catalyst, and since subexpression elimination skips
    lambda-bearing expressions the d-step fold would then re-evaluate
    PER OUTPUT ELEMENT — d² interpreted-HOF steps per reflection per
    row, measured 69 s of a 123 s sf10 run before the binding (SCALE.md
    §Round-8).  L2 distances are preserved (reflections are
    orthonormal), so the downstream PQ pipeline runs UNCHANGED on the
    rotated corpus and rotated queries — search lives entirely in
    rotated space."""
    cur = vectors.select(
        F.col(id_col),
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    for u, s in householders:
        u_sql = "array(" + ", ".join(f"{float(x)!r}D" for x in u) + ")"
        t_sql = (
            f"aggregate(zip_with(embedding, {u_sql}, (a, b) -> a * b), "
            "0.0D, (acc, x) -> acc + x)"
        )
        # ((2.0*t)/s)*b association — verbatim the oracle CTEs' formula
        y_sql = (
            f"element_at(transform(array({t_sql}), t -> "
            f"zip_with(embedding, {u_sql}, "
            f"(a, b) -> a - 2.0D * t / {float(s)!r}D * b)), 1)"
        )
        cur = cur.select(id_col, F.expr(y_sql).alias("embedding"))
    return cur


def ivf_assign_cells(
    vectors: DataFrame,
    route_corpus: DataFrame,
    cluster_col: str = "label",
    mode: str = "pinned",
    id_col: str = "vec_id",
) -> DataFrame:
    """Assign NEW vectors to EXISTING coarse cells — the maintenance half
    of an append-only IVF index: (id, cluster_col) with cluster = the
    top-1 probe of the FROZEN coarse quantizer derived from
    ``route_corpus`` (the original build's corpus).

    Assignment IS 1-probe routing — literally the same operator
    (:func:`..similarity.ivf_probe_routing`), so an appended vector
    lands exactly in the cell any query probing near it will route to;
    ``mode="pinned"`` keeps the whole thing bit-reproducible
    cross-engine (lowest-id member representatives, index-ordered
    cosine folds, ties cos DESC / cluster ASC).  The quantizer table is
    C rows broadcast; the appended batch streams through it — one
    narrow pass, no shuffle wider than the batch.
    """
    from .similarity import ivf_probe_routing

    # ivf_probe_routing reads the query id from ``vec_id`` specifically;
    # rename on the way in so a non-default id_col round-trips instead of
    # failing with a missing-column AnalysisException (ADVICE r9)
    vecs = (
        vectors if id_col == "vec_id"
        else vectors.withColumnRenamed(id_col, "vec_id")
    )
    return ivf_probe_routing(
        route_corpus, vecs, n_probe=1, cluster_col=cluster_col, mode=mode
    ).select(
        F.col("query_id").alias(id_col), F.col("cluster").alias(cluster_col)
    )


def pq_encode_append(
    delta: DataFrame,
    base_corpus: DataFrame,
    codebooks: list[list[list[float]]],
    cluster_col: str = "label",
    id_col: str = "vec_id",
    assign_mode: str = "pinned",
) -> DataFrame:
    """Encode an APPENDED vector batch against a frozen index:
    (id, cluster_col, pq_codes) — coarse cell from
    :func:`ivf_assign_cells` (frozen quantizer = ``base_corpus``'s
    representatives), codes from the FROZEN ``codebooks``.  Union the
    result with the base build's code table and serve
    :func:`pq_ivfadc_topk` over it with ``route_corpus=base_corpus`` —
    the Faiss ``IndexIVFPQ.add`` production shape: appends never refit
    books, never move cells, never touch the stored base codes.

    Per appended batch: one C-row broadcast probe + one narrow
    codebook-literal encode — no shuffle wider than the batch, no
    base-corpus scan at all (the quantizer representatives are the only
    base-derived input, C rows).
    """
    cells = ivf_assign_cells(
        delta.select(id_col, "embedding"), base_corpus,
        cluster_col=cluster_col, mode=assign_mode, id_col=id_col,
    )
    return pq_encode(
        delta.select(id_col, "embedding").join(cells, id_col),
        codebooks, id_col=id_col, keep_cols=(cluster_col,),
    )


def index_apply_tombstones(
    codes: DataFrame, tombstones: DataFrame, id_col: str = "vec_id"
) -> DataFrame:
    """DELETE half of index maintenance — the Faiss ``remove_ids`` shape:
    drop tombstoned rows from a stored code table at serve time via ONE
    left-anti equi-join on the id.

    What deletion does NOT touch mirrors Faiss exactly: the frozen
    codebooks and the frozen coarse quantizer stay as built (inverted
    lists shrink; centroids never move), so a tombstoned vector that
    happened to be a pinned cell representative keeps anchoring routing —
    representatives are index ARTIFACTS derived at build time, not
    served rows.  Because every code row depends only on its own vector
    + the frozen artifacts, the invariant is exact and bit-for-bit:

        serve over (base codes ∪ appended codes) ∖ tombstones
          == serve over a one-shot frozen-artifact encode of the
             surviving vectors alone

    (pinned dials make both sides value-hash stable — the driver entry
    ``knn_ivfadc_deleted_topk`` checks the full chain cross-engine).
    The tombstone table is ids only — typically tiny vs the corpus, and
    mergeable/epoch-appendable like every other store in this repo
    (streaming half: ``streaming.pq_index_stream.run_pq_delete_stream``);
    the anti-join shuffles on the same id key the code table already
    carries, and a broadcast is chosen automatically while the tombstone
    set is small.  Physical deletion (rewriting the code files without
    the dead rows) is compaction, not serving — see
    ``streaming.pq_index_stream.compact_epoch_store``."""
    dead = tombstones.select(F.col(id_col)).distinct()
    return codes.join(dead, id_col, "left_anti")
