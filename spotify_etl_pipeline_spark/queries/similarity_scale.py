"""Scale-path similarity queries (SURVEY.md X2/X3): blocked variants of the
exact baselines in :mod:`.similarity_queries` and :mod:`.dedup_queries`.

- ``embedding_lsh_neardup`` — :func:`..operators.similarity.lsh_bucketed_ann`:
  the blocked counterpart of ``dedup_embedding_cosine`` (same output schema,
  same exact-cosine verify) that replaces the all-pairs a<b join with a
  (band, bucket) equi-join over deterministic random-hyperplane signatures.
  Because the hyperplane family is closed-form arithmetic, the WHOLE
  pipeline — sign bits, buckets, candidates, verify — has an exact DuckDB
  oracle: the approximation is *shared* with the oracle, so the row set
  still value-hash-matches.
- ``knn_quantized_ivf`` — int8 dot-product ranking INSIDE IVF-probed
  clusters only: composes ``embedding_quantize_int8`` with
  :func:`..operators.similarity.ivf_probe_routing` so the memory-bound int8
  scan touches ~n_probe/n_clusters of the corpus instead of all of it.
  Probe choice rides on float centroid means (engine-order-dependent), so
  this one is rows-only; recall vs the exact quantized baseline is
  floor-asserted in tests/test_similarity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import similarity as S
from ..schemas import load_fixture
from .catalog import register
from .similarity_queries import quantize_codes

LSH_THRESHOLD = 0.45
N_PLANES = 30
N_BANDS = 10

# Deep production regime (threshold >=0.8 dedup): 8 bands x 8 bits —
# uncorrelated collision 8/256 per pair vs the shallow config's 10/8.
DEEP_PLANES = 64
DEEP_BANDS = 8


def _bit_exprs(n_planes: int) -> str:
    """DuckDB twin of operators.similarity._hyperplane_bit: list_transform's
    lambda index i is 1-based, matching the Spark side's (i + 1)."""
    return ", ".join(
        f"CASE WHEN list_sum(list_transform(v, (x, i) -> "
        f"x * ((({S.LSH_ANN_A[p]} * i + {S.LSH_ANN_B[p]}) % {S.LSH_ANN_M}) "
        f"/ {S.LSH_ANN_M}.0 - 0.5))) > 0 THEN 1 ELSE 0 END AS bit{p}"
        for p in range(n_planes)
    )


def _banded_sql(n_planes: int, n_bands: int) -> str:
    rows = n_planes // n_bands
    return " UNION ALL ".join(
        f"SELECT vec_id, {band} AS band, "
        + " + ".join(f"bit{band * rows + r} * {1 << r}" for r in range(rows))
        + " AS bucket FROM bits"
        for band in range(n_bands)
    )


_BIT_EXPRS = _bit_exprs(N_PLANES)
_BANDED = _banded_sql(N_PLANES, N_BANDS)


@register(
    "embedding_lsh_neardup",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    n AS (
      SELECT vec_id, v,
             NULLIF(sqrt(list_sum(list_transform(v, x -> x * x))), 0) AS nrm
      FROM e
    ),
    bits AS (SELECT vec_id, v, nrm, {_BIT_EXPRS} FROM n),
    banded AS ({_BANDED}),
    cand AS (
      SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM banded a
      JOIN banded b ON a.band = b.band AND a.bucket = b.bucket
                   AND a.vec_id < b.vec_id
    )
    SELECT vec_a, vec_b,
           ROUND(list_sum(list_transform(list_zip(na.v, nb.v), p -> p[1] * p[2]))
                 / (na.nrm * nb.nrm), 4) AS cosine
    FROM cand
    JOIN n na ON cand.vec_a = na.vec_id
    JOIN n nb ON cand.vec_b = nb.vec_id
    WHERE list_sum(list_transform(list_zip(na.v, nb.v), p -> p[1] * p[2]))
          / (na.nrm * nb.nrm) >= {LSH_THRESHOLD}
    """,
    survey="X2,X3",
    doc="Blocked embedding near-dup: random-hyperplane LSH buckets "
    "(10 bands x 3 bits, deterministic coefficient family) -> candidate "
    "equi-join -> exact cosine verify. Scale path of "
    "dedup_embedding_cosine: vectors only meet inside a bucket, never "
    "all-pairs. Oracle rederives the same hyperplanes, so even the "
    "approximation is value-hash-checked.",
)
def embedding_lsh_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.lsh_bucketed_ann(
        load_fixture(spark, sf_dir, "embeddings"),
        threshold=LSH_THRESHOLD,
        n_planes=N_PLANES,
        n_bands=N_BANDS,
    )


@register(
    "lsh_blocking_stats",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    bits AS (SELECT vec_id, {_bit_exprs(DEEP_PLANES)} FROM e),
    banded AS ({_banded_sql(DEEP_PLANES, DEEP_BANDS)}),
    cand AS (
      SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM banded a
      JOIN banded b ON a.band = b.band AND a.bucket = b.bucket
                   AND a.vec_id < b.vec_id
    )
    SELECT (SELECT COUNT(*) FROM e) AS n_vectors,
           (SELECT COUNT(*) FROM e) * ((SELECT COUNT(*) FROM e) - 1) // 2
             AS brute_pairs,
           (SELECT COUNT(*) FROM cand) AS candidate_pairs,
           (SELECT COUNT(*) FROM e) * ((SELECT COUNT(*) FROM e) - 1) // 2
             // GREATEST((SELECT COUNT(*) FROM cand), 1) AS blocking_factor
    """,
    survey="X2,X3",
    doc="Deep-regime LSH blocking observability (8 bands x 8 bits, the "
    "threshold>=0.8 production configuration): candidate-pair volume vs "
    "the all-pairs count, and the resulting blocking factor — the number "
    "you watch at corpus scale to know the banding is pulling its weight. "
    "All-integer output, oracle rederives the same hyperplane family. The "
    "shallow (recall-first) twin embedding_lsh_neardup stays the "
    "correctness path; this entry is the at-scale regime the bench tracks.",
)
def lsh_blocking_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_fixture(spark, sf_dir, "embeddings")
    cand = S.lsh_ann_candidates(emb, n_planes=DEEP_PLANES, n_bands=DEEP_BANDS)
    n_cand = cand.agg(F.count(F.lit(1)).alias("candidate_pairs"))
    n_vec = emb.agg(F.count(F.lit(1)).alias("n_vectors"))
    return (
        n_vec.crossJoin(n_cand)
        # integer div throughout, never a double quotient: counts at corpus
        # scale exceed 2^53, where /-then-truncate can land an ulp off the
        # oracle's BIGINT //
        .withColumn("brute_pairs", F.expr("(n_vectors * (n_vectors - 1)) div 2"))
        .withColumn(
            "blocking_factor",
            F.expr("brute_pairs div greatest(candidate_pairs, 1)"),
        )
        .select("n_vectors", "brute_pairs", "candidate_pairs", "blocking_factor")
    )


@register(
    "knn_ivfadc_topk",
    oracle=None,  # probe routing rides on float centroid means (engine
    # summation order); hash-checked twin: knn_ivfadc_recall (driver
    # evidence), and the machinery itself is value-hash-proven by
    # knn_pq_pinned_topk / knn_pq_auto_forced_ivfadc.
    driver=False,  # VERDICT r9 #5: bench/test arm, out of the sweep
    survey="X3",
    doc="IVFADC (Jégou et al. 2011 §IV) — the composition VERDICT r3 "
    "flagged as the one remaining ANN scale gap: PQ candidate "
    "generation routed through IVF probing (n_probe=3 of 10) so ADC "
    "scores only probed clusters' code rows instead of the full "
    "corpus, then exact rerank of the 50-pair shortlist. The heavy "
    "ADC groupBy carries |cand|*m rows (~n_probe/n_clusters of "
    "exhaustive ADC's |Q|*n*m) — the plan that stands at 10^9 "
    "vectors.",
)
def knn_ivfadc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.pq import pq_encode, pq_fit, pq_ivfadc_topk

    emb = load_fixture(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select("vec_id", "embedding")
    books = pq_fit(emb, m=4, k=16)
    # the PQ index is the stored artifact (same role as the persisted
    # int8 index above) — materialize the encode pass once, carrying the
    # coarse-cell id so query time needs no membership join
    codes = pq_encode(emb, books, keep_cols=("label",)).persist()
    return pq_ivfadc_topk(
        emb, codes, queries, books, k=5, shortlist=50, n_probe=3
    )


@register(
    "knn_ivfadc_recall",
    oracle="""
    SELECT CAST(10 AS BIGINT) AS n_queries, TRUE AS recall_ok
    """,
    survey="X3",
    doc="Driver-checkable recall gate for IVFADC (same pattern as "
    "knn_ivf_recall / knn_pq_recall): Spark computes the exact L2 "
    "top-k AND the IVFADC top-k in one plan and emits aggregate "
    "recall >= 0.2 as a boolean the oracle asserts TRUE. Fixture "
    "labels are random clusters, so n_probe=3/10 bounds recall near "
    "the searched fraction (~0.3 expected; the exhaustive-ADC tier "
    "measures ~0.75) — 0.2 is the searched-fraction floor, matching "
    "knn_ivf_recall's. n_queries hash-checks that every query "
    "produced a result.",
)
def knn_ivfadc_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.pq import (
        brute_force_l2_topk,
        pq_encode,
        pq_fit,
        pq_ivfadc_topk,
    )

    emb = load_fixture(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select("vec_id", "embedding")
    exact = brute_force_l2_topk(emb, queries, k=5).select(
        "query_id", "neighbor_id"
    )
    books = pq_fit(emb, m=4, k=16)
    codes = pq_encode(emb, books, keep_cols=("label",)).persist()
    approx = pq_ivfadc_topk(
        emb, codes, queries, books, k=5, shortlist=50, n_probe=3
    ).select("query_id", F.col("neighbor_id").alias("ivfadc_neighbor_id"))
    hits = exact.join(
        approx,
        (exact.query_id == approx.query_id)
        & (exact.neighbor_id == approx.ivfadc_neighbor_id),
        "left_semi",
    )
    return (
        hits.agg(F.count(F.lit(1)).alias("n_hits"))
        .crossJoin(
            exact.agg(
                F.count(F.lit(1)).alias("n_exact"),
                F.countDistinct("query_id").alias("n_queries"),
            )
        )
        .select(
            "n_queries",
            (F.col("n_hits") >= 0.2 * F.col("n_exact")).alias("recall_ok"),
        )
    )


@register(
    "knn_pq_topk_auto",
    oracle=None,  # approximate by construction (k-means codebooks), like
    # both arms it dispatches between; the dispatch itself is
    # equality-tested against the arm pq_route selects
    # (tests/test_pq_dispatch.py), each arm has its own recall twin, and
    # the IVFADC arm carries a FULL value-hash driver row of its own
    # (knn_pq_auto_forced_ivfadc — pinned dials, forced route).
    driver=False,  # VERDICT r9 #5: bench/test arm, out of the sweep
    survey="X3",
    doc="|Q|-aware PQ search dispatch (pq_topk_auto): exhaustive "
    "ADC+rerank below the pq_route candidate-volume crossover, IVFADC "
    "above it. The cost model routes by the pairs IVF probing would "
    "AVOID — |Q|*n*(1-n_probe/C) — against the measured fixed overhead "
    "of the probing stages (10^7 pairs, calibrated from the sf10 "
    "crossover: |Q|=10 on 200K vectors ran faster exhaustive, |Q|=500 "
    "ran 3.5x faster through IVFADC). At driver fixture scale |Q|*n is "
    "tiny, so this entry exercises the exhaustive arm; the sf10 bench "
    "exercises the IVFADC arm.",
)
def knn_pq_topk_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.pq import pq_encode, pq_fit, pq_topk_auto

    emb = load_fixture(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select("vec_id", "embedding")
    books = pq_fit(emb, m=4, k=16)
    codes = pq_encode(emb, books, keep_cols=("label",)).persist()
    return pq_topk_auto(
        emb, codes, queries, books, k=5, shortlist=50, n_probe=3
    )


@register(
    "knn_pq_auto_forced_ivfadc",
    oracle="""
    WITH e AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    init AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS code, v
      FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 16)
    ),
    subs AS (SELECT UNNEST(range(4)) AS sub),
    books AS (
      SELECT subs.sub, init.code,
             list_slice(init.v, subs.sub * 16 + 1, subs.sub * 16 + 16) AS cw
      FROM init CROSS JOIN subs
    ),
    vsub AS (
      SELECT e.vec_id, subs.sub,
             list_slice(e.v, subs.sub * 16 + 1, subs.sub * 16 + 16) AS sv
      FROM e CROSS JOIN subs
    ),
    dists AS (
      SELECT vsub.vec_id, vsub.sub, books.code,
             list_sum(list_transform(list_zip(vsub.sv, books.cw),
                                     p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d2
      FROM vsub JOIN books ON vsub.sub = books.sub
    ),
    enc AS (
      SELECT vec_id, sub, code
      FROM (SELECT vec_id, sub, code,
                   ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                                      ORDER BY d2 ASC, code ASC) AS rn
            FROM dists)
      WHERE rn = 1
    ),
    repid AS (SELECT label, MIN(vec_id) AS rid FROM e GROUP BY label),
    reps AS (
      SELECT repid.label AS cluster, e.v AS cv
      FROM repid JOIN e ON e.vec_id = repid.rid
    ),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
    rt AS (
      SELECT q.query_id, reps.cluster,
             list_sum(list_transform(list_zip(q.qv, reps.cv),
                                     p -> p[1] * p[2]))
             / (sqrt(list_sum(list_transform(q.qv, x -> x * x)))
                * sqrt(list_sum(list_transform(reps.cv, x -> x * x))))
               AS c_cos
      FROM q CROSS JOIN reps
    ),
    probes AS (
      SELECT query_id, cluster
      FROM (SELECT query_id, cluster,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY c_cos DESC, cluster ASC)
                       AS crank
            FROM rt)
      WHERE crank <= 3
    ),
    lut AS (
      SELECT vec_id AS query_id, sub, code,
             CAST(FLOOR(d2 * 1000000) AS BIGINT) AS d2u
      FROM dists WHERE vec_id < 10
    ),
    encl AS (SELECT enc.vec_id, enc.sub, enc.code, e.label
             FROM enc JOIN e USING (vec_id)),
    adc AS (
      SELECT lut.query_id, encl.vec_id AS neighbor_id,
             CAST(SUM(lut.d2u) AS BIGINT) AS adc_u
      FROM encl
      JOIN probes ON probes.cluster = encl.label
      JOIN lut ON lut.query_id = probes.query_id
              AND encl.sub = lut.sub AND encl.code = lut.code
      WHERE lut.query_id != encl.vec_id
      GROUP BY lut.query_id, encl.vec_id
    ),
    short AS (
      SELECT query_id, neighbor_id
      FROM (SELECT query_id, neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY adc_u ASC, neighbor_id ASC)
                       AS srank
            FROM adc)
      WHERE srank <= 50
    ),
    rer AS (
      SELECT short.query_id, short.neighbor_id,
             list_sum(list_transform(list_zip(qe.v, ce.v),
                                     p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d2
      FROM short
      JOIN e qe ON qe.vec_id = short.query_id
      JOIN e ce ON ce.vec_id = short.neighbor_id
    )
    SELECT query_id, neighbor_id, rank,
           CAST(FLOOR(d2 * 1000000) AS BIGINT) AS d2_micro
    FROM (SELECT query_id, neighbor_id, d2,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY d2 ASC, neighbor_id ASC) AS rank
          FROM rer)
    WHERE rank <= 5
    """,
    survey="X3",
    doc="The dispatcher's IVFADC arm under a FULL value-hash oracle — "
    "closing the one rows-only cluster VERDICT r6 left: pq_topk_auto is "
    "called with caller-supplied index metadata (n_corpus=10^7, "
    "|Q|=500, C=10) whose saved-pairs volume exceeds the 10^7 crossover, "
    "so pq_route provably selects 'ivfadc' (asserted in "
    "tests/test_pq_dispatch.py) and the dispatch itself plans with zero "
    "sizing jobs — the stored-index serving path. Determinism comes "
    "from three pinned dials: init-only codebooks (pq_fit max_iter=0), "
    "probe_mode='pinned' routing against each cluster's lowest-vec_id "
    "member vector (index-ordered-fold cosines, ties cos DESC/cluster "
    "ASC), and int_units=True flooring LUT entries to integer "
    "micro-units before the ADC sum. The quality twins (trained "
    "codebooks, mean centroids, float ADC) remain knn_ivfadc_topk + "
    "knn_ivfadc_recall; this entry proves the dispatched IVFADC "
    "machinery end-to-end exactly.",
)
def knn_pq_auto_forced_ivfadc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.pq import pq_encode, pq_fit, pq_topk_auto

    emb = load_fixture(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select("vec_id", "embedding")
    books = pq_fit(emb, m=4, k=16, max_iter=0)
    codes = pq_encode(emb, books, keep_cols=("label",))
    return pq_topk_auto(
        emb, codes, queries, books, k=5, shortlist=50, n_probe=3,
        n_corpus=10_000_000, n_queries=500, n_clusters=10,
        probe_mode="pinned", int_units=True,
    )


@register(
    "knn_ivfadc_residual_topk",
    oracle="""
    WITH e AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    repid AS (SELECT label, MIN(vec_id) AS rid FROM e GROUP BY label),
    reps AS (
      SELECT repid.label AS cluster, e.v AS cv
      FROM repid JOIN e ON e.vec_id = repid.rid
    ),
    resid AS (
      SELECT e.vec_id, e.label,
             list_transform(list_zip(e.v, reps.cv), p -> p[1] - p[2]) AS rv
      FROM e JOIN reps ON reps.cluster = e.label
    ),
    init AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS code, rv
      FROM (SELECT vec_id, rv FROM resid ORDER BY vec_id LIMIT 16)
    ),
    subs AS (SELECT UNNEST(range(4)) AS sub),
    books AS (
      SELECT subs.sub, init.code,
             list_slice(init.rv, subs.sub * 16 + 1, subs.sub * 16 + 16) AS cw
      FROM init CROSS JOIN subs
    ),
    vsub AS (
      SELECT resid.vec_id, subs.sub,
             list_slice(resid.rv, subs.sub * 16 + 1, subs.sub * 16 + 16)
               AS sv
      FROM resid CROSS JOIN subs
    ),
    rdists AS (
      SELECT vsub.vec_id, vsub.sub, books.code,
             list_sum(list_transform(list_zip(vsub.sv, books.cw),
                                     p -> (p[1] - p[2]) * (p[1] - p[2])))
               AS d2
      FROM vsub JOIN books ON vsub.sub = books.sub
    ),
    enc AS (
      SELECT vec_id, sub, code
      FROM (SELECT vec_id, sub, code,
                   ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                                      ORDER BY d2 ASC, code ASC) AS rn
            FROM rdists)
      WHERE rn = 1
    ),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
    rt AS (
      SELECT q.query_id, reps.cluster,
             list_sum(list_transform(list_zip(q.qv, reps.cv),
                                     p -> p[1] * p[2]))
             / (sqrt(list_sum(list_transform(q.qv, x -> x * x)))
                * sqrt(list_sum(list_transform(reps.cv, x -> x * x))))
               AS c_cos
      FROM q CROSS JOIN reps
    ),
    probes AS (
      SELECT query_id, cluster
      FROM (SELECT query_id, cluster,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY c_cos DESC, cluster ASC)
                       AS crank
            FROM rt)
      WHERE crank <= 3
    ),
    qres AS (
      SELECT probes.query_id, probes.cluster,
             list_transform(list_zip(q.qv, reps.cv), p -> p[1] - p[2])
               AS qrv
      FROM probes
      JOIN q USING (query_id)
      JOIN reps ON reps.cluster = probes.cluster
    ),
    qsub AS (
      SELECT query_id, cluster, subs.sub,
             list_slice(qrv, subs.sub * 16 + 1, subs.sub * 16 + 16) AS sv
      FROM qres CROSS JOIN subs
    ),
    lut AS (
      SELECT qsub.query_id, qsub.cluster, qsub.sub, books.code,
             CAST(FLOOR(list_sum(list_transform(list_zip(qsub.sv, books.cw),
                        p -> (p[1] - p[2]) * (p[1] - p[2]))) * 1000000)
                  AS BIGINT) AS d2u
      FROM qsub JOIN books ON qsub.sub = books.sub
    ),
    encl AS (SELECT enc.vec_id, enc.sub, enc.code, e.label
             FROM enc JOIN e USING (vec_id)),
    adc AS (
      SELECT lut.query_id, encl.vec_id AS neighbor_id,
             CAST(SUM(lut.d2u) AS BIGINT) AS adc_u
      FROM encl
      JOIN lut ON lut.cluster = encl.label
              AND encl.sub = lut.sub AND encl.code = lut.code
      WHERE lut.query_id != encl.vec_id
      GROUP BY lut.query_id, encl.vec_id
    ),
    short AS (
      SELECT query_id, neighbor_id
      FROM (SELECT query_id, neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY adc_u ASC, neighbor_id ASC)
                       AS srank
            FROM adc)
      WHERE srank <= 50
    ),
    rer AS (
      SELECT short.query_id, short.neighbor_id,
             list_sum(list_transform(list_zip(qe.v, ce.v),
                                     p -> (p[1] - p[2]) * (p[1] - p[2])))
               AS d2
      FROM short
      JOIN e qe ON qe.vec_id = short.query_id
      JOIN e ce ON ce.vec_id = short.neighbor_id
    )
    SELECT query_id, neighbor_id, rank,
           CAST(FLOOR(d2 * 1000000) AS BIGINT) AS d2_micro
    FROM (SELECT query_id, neighbor_id, d2,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY d2 ASC, neighbor_id ASC) AS rank
          FROM rer)
    WHERE rank <= 5
    """,
    survey="X3",
    doc="IVFADC with RESIDUAL encoding — the composition as Jégou et "
    "al. 2011 §IV.A publish it (Faiss IndexIVFPQ): PQ quantizes "
    "r(x) = x − c(cell(x)), spending the code budget only on what the "
    "coarse quantizer failed to explain (reconstruction-error "
    "differential vs raw-vector PQ pinned in tests/test_pq_residual.py)."
    " Residual encoding costs one LUT per (query, probed cell) instead "
    "of per query — |Q|·n_probe·m·k broadcast rows, still KBs — and the "
    "heavy ADC stage keeps the identical fused broadcast-join + "
    "map-side partial aggregate over cluster-restricted code rows. "
    "FULL value-hash from round-7 birth via the established pinned "
    "dials (lowest-id cell references + routing, init-only residual "
    "codebooks, integer-micro ADC); the quality path (kmeans cells, "
    "mean references, trained books, float ADC) is recall-tested "
    "against the raw-vector variant.",
)
def knn_ivfadc_residual_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.pq import pq_ivfadc_residual_topk

    emb = load_fixture(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select("vec_id", "embedding")
    return pq_ivfadc_residual_topk(
        emb, queries, m=4, k_codes=16, k=5, shortlist=50, n_probe=3,
        cluster_col="label", coarse_mode="pinned", books_max_iter=0,
        int_units=True,
    )


@register(
    "knn_quantized_ivf",
    oracle=None,  # probe routing depends on float centroid means (engine
    # summation order); the int8 kernel is value-hash-proven by
    # knn_quantized_topk (full oracle) and the recall floor vs the exact
    # quantized baseline is asserted in tests/test_similarity.py.
    driver=False,  # VERDICT r9 #5: bench/test arm, out of the sweep
    survey="X3",
    doc="Int8 top-k INSIDE IVF-probed clusters (n_probe=3 of 10): the "
    "quantized index is scanned only where the centroid routing points, "
    "so the memory-bound-scan claim holds at corpus scale — integer dot "
    "products, 1/4 the bytes, ~n_clusters/n_probe less of them.",
)
def knn_quantized_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_fixture(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20).select("vec_id", "embedding")
    # The quantized index is referenced twice downstream (qc + cc sides);
    # without persist, Catalyst instantiates the quantize subtree per
    # reference — the index would be built twice per search. persist()
    # materializes it once; this is the IVF *index-build* step, which at
    # corpus scale is a separate job whose output is stored (here: cached —
    # same role). Index size is rows × (d + 8) bytes, 1/4 the float
    # corpus — cache-resident by design; it stays cached for the session
    # (repeat searches reuse it; batch harnesses clearCache between
    # timings). Probe routing has exactly one consumer, so it is NOT
    # persisted — caching it would pay materialization for zero reuse.
    codes = quantize_codes(spark, sf_dir).select("vec_id", "codes").persist()
    probes = S.ivf_probe_routing(emb, queries, n_probe=3)
    member = emb.select("vec_id", F.col("label").alias("cluster"))
    candidates = (
        probes.join(member, "cluster")
        .select("query_id", F.col("vec_id").alias("cand_id"))
        .filter(F.col("query_id") != F.col("cand_id"))
    )
    qc = codes.select(F.col("vec_id").alias("query_id"), F.col("codes").alias("qcodes"))
    cc = codes.select(F.col("vec_id").alias("cand_id"), F.col("codes").alias("ccodes"))
    pairs = (
        candidates.join(qc, "query_id")
        .join(cc, "cand_id")
        .select("query_id", F.col("cand_id").alias("neighbor_id"), "qcodes", "ccodes")
    )
    return S.int8_topk(pairs, k=5)


_COS = (
    "list_sum(list_transform(list_zip({a}, {b}), p -> p[1] * p[2]))"
    " / (sqrt(list_sum(list_transform({a}, x -> x * x)))"
    "    * sqrt(list_sum(list_transform({b}, x -> x * x))))"
)


def _ivfadc_incremental_oracle(live_pred: str = "TRUE") -> str:
    """The incremental-IVFADC oracle chain, shared by the append entry
    (``live_pred="TRUE"``) and the tombstone entry (``live_pred``
    filters the stored code rows — deletion only shrinks the inverted
    lists; books, representatives, and routing are untouched)."""
    return f"""
    WITH e AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    b AS (SELECT * FROM e WHERE vec_id % 5 <> 4),
    dl AS (SELECT * FROM e WHERE vec_id % 5 = 4),
    init AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS code, v
      FROM (SELECT vec_id, v FROM b ORDER BY vec_id LIMIT 16)
    ),
    subs AS (SELECT UNNEST(range(4)) AS sub),
    books AS (
      SELECT subs.sub, init.code,
             list_slice(init.v, subs.sub * 16 + 1, subs.sub * 16 + 16) AS cw
      FROM init CROSS JOIN subs
    ),
    vsub AS (
      SELECT e.vec_id, subs.sub,
             list_slice(e.v, subs.sub * 16 + 1, subs.sub * 16 + 16) AS sv
      FROM e CROSS JOIN subs
    ),
    dists AS (
      SELECT vsub.vec_id, vsub.sub, books.code,
             list_sum(list_transform(list_zip(vsub.sv, books.cw),
                                     p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d2
      FROM vsub JOIN books ON vsub.sub = books.sub
    ),
    enc AS (
      SELECT vec_id, sub, code
      FROM (SELECT vec_id, sub, code,
                   ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                                      ORDER BY d2 ASC, code ASC) AS rn
            FROM dists)
      WHERE rn = 1
    ),
    repid AS (SELECT label, MIN(vec_id) AS rid FROM b GROUP BY label),
    reps AS (
      SELECT repid.label AS cluster, e2.v AS cv
      FROM repid JOIN e e2 ON e2.vec_id = repid.rid
    ),
    dassign AS (
      SELECT vec_id, cluster FROM (
        SELECT dl.vec_id, reps.cluster,
               ROW_NUMBER() OVER (
                 PARTITION BY dl.vec_id
                 ORDER BY {_COS.format(a="dl.v", b="reps.cv")} DESC,
                          reps.cluster ASC) AS rn
        FROM dl CROSS JOIN reps)
      WHERE rn = 1
    ),
    cells AS (
      SELECT vec_id, label FROM b
      UNION ALL SELECT vec_id, cluster AS label FROM dassign
    ),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
    rt AS (
      SELECT q.query_id, reps.cluster,
             {_COS.format(a="q.qv", b="reps.cv")} AS c_cos
      FROM q CROSS JOIN reps
    ),
    probes AS (
      SELECT query_id, cluster
      FROM (SELECT query_id, cluster,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY c_cos DESC, cluster ASC)
                       AS crank
            FROM rt)
      WHERE crank <= 3
    ),
    lut AS (
      SELECT vec_id AS query_id, sub, code,
             CAST(FLOOR(d2 * 1000000) AS BIGINT) AS d2u
      FROM dists WHERE vec_id < 10
    ),
    encl AS (SELECT enc.vec_id, enc.sub, enc.code, cells.label
             FROM enc JOIN cells USING (vec_id) WHERE {live_pred}),
    adc AS (
      SELECT lut.query_id, encl.vec_id AS neighbor_id,
             CAST(SUM(lut.d2u) AS BIGINT) AS adc_u
      FROM encl
      JOIN probes ON probes.cluster = encl.label
      JOIN lut ON lut.query_id = probes.query_id
              AND encl.sub = lut.sub AND encl.code = lut.code
      WHERE lut.query_id != encl.vec_id
      GROUP BY lut.query_id, encl.vec_id
    ),
    short AS (
      SELECT query_id, neighbor_id
      FROM (SELECT query_id, neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY adc_u ASC, neighbor_id ASC)
                       AS srank
            FROM adc)
      WHERE srank <= 50
    ),
    rer AS (
      SELECT short.query_id, short.neighbor_id,
             list_sum(list_transform(list_zip(qe.v, ce.v),
                                     p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d2
      FROM short
      JOIN e qe ON qe.vec_id = short.query_id
      JOIN e ce ON ce.vec_id = short.neighbor_id
    )
    SELECT query_id, neighbor_id, rank,
           CAST(FLOOR(d2 * 1000000) AS BIGINT) AS d2_micro
    FROM (SELECT query_id, neighbor_id, d2,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY d2 ASC, neighbor_id ASC) AS rank
          FROM rer)
    WHERE rank <= 5
    """


@register(
    "knn_ivfadc_incremental_topk",
    oracle=_ivfadc_incremental_oracle(),
    survey="X3,X38",
    doc="INCREMENTAL IVFADC index maintenance under a FULL value-hash "
    "oracle — the Faiss IndexIVFPQ.add production shape: the base build "
    "(80% of the corpus, vec_id % 5 <> 4) freezes init-only codebooks "
    "AND the pinned coarse quantizer; the appended 20% is assigned to "
    "EXISTING cells by 1-probe routing against the frozen "
    "representatives (assignment IS routing — same operator, so "
    "appends land where queries probe), encoded with the frozen books "
    "(pq_encode_append), and served as the union with routing still "
    "against the BASE representatives (route_corpus dial) — appends "
    "never refit, never move cells, never touch stored base codes. "
    "Per appended batch: one C-row broadcast probe + one narrow "
    "codebook-literal encode, zero base-corpus scans. Equality to the "
    "one-shot frozen-artifact build over the same union is pinned in "
    "tests (batch) and through the epoch-replay streaming maintenance "
    "twin (streaming/pq_index_stream.py).",
)
def knn_ivfadc_incremental_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.pq import (
        pq_encode,
        pq_encode_append,
        pq_fit,
        pq_ivfadc_topk,
    )

    emb = load_fixture(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") % 5 != 4)
    delta = emb.filter(F.col("vec_id") % 5 == 4)
    queries = emb.filter(F.col("vec_id") < 10).select("vec_id", "embedding")
    books = pq_fit(base, m=4, k=16, max_iter=0)
    codes = pq_encode(base, books, keep_cols=("label",)).unionByName(
        pq_encode_append(delta, base, books)
    )
    return pq_ivfadc_topk(
        emb, codes, queries, books, k=5, shortlist=50, n_probe=3,
        probe_mode="pinned", int_units=True, route_corpus=base,
    )


@register(
    "knn_ivfadc_deleted_topk",
    oracle=_ivfadc_incremental_oracle(live_pred="vec_id % 7 <> 3"),
    survey="X3,X38",
    doc="DELETE half of index maintenance under a FULL value-hash "
    "oracle — the Faiss remove_ids shape completing "
    "knn_ivfadc_incremental_topk's append half: the same frozen "
    "base-80% build plus appended 20%, then every vec_id % 7 == 3 "
    "(~14%, cutting across base AND appended epochs) is tombstoned, and "
    "serving anti-joins the stored codes against the tombstone ids "
    "before routing/ADC (operators/pq.py::index_apply_tombstones). "
    "Deletion shrinks the inverted lists and NOTHING else: codebooks, "
    "coarse representatives, and routing are the frozen build's — a "
    "tombstoned representative keeps anchoring its cell (it is an "
    "index artifact, not a served row), exactly Faiss semantics. "
    "Because each code row depends only on its own vector + frozen "
    "artifacts, (codes ∪ appends) ∖ tombstones is bit-for-bit the "
    "one-shot frozen encode of the survivors (tests pin it, plus the "
    "epoch-keyed tombstone stream with cross-epoch deletes and forced "
    "replay — streaming/pq_index_stream.py::run_pq_delete_stream). "
    "The anti-join is one id-keyed equi-join; tombstones are ids only, "
    "broadcastable while small, idempotent under duplicate deletes.",
)
def knn_ivfadc_deleted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.pq import (
        index_apply_tombstones,
        pq_encode,
        pq_encode_append,
        pq_fit,
        pq_ivfadc_topk,
    )

    emb = load_fixture(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") % 5 != 4)
    delta = emb.filter(F.col("vec_id") % 5 == 4)
    queries = emb.filter(F.col("vec_id") < 10).select("vec_id", "embedding")
    books = pq_fit(base, m=4, k=16, max_iter=0)
    codes = pq_encode(base, books, keep_cols=("label",)).unionByName(
        pq_encode_append(delta, base, books)
    )
    tombs = emb.filter(F.col("vec_id") % 7 == 3).select("vec_id")
    return pq_ivfadc_topk(
        emb, index_apply_tombstones(codes, tombs), queries, books,
        k=5, shortlist=50, n_probe=3,
        probe_mode="pinned", int_units=True, route_corpus=base,
    )


@register(
    "knn_incremental_multiprobe_recall",
    oracle="""
    SELECT CAST(10 AS BIGINT) AS n_queries,
           TRUE AS probes_nested,
           TRUE AS multiprobe_ok
    """,
    survey="X3,X38",
    doc="Multi-probe serving on the APPEND-MAINTAINED index (the "
    "n_probe recall dial VERDICT r9 #7 asked for, same tolerance-gate "
    "pattern as knn_ivf_recall): over the base∪appended code store with "
    "frozen books and base-representative routing, Spark serves "
    "recall@10 at n_probe=1 and n_probe=4 against exact L2 in one plan "
    "and the oracle asserts (a) probes_nested — each query's probed "
    "cells at n_probe=1 are a subset of its n_probe=4 cells (the "
    "structural guarantee: widening the probe only ADDS candidate "
    "cells), and (b) multiprobe_ok — recall@10 at n_probe=4 >= at "
    "n_probe=1 (deterministic on the fixture: pinned routing + integer "
    "ADC make both arms bit-stable, so this re-greens identically "
    "every sweep; the measured recall curve for n_probe in {1,2,4,8} "
    "on the sf10 anisotropic tile lives in SCALE.md §Round-10). "
    "n_queries hash-checks that every query produced a full exact "
    "reference.",
)
def knn_incremental_multiprobe_recall(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.pq import (
        brute_force_l2_topk,
        pq_encode,
        pq_encode_append,
        pq_fit,
        pq_ivfadc_topk,
    )
    from ..operators.similarity import ivf_probe_routing

    emb = load_fixture(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") % 5 != 4)
    delta = emb.filter(F.col("vec_id") % 5 == 4)
    queries = emb.filter(F.col("vec_id") < 10).select("vec_id", "embedding")
    books = pq_fit(base, m=4, k=16, max_iter=0)
    codes = pq_encode(base, books, keep_cols=("label",)).unionByName(
        pq_encode_append(delta, base, books)
    )
    exact = brute_force_l2_topk(emb, queries, k=10).select(
        "query_id", "neighbor_id"
    )

    def hits(n_probe: int, alias: str) -> DataFrame:
        served = pq_ivfadc_topk(
            emb, codes, queries, books, k=10, shortlist=50, n_probe=n_probe,
            probe_mode="pinned", int_units=True, route_corpus=base,
        ).select("query_id", "neighbor_id")
        return exact.join(
            served, ["query_id", "neighbor_id"], "left_semi"
        ).agg(F.count(F.lit(1)).alias(alias))

    p1 = ivf_probe_routing(base, queries, n_probe=1, mode="pinned")
    p4 = ivf_probe_routing(base, queries, n_probe=4, mode="pinned")
    escaped = p1.join(p4, ["query_id", "cluster"], "left_anti").agg(
        F.count(F.lit(1)).alias("n_escaped")
    )
    # 1-row x 1-row scalar attaches (allowlisted by the cartesian guard)
    return (
        exact.agg(F.countDistinct("query_id").alias("n_queries"))
        .crossJoin(hits(1, "h1"))
        .crossJoin(hits(4, "h4"))
        .crossJoin(escaped)
        .select(
            "n_queries",
            (F.col("n_escaped") == 0).alias("probes_nested"),
            (F.col("h4") >= F.col("h1")).alias("multiprobe_ok"),
        )
    )
