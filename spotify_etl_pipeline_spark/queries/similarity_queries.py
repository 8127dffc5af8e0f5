"""Similarity-search queries over ``embeddings`` (SURVEY.md X3).

Brute-force top-k is exact and oracle-checked; the IVF variant is
approximate by construction (rows-only check here, recall floor asserted in
tests/test_similarity.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import similarity as S
from ..schemas import load_fixture
from .catalog import register

K = 5
N_QUERIES = 10  # vec_id < 10 are the query vectors


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_fixture(spark, sf_dir, "embeddings")


@register(
    "knn_brute_force",
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
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_sum(list_transform(list_zip(q.v, c.v), p -> p[1] * p[2]))
               / (q.nrm * c.nrm) AS cos
      FROM n q JOIN n c ON q.vec_id != c.vec_id
      WHERE q.vec_id < {N_QUERIES}
        AND q.nrm IS NOT NULL AND c.nrm IS NOT NULL
    ),
    ranked AS (
      SELECT query_id, neighbor_id, cos,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, neighbor_id ASC) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, rank, ROUND(cos, 4) AS cosine
    FROM ranked WHERE rank <= {K}
    """,
    survey="X3",
    doc="Exact top-5 cosine neighbors for 10 query vectors — the ANN "
    "baseline/verifier.",
)
def knn_brute_force(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select("vec_id", "embedding")
    return S.brute_force_topk(emb, queries, k=K)


@register(
    "knn_ivf",
    oracle=None,  # approximate (n_probe < n_clusters); hash-checked twin:
    # knn_ivf_recall (driver evidence), recall floor also asserted in
    # tests/test_similarity.py.
    driver=False,  # VERDICT r9 #5: bench/test arm, out of the sweep
    survey="X3",
    doc="IVF ANN: centroid routing (n_probe=3 of 10 clusters) then exact "
    "scoring within probed clusters — the 100 TB scale path (cuts pairwise "
    "work ~3.3×; at real scale the centroid step is a k-means job of the "
    "same DataFrame shape).",
)
def knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select("vec_id", "embedding")
    return S.ivf_topk(emb, queries, k=K, n_probe=3)


@register(
    "knn_ivf_recall",
    oracle=f"""
    SELECT CAST({N_QUERIES} AS BIGINT) AS n_queries, TRUE AS recall_ok
    """,
    survey="X3",
    doc="Driver-checkable recall gate for IVF ANN (upgrade of the rows-only "
    "knn_ivf): Spark computes brute-force AND IVF top-k in one plan and "
    "emits aggregate recall >= 0.2 as a boolean the oracle asserts TRUE "
    "(fixture labels are random clusters, so n_probe=3/10 reaches ~30% of "
    "the corpus — 0.2 is the searched-fraction floor, mirroring "
    "tests/test_similarity.py). n_queries hash-checks that every query "
    "produced a full result.",
)
def knn_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select("vec_id", "embedding")
    exact = S.brute_force_topk(emb, queries, k=K).select("query_id", "neighbor_id")
    approx = S.ivf_topk(emb, queries, k=K, n_probe=3).select(
        "query_id", F.col("neighbor_id").alias("ivf_neighbor_id")
    )
    hits = exact.join(
        approx,
        (exact.query_id == approx.query_id)
        & (exact.neighbor_id == approx.ivf_neighbor_id),
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


def quantize_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Internal int8 quantization producing ``codes`` as array<long> — the
    form downstream integer-dot-product queries consume. The registered
    catalog entry serializes the array (driver canonicalizer can't hash
    list cells)."""
    from pyspark.sql import functions as F

    e = load_fixture(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    mx = F.array_max(F.transform("v", lambda x: F.abs(x)))
    # zero vector => null scale => null codes, matching the oracle's NULLIF
    # instead of an ANSI DIVIDE_BY_ZERO abort
    s = e.withColumn("max_abs", F.when(mx > 0, mx))
    return s.select(
        "vec_id",
        F.transform(
            "v",
            lambda x: F.floor(F.lit(127) * x / F.col("max_abs") + F.lit(0.5)).cast(
                "long"
            ),
        ).alias("codes"),
        F.floor(F.col("max_abs") * 1_000_000).alias("scale_micro"),
    )


@register(
    "embedding_quantize_int8",
    oracle="""
    WITH e AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    s AS (
      SELECT vec_id, v,
             NULLIF(list_max(list_transform(v, x -> ABS(x))), 0) AS max_abs
      FROM e
    )
    SELECT vec_id,
           array_to_string(
             list_transform(v, x -> CAST(FLOOR(127 * x / max_abs + 0.5) AS BIGINT)),
             ',') AS codes,
           CAST(FLOOR(max_abs * 1000000) AS BIGINT) AS scale_micro
    FROM s
    """,
    survey="X3",
    doc="Int8 symmetric quantization for the vector index: per-vector "
    "max-abs scale, codes = floor(127*x/scale + 0.5). floor(x+0.5) "
    "instead of round(): IEEE multiply/divide are correctly rounded so "
    "both engines hold bit-identical doubles, and floor of the same "
    "double is the same integer — whereas round() half-rule differences "
    "(the 4dp lesson from the quality score) would flip codes. 4x memory "
    "reduction for the ANN index; narrow per-row transform, no shuffle. "
    "Codes emit as a comma-joined string (catalog convention: no "
    "array-typed output columns — the driver canonicalizer can't hash "
    "list cells); long→string is exact in both engines.",
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    return quantize_codes(spark, sf_dir).select(
        "vec_id",
        F.array_join(
            F.transform("codes", lambda x: x.cast("string")), ","
        ).alias("codes"),
        "scale_micro",
    )


_Q_CODES_CTE = """
    e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    s AS (
      SELECT vec_id, v,
             NULLIF(list_max(list_transform(v, x -> ABS(x))), 0) AS max_abs
      FROM e
    ),
    q AS (
      SELECT vec_id,
             list_transform(v, x -> CAST(FLOOR(127 * x / max_abs + 0.5) AS BIGINT))
                 AS codes
      FROM s
    )
"""


@register(
    "knn_quantized_topk",
    oracle=f"""
    WITH {_Q_CODES_CTE},
    queries AS (SELECT * FROM q WHERE vec_id < 20),
    scored AS (
      -- CAST: DuckDB list_sum over BIGINT returns HUGEINT, which pandas
      -- surfaces as float64; Spark emits int64 — the driver hasher
      -- compares dtypes, so pin BIGINT explicitly.
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             CAST(list_sum(list_transform(list_zip(a.codes, b.codes),
                                          p -> p[1] * p[2])) AS BIGINT) AS dot
      FROM queries a JOIN q b ON a.vec_id <> b.vec_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, dot,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY dot DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, rank, dot FROM ranked WHERE rank <= 5
    """,
    survey="X3",
    doc="Top-k search over the int8-quantized index: INTEGER dot products "
    "(zip_with + aggregate on codes) rank neighbors with zero floating "
    "point anywhere — the ranking is bit-exact across engines by "
    "construction, unlike cosine top-k where near-ties depend on float "
    "summation order. The memory-bound scan reads 1/4 the bytes of the "
    "float index.",
)
def knn_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ..operators.similarity import int8_topk

    codes = quantize_codes(spark, sf_dir).select("vec_id", "codes")
    q = codes.filter(F.col("vec_id") < 20).alias("q")
    c = codes.alias("c")
    pairs = q.join(c, F.col("q.vec_id") != F.col("c.vec_id")).select(
        F.col("q.vec_id").alias("query_id"),
        F.col("c.vec_id").alias("neighbor_id"),
        F.col("q.codes").alias("qcodes"),
        F.col("c.codes").alias("ccodes"),
    )
    return int8_topk(pairs, k=5)


@register(
    "knn_l2_brute_force",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_sum(list_transform(list_zip(q.v, c.v),
                                     p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d2
      FROM e q JOIN e c ON q.vec_id != c.vec_id
      WHERE q.vec_id < {N_QUERIES}
    ),
    ranked AS (
      SELECT query_id, neighbor_id, d2,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY d2 ASC, neighbor_id ASC) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, rank,
           CAST(FLOOR(d2 * 1000000) AS BIGINT) AS d2_micro
    FROM ranked WHERE rank <= {K}
    """,
    survey="X3",
    doc="Exact squared-L2 top-k — the metric PQ/ADC approximates, so this "
    "is the recall baseline for the product-quantization tier (cosine "
    "brute force stays the baseline for the IVF/LSH tiers). d2 emitted as "
    "FLOOR-micro integer: IEEE +/-/* are correctly rounded and both "
    "engines fold in index order, so the doubles are bit-identical and "
    "the floor is engine-independent.",
)
def knn_l2_brute_force(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.pq import brute_force_l2_topk

    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select("vec_id", "embedding")
    return brute_force_l2_topk(emb, queries, k=K)


PQ_M = 4
PQ_K = 16
PQ_SHORTLIST = 50


@register(
    "knn_pq_topk",
    oracle=None,  # codebooks are k-means fits (float means, engine-order
    # dependent); hash-checked twins: knn_pq_recall (driver evidence) and
    # knn_pq_pinned_topk (the identical machinery under pinned dials,
    # FULL value hash); recall floors vs knn_l2_brute_force asserted in
    # tests/test_similarity.py.
    driver=False,  # VERDICT r9 #5: bench/test arm, out of the sweep
    survey="X3",
    doc="Product-quantization ANN with exact rerank (Jégou et al. 2011; "
    "the Faiss IndexRefine pattern): m=4 subspace codebooks of k=16 "
    "codewords (distributed Lloyd's fit), vectors encoded to 4 small "
    "ints (16x smaller than float32 — the compression regime of a "
    "RAM-resident index at 10^9 vectors), ADC shortlist of 50 via "
    "broadcast per-query lookup tables joined to exploded code rows, "
    "then exact L2 ONLY on the |Q|*50 shortlisted pairs. No UDFs; the "
    "float corpus is read for shortlist/n of its rows, never scanned "
    "all-pairs.",
)
def knn_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.pq import pq_adc_rerank_topk, pq_encode, pq_fit

    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select("vec_id", "embedding")
    books = pq_fit(emb, m=PQ_M, k=PQ_K)
    # the PQ index is the stored artifact at corpus scale (same role as
    # the persisted int8 index in knn_quantized_ivf) — materialize the
    # encode pass once rather than re-deriving it inside the ADC subtree
    codes = pq_encode(emb, books).persist()
    return pq_adc_rerank_topk(
        emb, codes, queries, books, k=K, shortlist=PQ_SHORTLIST
    )


@register(
    "knn_pq_pinned_topk",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    init AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS code, v
      FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT {PQ_K})
    ),
    subs AS (SELECT UNNEST(range({PQ_M})) AS sub),
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
    lut AS (
      SELECT vec_id AS query_id, sub, code,
             CAST(FLOOR(d2 * 1000000) AS BIGINT) AS d2u
      FROM dists WHERE vec_id < {N_QUERIES}
    ),
    adc AS (
      SELECT lut.query_id, enc.vec_id AS neighbor_id,
             CAST(SUM(lut.d2u) AS BIGINT) AS adc_u
      FROM enc JOIN lut ON enc.sub = lut.sub AND enc.code = lut.code
      WHERE lut.query_id != enc.vec_id
      GROUP BY lut.query_id, enc.vec_id
    ),
    short AS (
      SELECT query_id, neighbor_id
      FROM (SELECT query_id, neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY adc_u ASC, neighbor_id ASC)
                       AS srank
            FROM adc)
      WHERE srank <= {PQ_SHORTLIST}
    ),
    rer AS (
      SELECT short.query_id, short.neighbor_id,
             list_sum(list_transform(list_zip(q.v, c.v),
                                     p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d2
      FROM short
      JOIN e q ON q.vec_id = short.query_id
      JOIN e c ON c.vec_id = short.neighbor_id
    )
    SELECT query_id, neighbor_id, rank,
           CAST(FLOOR(d2 * 1000000) AS BIGINT) AS d2_micro
    FROM (SELECT query_id, neighbor_id, d2,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY d2 ASC, neighbor_id ASC) AS rank
          FROM rer)
    WHERE rank <= {K}
    """,
    survey="X3",
    doc="PQ ADC + exact rerank with the ENTIRE pipeline value-hash-"
    "checked — the embedding_lsh_neardup trick applied to product "
    "quantization. Codebooks are pinned to the deterministic k-means "
    "init (each subspace's 16 lowest-vec_id subvectors, pq_fit "
    "max_iter=0), so both engines rederive identical codebooks from "
    "the data; encode/LUT distances are single index-ordered folds "
    "(bit-identical doubles), argmin ties break toward the lower code "
    "id on both sides, and each LUT entry is floored to integer "
    "micro-units BEFORE the m-term ADC sum so the sum is exact integer "
    "arithmetic with no float addition-order dependence. The trained-"
    "codebook twin knn_pq_topk stays the quality path (rows-only + "
    "recall gate); this entry proves the ADC/shortlist/rerank machinery "
    "itself is exactly right.",
)
def knn_pq_pinned_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.pq import _exact_rerank, pq_encode, pq_fit, pq_query_lut
    from pyspark.sql.window import Window

    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select("vec_id", "embedding")
    books = pq_fit(emb, m=PQ_M, k=PQ_K, max_iter=0)  # init-only: exact
    codes = pq_encode(emb, books)
    lut = pq_query_lut(queries, books).select(
        "query_id",
        "sub",
        "code",
        F.floor(F.col("d2") * 1_000_000).alias("d2u"),
    )
    exploded = codes.select(
        F.col("vec_id").alias("neighbor_id"),
        F.posexplode("pq_codes").alias("sub", "code"),
    )
    scored = (
        exploded.join(F.broadcast(lut), ["sub", "code"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("d2u").alias("adc_u"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adc_u"), F.asc("neighbor_id")
    )
    short = (
        scored.withColumn("srank", F.row_number().over(w))
        .filter(F.col("srank") <= PQ_SHORTLIST)
        .select("query_id", "neighbor_id")
    )
    return _exact_rerank(short, emb, queries, k=K)


@register(
    "knn_filtered_topk",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    n AS (
      SELECT vec_id, label, v,
             NULLIF(sqrt(list_sum(list_transform(v, x -> x * x))), 0) AS nrm
      FROM e
    ),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_sum(list_transform(list_zip(q.v, c.v), p -> p[1] * p[2]))
               / (q.nrm * c.nrm) AS cos
      FROM n q JOIN n c ON q.vec_id != c.vec_id AND q.label = c.label
      WHERE q.vec_id < {N_QUERIES}
        AND q.nrm IS NOT NULL AND c.nrm IS NOT NULL
    ),
    ranked AS (
      SELECT query_id, neighbor_id, cos,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, neighbor_id ASC) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, rank, ROUND(cos, 4) AS cosine
    FROM ranked WHERE rank <= {K}
    """,
    survey="X3",
    doc="Filtered (hybrid) vector search: top-5 cosine neighbors sharing "
    "the query's label. The metadata equality is part of the join "
    "condition — candidates are pruned BEFORE scoring and the label "
    "doubles as the shuffle/blocking key, avoiding the post-filter "
    "pitfall where a selective predicate under-fills an ANN shortlist.",
)
def knn_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        "vec_id", "label", "embedding"
    )
    return S.filtered_topk(emb, queries, k=K, match_cols=("label",))


@register(
    "knn_pq_recall",
    oracle=f"""
    SELECT CAST({N_QUERIES} AS BIGINT) AS n_queries, TRUE AS recall_ok
    """,
    survey="X3",
    doc="Driver-checkable recall gate for PQ ANN (upgrade of the rows-only "
    "knn_pq_topk, same pattern as knn_ivf_recall): Spark computes the "
    "exact L2 top-k AND the ADC+rerank top-k in one plan and emits "
    "aggregate recall >= 0.5 as a boolean the oracle asserts TRUE "
    "(floor mirrors tests/test_similarity.py, measured ~0.75). "
    "n_queries hash-checks that every query produced a full result.",
)
def knn_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.pq import (
        brute_force_l2_topk,
        pq_adc_rerank_topk,
        pq_encode,
        pq_fit,
    )

    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select("vec_id", "embedding")
    exact = brute_force_l2_topk(emb, queries, k=K).select("query_id", "neighbor_id")
    books = pq_fit(emb, m=PQ_M, k=PQ_K)
    codes = pq_encode(emb, books).persist()
    approx = pq_adc_rerank_topk(
        emb, codes, queries, books, k=K, shortlist=PQ_SHORTLIST
    ).select("query_id", F.col("neighbor_id").alias("pq_neighbor_id"))
    hits = exact.join(
        approx,
        (exact.query_id == approx.query_id)
        & (exact.neighbor_id == approx.pq_neighbor_id),
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
            (F.col("n_hits") >= 0.5 * F.col("n_exact")).alias("recall_ok"),
        )
    )


@register(
    "knn_brute_force_arrow",
    oracle=None,  # exact ranking, but float64 matmul sums in a different
    # order than the JVM fold — 4dp-rounded cosines can land on opposite
    # sides of a half-ulp, so the value hash is not cross-engine stable;
    # hash-checked twin: knn_brute_force_arrow_agree (driver evidence).
    driver=False,  # VERDICT r9 #5: bench/test arm, out of the sweep
    survey="X3",
    doc="Arrow-batched exact top-5 cosine: numpy matmul inside mapInPandas "
    "emitting per-batch top-(k+1) survivors, one thin global rank window — "
    "the throughput twin of knn_brute_force (HOF dot products are "
    "interpreted per element; the matmul kernel is the 100 TB rerank path).",
)
def knn_brute_force_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.arrow_knn import brute_force_topk_arrow

    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select("vec_id", "embedding")
    return brute_force_topk_arrow(emb, queries, k=K)


@register(
    "knn_brute_force_arrow_agree",
    oracle=f"""
    SELECT CAST({N_QUERIES} AS BIGINT) AS n_queries, TRUE AS agree_ok
    """,
    survey="X3",
    doc="Driver-checkable agreement gate for the Arrow kernel (same pattern "
    "as knn_ivf_recall): Spark computes the HOF and matmul top-k in one "
    "plan and asserts neighbor-set agreement >= 0.9 — both are exact, so "
    "disagreement is bounded by rank flips between cosines within ~1 ulp; "
    "n_queries hash-checks that every query produced a full result.",
)
def knn_brute_force_arrow_agree(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.arrow_knn import brute_force_topk_arrow

    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select("vec_id", "embedding")
    exact = S.brute_force_topk(emb, queries, k=K).select("query_id", "neighbor_id")
    arrow = brute_force_topk_arrow(emb, queries, k=K).select(
        "query_id", F.col("neighbor_id").alias("arrow_neighbor_id")
    )
    hits = exact.join(
        arrow,
        (exact.query_id == arrow.query_id)
        & (exact.neighbor_id == arrow.arrow_neighbor_id),
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
            (F.col("n_hits") >= 0.9 * F.col("n_exact")).alias("agree_ok"),
        )
    )
