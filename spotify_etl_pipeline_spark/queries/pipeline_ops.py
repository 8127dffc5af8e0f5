"""Training-data pipeline utilities (driver-mandate extension tier):
deterministic dataset splitting, histogram binning, and per-group anomaly
scoring. All pure built-ins, all oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.text import chunk_windows, fingerprint_expr, prefix_duplicate_clusters
from ..schemas import load_fixture
from .catalog import register
from .oracle_sql_helpers import fingerprint_sql, list_rolling_hash_sql


@register(
    "dataset_split",
    oracle=f"""
    WITH fp AS (
      SELECT doc_id, lang, {fingerprint_sql()} AS h
      FROM documents
    )
    SELECT CASE WHEN h % 100 < 80 THEN 'train'
                WHEN h % 100 < 90 THEN 'valid'
                ELSE 'test' END AS split,
           lang,
           COUNT(*) AS n_docs
    FROM fp
    GROUP BY 1, 2
    """,
    survey="X4,X1",
    doc="Deterministic train/valid/test split (80/10/10) keyed on the "
    "CONTENT fingerprint, not the doc id — re-ingested or re-ordered "
    "corpora land every document in the same split, and near-identical "
    "snapshots cannot leak a doc across splits. The rolling-hash formula "
    "is shared with the oracle (operators/text.py fingerprint).",
)
def dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_fixture(spark, sf_dir, "documents")
    bucket = fingerprint_expr() % 100
    split = (
        F.when(bucket < 80, F.lit("train"))
        .when(bucket < 90, F.lit("valid"))
        .otherwise(F.lit("test"))
    )
    return (
        docs.select(split.alias("split"), "lang")
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@register(
    "histogram_totalprice",
    oracle="""
    SELECT CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS bucket,
           COUNT(*) AS n,
           ROUND(MIN(o_totalprice), 2) AS lo,
           ROUND(MAX(o_totalprice), 2) AS hi
    FROM orders
    GROUP BY 1
    """,
    survey="X6,A4",
    doc="Fixed-width histogram via FLOOR-bucketing — the single-pass "
    "distributed histogram shape (one hash aggregate, no sort).",
)
def histogram_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_fixture(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.floor(F.col("o_totalprice") / 50000).alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )


@register(
    "events_zscore_anomalies",
    oracle="""
    WITH stats AS (
      SELECT event_type,
             AVG(value) AS mu,
             STDDEV_SAMP(value) AS sigma
      FROM events
      GROUP BY event_type
    )
    SELECT e.event_id, e.event_type,
           ROUND(e.value, 4) AS value,
           ROUND((e.value - s.mu) / NULLIF(s.sigma, 0), 2) AS zscore
    FROM events e JOIN stats s USING (event_type)
    WHERE ABS((e.value - s.mu) / NULLIF(s.sigma, 0)) > 3
    """,
    survey="A4,W1",
    doc="Per-group z-score outliers (|z| > 3): one aggregate for the "
    "per-type moments, broadcast back over the stream — the shape scales "
    "as a map-side join since the stats side is group-count-sized.",
)
def events_zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_fixture(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"),
        # constant-valued group => sigma 0: nulled so the z-score is null
        # (filtered out) instead of an ANSI DIVIDE_BY_ZERO abort
        F.when(
            F.stddev_samp("value") > 0, F.stddev_samp("value")
        ).alias("sigma"),
    )
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        ev.join(F.broadcast(stats), "event_type")
        .filter(F.abs(z) > 3)
        .select(
            "event_id",
            "event_type",
            F.round("value", 4).alias("value"),
            F.round(z, 2).alias("zscore"),
        )
    )


@register(
    "profile_documents",
    oracle="""
    SELECT 'doc_id' AS column_name, COUNT(doc_id) AS n_nonnull,
           COUNT(DISTINCT doc_id) AS n_distinct FROM documents
    UNION ALL
    SELECT 'lang', COUNT(lang), COUNT(DISTINCT lang) FROM documents
    UNION ALL
    SELECT 'source', COUNT(source), COUNT(DISTINCT source) FROM documents
    UNION ALL
    SELECT 'n_chars', COUNT(n_chars), COUNT(DISTINCT n_chars) FROM documents
    """,
    survey="A1,X6",
    doc="Schema-wide data profile in ONE scan: count + countDistinct per "
    "column computed in a single aggregate (Catalyst expands to one "
    "Expand+HashAggregate pass), then unpivoted with stack() — the "
    "corpus-audit shape that at 100 TB must not rescan per column.",
)
def profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_fixture(spark, sf_dir, "documents")
    cols = ["doc_id", "lang", "source", "n_chars"]
    aggs = []
    for c in cols:
        aggs.append(F.count(c).alias(f"{c}__n"))
        aggs.append(F.countDistinct(c).alias(f"{c}__d"))
    wide = docs.agg(*aggs)
    stack = ", ".join(f"'{c}', {c}__n, {c}__d" for c in cols)
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack}) AS (column_name, n_nonnull, n_distinct)"
        )
    )


@register(
    "orders_priority_pivot",
    oracle="""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
           COUNT(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS urgent,
           COUNT(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS high,
           COUNT(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END) AS medium,
           COUNT(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END)
               AS not_specified,
           COUNT(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS low
    FROM orders
    GROUP BY 1
    """,
    survey="A4,X7",
    doc="Wide-format pivot: groupBy(year).pivot(priority).count() with the "
    "value list given explicitly — with it, Catalyst plans ONE aggregate "
    "pass; without it, Spark must first run a distinct scan to discover "
    "the pivot values (never omit the list at 100 TB).",
)
def orders_priority_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_fixture(spark, sf_dir, "orders")
    names = {
        "1-URGENT": "urgent",
        "2-HIGH": "high",
        "3-MEDIUM": "medium",
        "4-NOT SPECIFIED": "not_specified",
        "5-LOW": "low",
    }
    wide = (
        o.groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .pivot("o_orderpriority", list(names))
        .count()
    )
    return wide.select(
        "o_year", *[F.coalesce(F.col(f"`{v}`"), F.lit(0)).alias(n) for v, n in names.items()]
    )


@register(
    "sample_stratified_systematic",
    oracle="""
    SELECT doc_id, lang
    FROM (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
      FROM documents
    )
    WHERE rn % 10 = 1
    """,
    survey="X1,A5",
    doc="Deterministic stratified 10% sample: every 10th document per "
    "language stratum in doc_id order. Systematic sampling instead of "
    "Bernoulli sampleBy because RNG draws cannot be reproduced by an "
    "external oracle and make pipeline reruns non-idempotent — for "
    "training-data work the sample must be a pure function of the corpus.",
)
def sample_stratified_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load_fixture(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("doc_id")
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") % 10 == 1)
        .select("doc_id", "lang")
    )


@register(
    "chunk_documents_overlap",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    c AS (
      SELECT doc_id,
             CAST(u.s // 48 AS BIGINT) AS chunk_id,
             CAST(u.s AS BIGINT) AS start_tok,
             toks[u.s + 1 : u.s + 64] AS chunk
      FROM t, UNNEST(range(0, len(toks), 48)) AS u(s)
    )
    SELECT doc_id, chunk_id, start_tok,
           CAST(len(chunk) AS BIGINT) AS n_toks,
           {list_rolling_hash_sql("chunk")} AS chunk_hash
    FROM c
    """,
    survey="X4,X1,X16",
    doc="RAG/training-prep chunking: 64-token windows every 48 tokens "
    "(16-token overlap) with per-chunk offsets and the shared rolling "
    "content hash. Narrow transform, zero shuffles, output bounded at "
    "~1.33x corpus volume; chunk ids/hashes are pure functions of the "
    "token stream so re-ingestion is idempotent. Oracle rederives the "
    "same windows via range+list-slice and the same hash formula.",
)
def chunk_documents_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_fixture(spark, sf_dir, "documents")
    return chunk_windows(docs, size=64, stride=48)


@register(
    "dedup_prefix_clusters",
    oracle=f"""
    WITH h AS (
      SELECT doc_id,
             {list_rolling_hash_sql("string_split(text, ' ')[1:16]")}
               AS prefix_hash
      FROM documents
    ),
    sized AS (
      SELECT prefix_hash, doc_id,
             COUNT(*) OVER (PARTITION BY prefix_hash) AS cluster_size
      FROM h
    )
    SELECT prefix_hash, doc_id, CAST(cluster_size AS BIGINT) AS cluster_size
    FROM sized WHERE cluster_size >= 2
    """,
    survey="X1,X2",
    doc="Boilerplate / partial-duplicate detection: documents sharing an "
    "identical 16-token prefix hash, the weak-key complement of "
    "whole-document exact dedup (how template boilerplate surfaces in web "
    "corpora). Narrow prefix fold per doc, map-side-combined groupBy "
    "count, then the small >=2-cluster table joins back broadcast-style.",
)
def dedup_prefix_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_fixture(spark, sf_dir, "documents")
    return prefix_duplicate_clusters(docs, prefix_len=16)


@register(
    "pack_training_sequences",
    oracle=f"""
    WITH placed AS (
      SELECT lang,
             ({fingerprint_sql()}) % 4 AS shard,
             doc_id,
             len(string_split(text, ' ')) AS n_tokens
      FROM documents
    ),
    cum AS (
      SELECT lang, shard, doc_id, n_tokens,
             COALESCE(SUM(n_tokens) OVER (
               PARTITION BY lang, shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_tok
      FROM placed
    )
    -- CASTs: start_tok is a SUM window (HUGEINT in DuckDB), so derived
    -- integer columns surface as float64 via pandas unless pinned BIGINT;
    -- Spark emits int64 and the driver hasher compares dtypes.
    SELECT lang, shard, doc_id, n_tokens,
           CAST(start_tok // 512 AS BIGINT) AS seq_id,
           CAST(start_tok % 512 AS BIGINT) AS offset_in_seq,
           (start_tok + n_tokens - 1) // 512 > start_tok // 512
             AS crosses_boundary
    FROM cum
    """,
    survey="X4,W1",
    doc="LLM training-shard packing (concat-then-chunk, 512-token budget): "
    "each document's (sequence, offset) slot within its (lang, content-"
    "hash shard) packing group — one cumulative-sum window per group, no "
    "global sort, parallelism = number of groups. Straddling documents "
    "are flagged, not dropped (the trainer's attention mask owns the "
    "boundary). Deterministic: re-ingestion reproduces identical layouts.",
)
def pack_training_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.packing import pack_sequences

    docs = load_fixture(spark, sf_dir, "documents")
    return pack_sequences(docs, budget=512, n_shards=4)


@register(
    "packing_efficiency",
    oracle=f"""
    WITH placed AS (
      SELECT lang,
             ({fingerprint_sql()}) % 4 AS shard,
             doc_id,
             len(string_split(text, ' ')) AS n_tokens
      FROM documents
    ),
    cum AS (
      SELECT lang, shard, doc_id, n_tokens,
             COALESCE(SUM(n_tokens) OVER (
               PARTITION BY lang, shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_tok
      FROM placed
    ),
    pl AS (
      SELECT lang, shard, n_tokens,
             (start_tok + n_tokens - 1) // 512 > start_tok // 512
               AS crosses_boundary
      FROM cum
    )
    -- CASTs: SUM(BIGINT) returns HUGEINT → float64 via pandas; Spark
    -- emits int64 and the driver hasher compares dtypes.
    SELECT lang, shard,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(CASE WHEN crosses_boundary THEN 1 ELSE 0 END) AS BIGINT)
             AS n_straddling,
           CAST((SUM(n_tokens) + 511) // 512 AS BIGINT) AS n_sequences,
           CAST((((SUM(n_tokens) - 1) % 512 + 1) * 1000) // 512 AS BIGINT)
             AS last_seq_fill_permille
    FROM pl
    GROUP BY lang, shard
    """,
    survey="X4,A4",
    doc="Shard-level packing report: sequences produced, straddle counts, "
    "and final-sequence fill per (lang, shard) — the observability row a "
    "100 TB packing job emits per output shard. All-integer arithmetic "
    "(ceil-div, permille) so the report is bit-identical across engines.",
)
def packing_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.packing import pack_sequences, packing_summary

    docs = load_fixture(spark, sf_dir, "documents")
    return packing_summary(pack_sequences(docs, budget=512, n_shards=4), budget=512)


@register(
    "training_shuffle",
    oracle="""
    SELECT doc_id,
           shuffle_key % 8 AS shard,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY shuffle_key % 8
             ORDER BY shuffle_key, doc_id) AS INTEGER) AS pos_in_shard
    FROM (
      SELECT doc_id,
             ('0x' || substring(
               md5(concat(CAST(doc_id AS VARCHAR), ':', '0')), 1, 15))::BIGINT
               AS shuffle_key
      FROM documents
    )
    """,
    survey="X1,W1",
    doc="Deterministic global training shuffle (seed 0, 8 shards): the "
    "sort key is an md5 hash of (doc_id, seed), so the permutation is "
    "reproducible by any engine and a new seed is a fresh epoch — unlike "
    "orderBy(rand()). Shard = key mod 8 and rank-within-shard only: one "
    "shuffle + per-shard windows, never a global row-numbering (which "
    "would funnel the corpus through a single partition).",
)
def training_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.packing import seeded_shuffle

    docs = load_fixture(spark, sf_dir, "documents")
    return seeded_shuffle(docs, n_shards=8, seed=0)


# RAG ingestion capstone constants: D hash-feature dims per chunk, B index
# buckets. Tiny here; at production scale D~256/B~2^18 with the identical
# plan shape (all per-chunk work is narrow, the index build is one groupBy).
RAG_D = 8
RAG_B = 64

# md5-prefix bigint of an expression — the cross-engine hash family shared
# with operators.dedup.shingle_sid (DuckDB rederives it bit-for-bit);
# single source of truth in oracle_sql_helpers
from .oracle_sql_helpers import MD5_SID_DUCK as _DUCK_SID  # noqa: E402
from .oracle_sql_helpers import MD5_SID_SPARK as _SID  # noqa: E402


@register(
    "rag_bucket_index",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    c0 AS (SELECT doc_id, unnest(range(0, len(toks), 48)) AS s, toks FROM t),
    c1 AS (SELECT doc_id, toks[s + 1 : s + 64] AS chunk FROM c0),
    emb AS (
      SELECT doc_id,
             {{chunk_hash}} AS chunk_hash,
             array_to_string(list_transform(range(0, {RAG_D}), b ->
               len(list_filter(chunk, t ->
                 {_DUCK_SID.format(x='t')} % {RAG_D} = b))), ',') AS vec
      FROM c1
    )
    SELECT {_DUCK_SID.format(x='vec')} % {RAG_B} AS bucket_id,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           MIN(chunk_hash) AS min_chunk_hash
    FROM emb GROUP BY 1
    """.format(chunk_hash=list_rolling_hash_sql("chunk")),
    survey="X3,X4,X1,X16",
    doc="RAG ingestion capstone — chunk → featurize → index, end to end: "
    "64/48 overlapping chunks (chunk_windows), a deterministic "
    f"{RAG_D}-dim hash-feature embedding per chunk (token → md5-bucket "
    "counts — the feature-hashing trick, Weinberger et al. 2009, standing "
    "in for a model embedder exactly like the multimodal tier's "
    "deterministic fake decoder), and an inverted bucket index keyed by "
    "the vector's content hash. Every per-chunk step is a narrow "
    "projection; the index build is ONE groupBy on bucket_id — the same "
    "plan at 100 TB with model vectors and real IVF/LSH bucket ids "
    "(both already implemented in operators/similarity.py). Integer "
    "everything, so the full capstone is value-hash-checked.",
)
def rag_bucket_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_fixture(spark, sf_dir, "documents")
    chunks = chunk_windows(docs, size=64, stride=48, keep_tokens=True)
    sid_t = _SID.format(x="t")
    sid_vec = _SID.format(x="vec")
    # md5 once per token: bind the sid array through a single-element
    # transform (Spark SQL has no let; same trick as operators/pq._argmin_sql)
    emb = chunks.select(
        "doc_id",
        "chunk_hash",
        F.expr(
            f"element_at(transform("
            f"array(transform(chunk, t -> {sid_t} % {RAG_D})), sids -> "
            f"array_join(transform(sequence(0, {RAG_D - 1}), b -> "
            f"size(filter(sids, s -> s = b))), ',')), 1)"
        ).alias("vec"),
    )
    return (
        emb.select(
            "doc_id",
            "chunk_hash",
            F.expr(f"{sid_vec} % {RAG_B}").alias("bucket_id"),
        )
        .groupBy("bucket_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("chunk_hash").alias("min_chunk_hash"),
        )
    )
