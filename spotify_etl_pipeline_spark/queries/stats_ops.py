"""Statistical / graph analytics extensions (round 3).

Op families the reference's warehouse tier implies but never ships,
each with a DuckDB oracle:

- weighted PageRank over the customer-nation → supplier-nation trade
  graph (operators/graph.py — the quality-prior / centrality op of a
  curation pipeline),
- corpus-trained char-bigram language-model scoring (the statistical
  quality filter of LLM data pipelines — CCNet/KenLM lineage, here exact
  and self-contained),
- correlation / covariance aggregates,
- rolling window median (frame-bounded percentile state),
- explicitly salted hot-key aggregation (operators/skew.py surfaced as a
  driver-checked query: the salting must be invisible in the result),
- per-label embedding centroids (posexplode re-aggregation — the
  building block knn_ivf's k-means assignment step reuses),
- first-order Markov transition matrix over per-user event sequences
  (sequential-pattern analytics via lag + percent-of-total window),
- source-mixture reweighting (the training-mixture scheduler's knob),
- finite-window EMA with dyadic weights (decay 0.5 over integer cents:
  the weighted sum is exact, so even a float smoothing op value-hashes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.graph import pagerank
from ..operators.skew import salted_count_sum
from .catalog import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from ..schemas import load_fixture

    return load_fixture(spark, sf_dir, name)


# --- PageRank over the nation-level trade graph -----------------------------
def _pagerank_oracle(iterations: int) -> str:
    """Unrolled fixed-iteration PageRank as plain SQL.

    Mirrors operators/graph.py term for term: same teleport constant
    ``(1.0-0.85)/n`` (kept as the literal subtraction so both engines
    evaluate the identical IEEE expression), same uniform dangling-mass
    redistribution, same (rank*w)/ow association order.
    """
    parts = [
        """
        WITH e AS (
          SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
                 CAST(COUNT(*) AS DOUBLE) AS w
          FROM lineitem l
          JOIN orders o ON l.l_orderkey = o.o_orderkey
          JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN supplier s ON l.l_suppkey = s.s_suppkey
          GROUP BY 1, 2
        ),
        nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
        ow AS (SELECT src, SUM(w) AS ow FROM e GROUP BY src),
        r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes)
        """
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f"""
        , c{i} AS (
          SELECT e.dst AS node, SUM(r.rank * e.w / ow.ow) AS contrib
          FROM r{i - 1} r JOIN e ON r.node = e.src JOIN ow ON e.src = ow.src
          GROUP BY e.dst
        ),
        d{i} AS (
          SELECT COALESCE(SUM(r.rank), 0.0) AS dm
          FROM r{i - 1} r ANTI JOIN ow ON r.node = ow.src
        ),
        r{i} AS (
          SELECT nodes.node,
                 (1.0 - 0.85) / (SELECT n FROM nn)
                 + 0.85 * (COALESCE(c{i}.contrib, 0.0)
                           + (SELECT dm FROM d{i}) / (SELECT n FROM nn)) AS rank
          FROM nodes LEFT JOIN c{i} ON nodes.node = c{i}.node
        )
        """
        )
    parts.append(
        f"""
        SELECT n.n_name, ROUND(r{iterations}.rank, 8) AS rank
        FROM r{iterations} JOIN nation n ON r{iterations}.node = n.n_nationkey
        ORDER BY rank DESC, n_name
        """
    )
    return "".join(parts)


def _nation_trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src, dst, w) customer-nation -> supplier-nation edges weighted by
    lineitem count — the graph both pagerank_nation_trade and
    community_nation_trade analyze (one definition, one thing to keep in
    sync with the fixture schema)."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .groupBy(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )


@register(
    "pagerank_nation_trade",
    oracle=_pagerank_oracle(3),
    survey="J1,A4,X1,X9",
    doc="3-iteration damped PageRank (d=0.85, dangling mass redistributed) "
    "over the customer-nation -> supplier-nation edge list weighted by "
    "lineitem count. Each iteration is one equi-join + one keyed "
    "aggregation (Pregel-on-DataFrames); no driver-side data loops — "
    "|V| enters only as a scalar sizing constant.",
)
def pagerank_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _nation_trade_edges(spark, sf_dir)
    ranks = pagerank(edges, iterations=3, damping=0.85, weight="w")
    nation = _t(spark, sf_dir, "nation")
    return (
        ranks.join(F.broadcast(nation), ranks["node"] == nation["n_nationkey"])
        .select("n_name", F.round("rank", 8).alias("rank"))
        .orderBy(F.desc("rank"), "n_name")
    )


# --- char-bigram LM quality scoring ----------------------------------------
@register(
    "text_lm_score",
    oracle="""
    WITH d AS (
      SELECT doc_id, lower(text) AS t FROM documents WHERE length(text) >= 2
    ),
    bg AS (
      SELECT doc_id,
             unnest([substring(t, CAST(x AS INTEGER), 2)
                     for x in range(1, length(t))]) AS bg
      FROM d
    ),
    bgc AS (SELECT doc_id, bg, COUNT(*) AS k FROM bg GROUP BY doc_id, bg),
    lm AS (SELECT bg, SUM(k) AS c FROM bgc GROUP BY bg),
    tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS tc FROM lm)
    SELECT b.doc_id,
           CAST(SUM(b.k) AS BIGINT) AS n_bigrams,
           ROUND(SUM(b.k * LN(lm.c / tot.tc)) / SUM(b.k), 4) AS avg_logp
    FROM bgc b JOIN lm ON b.bg = lm.bg CROSS JOIN tot
    GROUP BY b.doc_id
    """,
    survey="X4",
    doc="Statistical quality filter: train a char-bigram LM on the corpus "
    "itself (one groupBy), then score every document by mean bigram "
    "log-likelihood (CCNet/KenLM-style perplexity filtering, exact). "
    "The LM table is alphabet^2 rows -> broadcast back to the exploded "
    "bigram stream; the only shuffles are the LM count and the per-doc "
    "re-aggregation, both keyed and partial-agg friendly.",
)
def text_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lm_score_per_doc(_t(spark, sf_dir, "documents"))


def _bigram_count_batches(batches):
    """mapInArrow kernel: exact per-(doc, bigram) counts for batches of
    (doc_id, t) rows.  Bigram counting is doc-local, so the weighted
    (doc_id, bg, k) table comes out of the scan with ZERO shuffle and
    the corpus-char-scale explode never exists (guide §4.2: hand whole
    Arrow batches to vectorized native code).  Codepoint semantics
    match the old ``substring(t, i, 2)`` expression — Spark string
    functions and Python ``str`` both index codepoints — and lower()
    stays on the JVM side so case mapping cannot drift.

    Vectorization: one utf-32 decode of the batch's concatenated text,
    each bigram packed into a 42-bit integer (2 × 21-bit codepoints —
    the Unicode max is 0x10FFFF), batch row index in the high bits,
    then ONE np.unique over the packed keys groups every (row, bigram)
    pair.  The only Python-level loop builds the batch's DISTINCT
    bigram strings (alphabet²-bounded), dictionary-decoded back through
    an Arrow take."""
    import numpy as np
    import pyarrow as pa

    for batch in batches:
        ids = batch.column(0)
        texts = batch.column(1).to_pylist()
        n_docs = len(texts)
        if n_docs == 0:
            continue
        lens = np.fromiter(
            (len(t) for t in texts), dtype=np.int64, count=n_docs
        )
        codes = np.frombuffer(
            "".join(texts).encode("utf-32-le"), dtype=np.uint32
        ).astype(np.uint64)
        row = np.repeat(np.arange(n_docs, dtype=np.uint64), lens)
        pair = (codes[:-1] << np.uint64(21)) | codes[1:]
        # drop pairs crossing row boundaries (callers filter len >= 2,
        # so every kept row contributes >= 1 pair and stays represented)
        keys = ((row[:-1] << np.uint64(42)) | pair)[row[:-1] == row[1:]]
        if keys.size == 0:
            continue
        uk, counts = np.unique(keys, return_counts=True)
        pc = uk & np.uint64((1 << 42) - 1)
        pc_u, inv = np.unique(pc, return_inverse=True)
        bg = pa.array(
            [chr(int(p) >> 21) + chr(int(p) & 0x1FFFFF) for p in pc_u],
            type=pa.string(),
        ).take(pa.array(inv.astype(np.int64)))
        yield pa.record_batch(
            [
                ids.take(pa.array((uk >> np.uint64(42)).astype(np.int64))),
                bg,
                pa.array(counts.astype(np.int64)),
            ],
            names=["doc_id", "bg", "k"],
        )


def lm_score_per_doc(
    src: DataFrame, materialize_weighted: bool = False
) -> DataFrame:
    """(doc_id, n_bigrams, avg_logp) for any (doc_id, text) relation —
    the char-bigram LM fit + score, factored out so compositions (the
    curation capstones) can run it over CLEANED text rather than the
    raw `documents` table.

    r13 plan (guide §4.2): the weighted (doc_id, bg, k) table is
    computed doc-locally by ONE vectorized mapInArrow kernel over the
    (doc_id, lowered-text) scan — the r8 char-scale explode and its
    (doc_id, bg) exchange are gone; the FIT is a partial-agg groupBy(bg)
    over the compact weighted rows (identical counts: Σ_doc k == corpus
    count), and the SCORING branch joins the broadcast LM and
    re-aggregates per doc exactly as before.  avg_logp stays
    Σ k·ln(p) / Σ k with k, c, tc the same integers and ln/×/÷ evaluated
    by the same JVM expressions — the engines sum term-sets of identical
    values, exactly as order-robust under the 4-decimal round as r8.
    ``materialize_weighted`` checkpoints the weighted table — measured
    a LOSS at the sf10 tile (it is corpus-scale; SCALE.md §Round-8),
    off by default, kept for many-consumer compositions."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    docs = (
        src.filter(F.length("text") >= 2)
        .select("doc_id", F.lower(F.col("text")).alias("t"))
    )
    bgc = docs.mapInArrow(
        _bigram_count_batches,
        StructType(
            [
                docs.schema["doc_id"],
                StructField("bg", StringType(), False),
                StructField("k", LongType(), False),
            ]
        ),
    )
    if materialize_weighted:
        # measured a LOSS at the sf10 tile (286.5 s vs 197.8 s without,
        # SCALE.md §Round-8): the weighted table is corpus-scale, so
        # materializing it costs a full extra write/read while the
        # recompute it saves is one scan + the Arrow kernel. Kept as a
        # dial for callers whose downstream re-reads bgc many MORE than
        # twice.
        bgc = bgc.localCheckpoint(eager=True)
    # the FIT partial-aggregates the weighted rows map-side straight to
    # alphabet² rows — same counts as the r8 raw-stream groupBy(bg)
    # (Σ_doc k == corpus occurrence count), zero corpus-scale shuffle.
    # (An eager localCheckpoint of the tiny LM table was measured and
    # REVERTED in r13: the formatted plan prints the kernel subtree once
    # per consumer, but execution already dedups it via exchange/
    # subquery reuse, so the checkpoint only added a job — tile A/B
    # 8.9 → 9.1 s, sf0.1 flat.)
    lm = bgc.groupBy("bg").agg(F.sum("k").alias("c"))
    tot = lm.agg(F.sum("c").cast("double").alias("tc"))
    return (
        bgc.join(F.broadcast(lm), "bg")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.sum("k").alias("n_bigrams"),
            F.round(
                F.sum(F.col("k") * F.log(F.col("c") / F.col("tc")))
                / F.sum("k"),
                4,
            ).alias("avg_logp"),
        )
    )


def lm_score_milli(src: DataFrame) -> DataFrame:
    """Per-document integer milli-score from the shared char-bigram LM
    over any (doc_id, lang, text) relation: (doc_id, lang, m) with
    ``m = floor(avg_logp * 10000 + 0.5)`` — floor(x+0.5), not round()/
    cast(), because IEEE mul/add are bit-identical across engines while
    round-half rules and double→int casts are not (the repo-wide
    quantization idiom)."""
    sc = lm_score_per_doc(src).select(
        "doc_id",
        F.floor(F.col("avg_logp") * 10000 + F.lit(0.5))
        .cast("long")
        .alias("m"),
    )
    lg = src.filter(F.length("text") >= 2).select("doc_id", "lang")
    return sc.join(lg, "doc_id")


def _lm_score_milli(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lm_score_milli(_t(spark, sf_dir, "documents"))


def assign_quality_buckets(
    scored: DataFrame, n_buckets: int = 3, approx: bool = False
) -> DataFrame:
    """Per-language quality-tier assignment over (doc_id, lang, m) →
    (doc_id, lang, m, bucket), bucket 1 = head (highest scores).

    Shared by :func:`lm_quality_buckets` and the curation capstone so
    both expose the same dial: ``approx=False`` ranks with ``ntile``
    over (m DESC, doc_id) — exact equal tiers, deterministic, the
    oracle formulation — but a per-lang NTILE window materializes one
    language's corpus in ONE task, so at 100 TB use ``approx=True``:
    k-1 ``percentile_approx`` cutoffs per language (one partial-agg
    pass) broadcast back as thresholds — the corpus is never globally
    sorted and tier sizes converge to exact as the sketch tightens."""
    k = int(n_buckets)
    if approx:
        cuts = scored.groupBy("lang").agg(
            F.percentile_approx(
                "m", [i / k for i in range(1, k)], 10_000
            ).alias("qs")
        )
        return scored.join(F.broadcast(cuts), "lang").select(
            "doc_id",
            "lang",
            "m",
            # bucket 1 = head (highest scores): count cutoffs >= m,
            # descending-quantile convention mirroring the ntile order
            (
                F.lit(k)
                - F.aggregate(
                    "qs",
                    F.lit(0),
                    lambda acc, q: acc
                    + F.when(F.col("m") > q, F.lit(1)).otherwise(F.lit(0)),
                )
            ).alias("bucket"),
        )
    w = Window.partitionBy("lang").orderBy(F.desc("m"), F.asc("doc_id"))
    return scored.select(
        "doc_id", "lang", "m", F.ntile(k).over(w).alias("bucket")
    )


def lm_quality_buckets(
    spark: SparkSession, sf_dir: str, n_buckets: int = 3,
    approx: bool = False, materialize_scores: bool = True,
) -> DataFrame:
    """CCNet-style per-language quality bucketing (Wenzek et al. 2020):
    split each language's documents into ``n_buckets`` equal tiers by LM
    score (head = best-scoring) and report per-(lang, bucket) document
    counts and summed integer milli-scores.

    ``approx=False`` ranks with ``ntile`` over (score DESC, doc_id) —
    exact equal division, fully deterministic (integer score + id
    tie-break), and the oracle-checkable formulation; but a per-lang
    NTILE window materializes one language's corpus in one task, so at
    100 TB use ``approx=True``: two ``percentile_approx`` cutoffs per
    language (one partial-agg pass), broadcast back as thresholds — the
    corpus is never globally sorted and bucket sizes converge to the
    exact tiers as the sketch tightens (tolerance-tested against the
    exact mode, the approx_count_distinct convention).
    """
    scored = _lm_score_milli(spark, sf_dir)
    if materialize_scores:
        # the per-doc score table is read by two consumers (the
        # cutoff/ntile stage AND the bucket assignment join in approx
        # mode) and is itself the artifact a production pipeline stores;
        # left lazy, each consumer re-runs the full 2-pass bigram LM
        # pipeline (the stored-artifact lesson, SCALE.md §Round-7)
        scored = scored.localCheckpoint(eager=True)
    bucketed = assign_quality_buckets(scored, n_buckets=n_buckets, approx=approx)
    return bucketed.groupBy("lang", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("m").cast("long").alias("sum_score_milli"),
    ).select("lang", F.col("bucket").cast("long").alias("bucket"),
             "n_docs", "sum_score_milli")


@register(
    "quality_lm_buckets",
    oracle="""
    WITH d AS (
      SELECT doc_id, lower(text) AS t FROM documents WHERE length(text) >= 2
    ),
    bg AS (
      SELECT doc_id,
             unnest([substring(t, CAST(x AS INTEGER), 2)
                     for x in range(1, length(t))]) AS bg
      FROM d
    ),
    bgc AS (SELECT doc_id, bg, COUNT(*) AS k FROM bg GROUP BY doc_id, bg),
    lm AS (SELECT bg, SUM(k) AS c FROM bgc GROUP BY bg),
    tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS tc FROM lm),
    sc AS (
      SELECT b.doc_id,
             CAST(FLOOR(ROUND(SUM(b.k * LN(lm.c / tot.tc)) / SUM(b.k), 4)
                        * 10000 + 0.5)
                  AS BIGINT) AS m
      FROM bgc b JOIN lm ON b.bg = lm.bg CROSS JOIN tot
      GROUP BY b.doc_id
    ),
    lg AS (
      SELECT doc_id, lang FROM documents WHERE length(text) >= 2
    ),
    rk AS (
      SELECT lang, m,
             NTILE(3) OVER (PARTITION BY lang ORDER BY m DESC, doc_id)
               AS bucket
      FROM sc JOIN lg USING (doc_id)
    )
    SELECT lang, CAST(bucket AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(m) AS BIGINT) AS sum_score_milli
    FROM rk GROUP BY lang, bucket
    """,
    survey="X4,X10",
    doc="CCNet-style per-language quality tiers (Wenzek et al. 2020): "
    "each language's documents split into head/middle/tail thirds by "
    "the shared char-bigram LM score, reported as per-(lang, bucket) "
    "counts + summed integer milli-scores. Deterministic ntile over "
    "(integer score DESC, doc_id) — all-integer output, no float "
    "aggregates cross the engine boundary. The exact ntile is the "
    "oracle formulation; the operator's approx=True mode (two "
    "percentile_approx cutoffs broadcast per language, corpus never "
    "globally sorted) is the 100 TB path, tolerance-tested against "
    "this exact mode.",
)
def quality_lm_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lm_quality_buckets(spark, sf_dir, n_buckets=3, approx=False)


# --- correlation / covariance aggregates ------------------------------------
@register(
    "lineitem_correlations",
    oracle="""
    SELECT ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           ROUND(corr(l_extendedprice, l_discount), 6) AS corr_price_disc,
           ROUND(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qty_price,
           ROUND(stddev_samp(l_extendedprice), 4) AS sd_price
    FROM lineitem
    """,
    survey="A2,X6,X11",
    doc="Bivariate statistics over the fact table: Pearson correlation, "
    "sample covariance, sample stddev — single-pass co-moment "
    "aggregates, partial-merge exact, one ungrouped reduction.",
)
def lineitem_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "lineitem").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.corr("l_extendedprice", "l_discount"), 6).alias("corr_price_disc"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias(
            "covar_qty_price"
        ),
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
    )


# --- rolling window median --------------------------------------------------
@register(
    "rolling_median_acctbal",
    oracle="""
    SELECT c_nationkey, c_custkey,
           CAST(ROUND(2 * median(CAST(ROUND(c_acctbal * 100) AS BIGINT))
                      OVER (PARTITION BY c_nationkey ORDER BY c_custkey
                            ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)) AS BIGINT)
             AS med2_cents
    FROM customer
    """,
    survey="W1,X6,X11",
    doc="Frame-bounded rolling median (4-row trailing window per nation). "
    "Spark's median aggregate rejects window frames, so the frame state "
    "is held explicitly: collect_list over the 4-row frame, sort_array, "
    "middle-element pick — the doubled-cents integer domain makes the "
    "even-frame case (sum of the two middles) bit-exact in both engines.",
)
def rolling_median_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("c_nationkey")
        .orderBy("c_custkey")
        .rowsBetween(-3, Window.currentRow)
    )
    cents = F.round(F.col("c_acctbal") * 100).cast("bigint")
    vals = F.sort_array(F.collect_list(cents).over(w))
    n = F.size(vals)
    med2 = (
        F.when(
            n % 2 == 1, F.element_at(vals, ((n + 1) / 2).cast("int")) * 2
        ).otherwise(
            F.element_at(vals, (n / 2).cast("int"))
            + F.element_at(vals, (n / 2 + 1).cast("int"))
        )
    ).cast("bigint")
    return _t(spark, sf_dir, "customer").select(
        "c_nationkey", "c_custkey", med2.alias("med2_cents")
    )


# --- salted hot-key aggregation ---------------------------------------------
@register(
    "salted_priority_totals",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM orders GROUP BY o_orderpriority
    """,
    survey="A4,X7",
    doc="operators/skew.py salted_count_sum surfaced as a driver-checked "
    "query: 5 hot priority keys aggregated in two stages on (key, "
    "salt16) then key. The oracle is the plain GROUP BY — correct "
    "salting is invisible in the result (integer-cents domain so the "
    "two-stage sum is bit-exact).",
)
def salted_priority_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").withColumn(
        "cents", F.round(F.col("o_totalprice") * 100).cast("bigint")
    )
    out = salted_count_sum(
        o, keys=["o_orderpriority"], sum_col="cents", unique_col="o_orderkey"
    )
    return out.select(
        "o_orderpriority",
        F.col("n").alias("n_orders"),
        F.col("total").alias("total_cents"),
    )


# --- per-label embedding centroids ------------------------------------------
@register(
    "embedding_centroids",
    oracle="""
    WITH x AS (
      SELECT label,
             CAST(generate_subscripts(embedding, 1) AS INTEGER) AS dim,
             unnest(embedding) AS e
      FROM embeddings
    )
    SELECT label, dim, ROUND(AVG(e), 6) AS centroid
    FROM x GROUP BY label, dim
    """,
    survey="X3",
    doc="Element-wise per-label mean vector via posexplode + (label, dim) "
    "aggregation — the assignment-step building block of knn_ivf's "
    "k-means, driver-checked in isolation. Shuffle is keyed on "
    "(label, dim): wide but algebraic, so partial aggregation halves "
    "it map-side.",
)
def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .similarity_queries import _emb

    return (
        _emb(spark, sf_dir)
        .select("label", F.posexplode("embedding").alias("pos", "e"))
        .groupBy("label", (F.col("pos") + 1).cast("int").alias("dim"))
        .agg(F.round(F.avg("e"), 6).alias("centroid"))
    )


# --- sequential pattern analytics: Markov transition matrix ------------------
@register(
    "event_transition_matrix",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type
      FROM events
    ),
    p AS (
      SELECT event_type AS curr,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM ev
    ),
    c AS (
      SELECT prev, curr, CAST(COUNT(*) AS BIGINT) AS n
      FROM p WHERE prev IS NOT NULL GROUP BY prev, curr
    )
    SELECT prev, curr, n,
           ROUND(n / SUM(n) OVER (PARTITION BY prev), 6) AS p
    FROM c
    """,
    survey="W1,A4,X8",
    doc="First-order Markov transition matrix over per-user event "
    "sequences: lag() pairs (deterministic (ts, event_id) ordering), "
    "pair counts, then row-normalized P(curr|prev) via a percent-of-"
    "total window. The sequence shuffle is keyed by user_id; the "
    "matrix is |event_type|^2 rows.",
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        _t(spark, sf_dir, "events")
        .select("user_id", "event_id", "ts", F.col("event_type").alias("curr"))
        .withColumn("prev", F.lag("curr").over(w))
        .filter(F.col("prev").isNotNull())
    )
    counts = pairs.groupBy("prev", "curr").agg(F.count(F.lit(1)).alias("n"))
    wp = Window.partitionBy("prev")
    return counts.select(
        "prev",
        "curr",
        "n",
        F.round(F.col("n") / F.sum("n").over(wp), 6).alias("p"),
    )


# --- source-mixture reweighting ----------------------------------------------
@register(
    "mixture_reweighting",
    oracle="""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(SUM(COUNT(*)) OVER ()
                 / (COUNT(*) OVER () * COUNT(*)), 6) AS weight
    FROM documents GROUP BY source
    """,
    survey="A4,W1",
    doc="Per-source sampling multipliers that rebalance the corpus to a "
    "uniform source mixture: weight = total / (n_sources * n_source). "
    "weight > 1 means upsample (repeat epochs), < 1 means downsample — "
    "the knob a training-mixture scheduler consumes. One grouped "
    "aggregate plus window totals over the |sources|-row result.",
)
def mixture_reweighting(spark: SparkSession, sf_dir: str) -> DataFrame:
    counts = (
        _t(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    # Grand totals as a 1-row ungrouped agg + broadcast attach (the
    # lm-score idiom) instead of an unpartitioned window: identical
    # values, but no global WindowExec — no single-partition sort and no
    # "No Partition Defined" warning in every run.
    tot = counts.agg(
        F.sum("n_docs").alias("tot_docs"),
        F.count(F.lit(1)).alias("n_sources"),
    )
    return counts.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        F.round(
            F.col("tot_docs") / (F.col("n_sources") * F.col("n_docs")),
            6,
        ).alias("weight"),
    )


# --- finite-window exponential moving average --------------------------------
@register(
    "events_ema_value",
    oracle="""
    WITH ev AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
             FLOOR(value * 100 + 0.5) AS cents
      FROM events
    ),
    fr AS (
      SELECT event_id, user_id,
             list(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS vals
      FROM ev
    )
    SELECT event_id, user_id,
           ROUND(list_sum([vals[i] * pow(0.5, len(vals) - i)
                           for i in range(1, len(vals) + 1)]), 4) AS ema8
    FROM fr
    """,
    survey="W1,X8",
    doc="8-row exponential moving average per user (decay 0.5, newest "
    "weight 1). The frame state is an explicit collect_list; weights "
    "are exact powers of two over an integer-cents domain, so the "
    "weighted sum is a dyadic rational — bit-identical across engines "
    "and partitionings (the reason decay=0.5 and floor(x*100+0.5) "
    "quantization are chosen over round()).",
)
def events_ema_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    w8 = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-7, Window.currentRow)
    )
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.floor(F.col("value") * 100 + 0.5).cast("double").alias("cents"),
    )
    return (
        ev.withColumn("vals", F.collect_list("cents").over(w8))
        .select(
            "event_id",
            "user_id",
            F.round(
                F.expr(
                    "aggregate(transform(vals, (x, i) -> "
                    "x * pow(0.5D, size(vals) - 1 - i)), 0D, (acc, v) -> acc + v)"
                ),
                4,
            ).alias("ema8"),
        )
    )


# --- in-engine model fits ----------------------------------------------------
def _logistic_fit_ctes(iterations: int) -> str:
    """Unrolled batch-GD logistic regression in SQL, term-for-term with
    operators/ml.py (zero init, lr=0.5, mean gradient, left-assoc z) —
    the CTE chain ending at ``wi{iterations}``, shared by the fit entry
    and the apply entry so fit-and-apply sit under one hash.

    Every CTE is ``AS MATERIALIZED``: each wi/g level is referenced 3-7
    times by the next, and DuckDB's default inlining re-expands the
    whole upstream chain per reference — measured ~120 s at sf0.01 for
    3 unrolled steps of a 500-row fit (vs sub-second materialized).
    Same fix as the end-to-end capstone oracle (endtoend._e2e_oracle)."""
    parts = [
        """
    WITH feats AS MATERIALIZED (
      SELECT doc_id,
             CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
             n_chars / 1000.0 AS x1,
             (length(text) - length(replace(text, ' ', ''))) / length(text) AS x2
      FROM documents
    ),
    nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM feats),
    wi0 AS MATERIALIZED (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2)
    """
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f"""
    , p{i} AS MATERIALIZED (
      SELECT y, x1, x2,
             1.0 / (1.0 + EXP(-((SELECT w0 FROM wi{i - 1})
                    + (SELECT w1 FROM wi{i - 1}) * x1
                    + (SELECT w2 FROM wi{i - 1}) * x2))) AS p
      FROM feats
    ), g{i} AS MATERIALIZED (
      SELECT SUM(p - y) AS g0, SUM((p - y) * x1) AS g1,
             SUM((p - y) * x2) AS g2
      FROM p{i}
    ), wi{i} AS MATERIALIZED (
      SELECT (SELECT w0 FROM wi{i - 1})
               - 0.5 * (SELECT g0 FROM g{i}) / (SELECT n FROM nn) AS w0,
             (SELECT w1 FROM wi{i - 1})
               - 0.5 * (SELECT g1 FROM g{i}) / (SELECT n FROM nn) AS w1,
             (SELECT w2 FROM wi{i - 1})
               - 0.5 * (SELECT g2 FROM g{i}) / (SELECT n FROM nn) AS w2
    )
    """
        )
    return "".join(parts)


def _logistic_oracle(iterations: int) -> str:
    return (
        _logistic_fit_ctes(iterations)
        + f"""
    SELECT 'bias' AS feature, ROUND(w0, 6) AS weight FROM wi{iterations}
    UNION ALL
    SELECT 'x_chars_k' AS feature, ROUND(w1, 6) AS weight FROM wi{iterations}
    UNION ALL
    SELECT 'x_space_frac' AS feature, ROUND(w2, 6) AS weight FROM wi{iterations}
    """
    )


def _logistic_apply_oracle(iterations: int) -> str:
    """Fit-and-APPLY under one hash: rederive the unrolled GD weights,
    quantize them to the 6dp stored-artifact form (exactly what the fit
    entry emits), then score every document with the exp-FREE linear
    logit z = w0 + w1·x1 + w2·x2 and threshold at z >= 0 ⟺ p >= 0.5.
    Scoring uses only correctly-rounded IEEE mul/add on identical
    doubles (left-assoc, same as the Spark projection), so the per-doc
    score is bit-identical cross-engine — unlike sigmoid(p), whose
    ``exp`` is not correctly rounded and differs across libms."""
    return (
        _logistic_fit_ctes(iterations)
        + f"""
    , wr AS MATERIALIZED (
      SELECT ROUND(w0, 6) AS w0, ROUND(w1, 6) AS w1, ROUND(w2, 6) AS w2
      FROM wi{iterations}
    )
    SELECT doc_id,
           ROUND((SELECT w0 FROM wr)
                 + (SELECT w1 FROM wr) * x1
                 + (SELECT w2 FROM wr) * x2, 6) AS score,
           ((SELECT w0 FROM wr)
            + (SELECT w1 FROM wr) * x1
            + (SELECT w2 FROM wr) * x2) >= 0.0 AS passed
    FROM feats
    """
    )


@register(
    "logistic_quality_fit",
    oracle=_logistic_oracle(3),
    survey="X4,A3,X12",
    doc="In-engine quality-classifier training (the fastText-style filter "
    "of curation pipelines): 3 full-batch gradient steps of logistic "
    "regression predicting lang='en' from char-count and space-fraction "
    "features. Each step is ONE ungrouped partial-merge aggregation "
    "(operators/ml.py); the weight vector is k+1 driver scalars, like "
    "k-means centroids. The oracle replays the identical steps in "
    "unrolled SQL.",
)
def logistic_quality_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ml import logistic_fit

    feats = _t(spark, sf_dir, "documents").select(
        F.when(F.col("lang") == "en", 1.0).otherwise(0.0).alias("y"),
        (F.col("n_chars") / F.lit(1000.0)).alias("x1"),
        (
            (F.length("text") - F.length(F.expr("replace(text, ' ', '')")))
            / F.length("text")
        ).alias("x2"),
    )
    w = logistic_fit(feats, ["x1", "x2"], "y", iterations=3, lr=0.5)
    out = spark.createDataFrame(
        list(zip(["bias", "x_chars_k", "x_space_frac"], w)),
        "feature string, weight double",
    )
    return out.select("feature", F.round("weight", 6).alias("weight"))


@register(
    "quality_score_apply",
    oracle=_logistic_apply_oracle(3),
    survey="X12,X4,P2",
    doc="The APPLY half of the quality-classifier loop (VERDICT r11 "
    "#5), closing fit→apply the way encode→decode closed the "
    "tokenizer: rederive logistic_quality_fit's 3-step GD weights, "
    "quantize to the 6dp stored-artifact form, bake them into the "
    "plan as literals (operators/ml.py::logistic_apply — the d "
    "scalars ARE the broadcast), and score every document with the "
    "exp-free linear logit, thresholding at z >= 0 ⟺ p >= 0.5. "
    "Fit and apply sit under ONE value hash — per-doc score AND keep "
    "decision — because the logit uses only correctly-rounded IEEE "
    "mul/add on identical rounded weights (sigmoid's exp is libm-"
    "dependent and would not hash). Scoring adds zero exchanges/joins "
    "to the corpus scan (plan-asserted): map-only at 100 TB. On the "
    "fixture the 3-step fit never clears p=0.5 (class prior ~25%, "
    "weakly-separating features), so passed is uniformly False there — "
    "the hash payload is the per-doc score; both filter branches are "
    "unit-tested with synthetic weights (tests/test_ml.py).",
)
def quality_score_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ml import logistic_apply, logistic_fit

    feats = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(F.col("lang") == "en", 1.0).otherwise(0.0).alias("y"),
        (F.col("n_chars") / F.lit(1000.0)).alias("x1"),
        (
            (F.length("text") - F.length(F.expr("replace(text, ' ', '')")))
            / F.length("text")
        ).alias("x2"),
    )
    w = logistic_fit(feats, ["x1", "x2"], "y", iterations=3, lr=0.5)
    # quantize through the SAME engine path the fit entry's output
    # takes (F.round on a 1-row frame), not Python round(): the stored
    # artifact must be the exact doubles the oracle's ROUND produces
    wr = (
        spark.createDataFrame([tuple(w)], "w0 double, w1 double, w2 double")
        .select(
            F.round("w0", 6).alias("w0"),
            F.round("w1", 6).alias("w1"),
            F.round("w2", 6).alias("w2"),
        )
        .collect()[0]
    )
    scored = logistic_apply(
        feats, ["x1", "x2"], [wr["w0"], wr["w1"], wr["w2"]], threshold=0.0
    )
    return scored.select(
        "doc_id", F.round("z", 6).alias("score"), "passed"
    )


@register(
    "ols_price_on_quantity",
    oracle="""
    WITH s AS (
      SELECT covar_pop(l_quantity, l_extendedprice) AS cxy,
             var_pop(l_quantity) AS vx,
             AVG(l_quantity) AS mx, AVG(l_extendedprice) AS my,
             corr(l_quantity, l_extendedprice) AS r
      FROM lineitem
    )
    SELECT ROUND(cxy / vx, 6) AS slope,
           ROUND(my - cxy / vx * mx, 4) AS intercept,
           ROUND(r * r, 6) AS r2
    FROM s
    """,
    survey="A2,X6,X12",
    doc="Closed-form simple OLS (slope = covar_pop/var_pop, intercept from "
    "the means, R^2 = corr^2) — a model fit as a single co-moment "
    "aggregation pass, no iteration at all.",
)
def ols_price_on_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _t(spark, sf_dir, "lineitem").agg(
        F.covar_pop("l_quantity", "l_extendedprice").alias("cxy"),
        F.var_pop("l_quantity").alias("vx"),
        F.avg("l_quantity").alias("mx"),
        F.avg("l_extendedprice").alias("my"),
        F.corr("l_quantity", "l_extendedprice").alias("r"),
    )
    return s.select(
        F.round(F.col("cxy") / F.col("vx"), 6).alias("slope"),
        F.round(
            F.col("my") - F.col("cxy") / F.col("vx") * F.col("mx"), 4
        ).alias("intercept"),
        F.round(F.col("r") * F.col("r"), 6).alias("r2"),
    )


# --- robust preprocessing / feature encoding ---------------------------------
@register(
    "winsorize_prices",
    oracle="""
    WITH b AS (
      SELECT l_returnflag,
             percentile_cont(0.05) WITHIN GROUP (ORDER BY l_extendedprice) AS p05,
             percentile_cont(0.95) WITHIN GROUP (ORDER BY l_extendedprice) AS p95
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN l.l_extendedprice < b.p05 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_capped_low,
           CAST(SUM(CASE WHEN l.l_extendedprice > b.p95 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_capped_high,
           ROUND(AVG(LEAST(GREATEST(l.l_extendedprice, b.p05), b.p95)), 4)
             AS avg_capped
    FROM lineitem l JOIN b ON l.l_returnflag = b.l_returnflag
    GROUP BY l.l_returnflag
    """,
    survey="A4,X6",
    doc="Winsorization (outlier capping at the per-group p05/p95 band) — "
    "the robust-preprocessing step before any mean-sensitive training "
    "statistic. Exact interpolated percentiles per group (|groups| "
    "rows, broadcast back to the fact table), then clip + re-aggregate; "
    "two shuffles total, both keyed on the group column.",
)
def winsorize_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    bands = li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", F.lit(0.05)).alias("p05"),
        F.percentile("l_extendedprice", F.lit(0.95)).alias("p95"),
    )
    j = li.join(F.broadcast(bands), "l_returnflag")
    capped = F.least(F.greatest(F.col("l_extendedprice"), F.col("p05")), F.col("p95"))
    return j.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col("l_extendedprice") < F.col("p05"), 1).otherwise(0)
        ).alias("n_capped_low"),
        F.sum(
            F.when(F.col("l_extendedprice") > F.col("p95"), 1).otherwise(0)
        ).alias("n_capped_high"),
        F.round(F.avg(capped), 4).alias("avg_capped"),
    )


@register(
    "target_encode_loo",
    oracle="""
    WITH o AS (
      SELECT o_orderkey, o_orderpriority,
             CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders
    )
    SELECT o_orderkey, o_orderpriority,
           ROUND((SUM(cents) OVER (PARTITION BY o_orderpriority) - cents)
                 / (COUNT(*) OVER (PARTITION BY o_orderpriority) - 1), 2)
             AS loo_mean_cents
    FROM o
    """,
    survey="W1,A4",
    doc="Leave-one-out target encoding: each order's priority category is "
    "replaced by the mean total price of the OTHER orders in that "
    "category — the leakage-free categorical encoding for training "
    "(plain per-category means would leak each row's own label). One "
    "window over the category: group sums broadcast within partitions, "
    "row value subtracted out. Integer-cents domain: the float "
    "formulation landed on a half-ulp ROUND boundary at sf0.001 (group "
    "sums differ by 1 ulp between engines); exact integer sums make the "
    "quotient bit-identical before rounding.",
)
def target_encode_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_orderpriority")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    return (
        _t(spark, sf_dir, "orders")
        .withColumn("cents", cents)
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.round(
                (F.sum("cents").over(w) - F.col("cents"))
                / (F.count(F.lit(1)).over(w) - 1),
                2,
            ).alias("loo_mean_cents"),
        )
    )


@register(
    "lang_source_chi2",
    oracle="""
    WITH o AS (
      SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n
      FROM documents GROUP BY lang, source
    ),
    r AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS rn FROM o GROUP BY lang),
    c AS (SELECT source, CAST(SUM(n) AS BIGINT) AS cn FROM o GROUP BY source),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM o),
    grid AS (
      SELECT r.lang, c.source, r.rn, c.cn, tot.nn,
             COALESCE(o.n, 0) AS obs
      FROM r CROSS JOIN c CROSS JOIN tot
      LEFT JOIN o ON o.lang = r.lang AND o.source = c.source
    ),
    cell AS (
      SELECT CAST(FLOOR(
               ((CAST(obs AS DOUBLE) * CAST(nn AS DOUBLE)
                 - CAST(rn AS DOUBLE) * CAST(cn AS DOUBLE))
                * (CAST(obs AS DOUBLE) * CAST(nn AS DOUBLE)
                   - CAST(rn AS DOUBLE) * CAST(cn AS DOUBLE)))
               / ((CAST(nn AS DOUBLE) * CAST(rn AS DOUBLE))
                  * CAST(cn AS DOUBLE))
               * 1000000.0 + 0.5) AS BIGINT) AS chi2_micro_cell
      FROM grid
    )
    SELECT CAST(SUM(chi2_micro_cell) AS BIGINT) AS chi2_micro,
           CAST((SELECT COUNT(*) - 1 FROM r)
                * (SELECT COUNT(*) - 1 FROM c) AS BIGINT) AS dof,
           (SELECT nn FROM tot) AS n
    FROM cell
    """,
    survey="A4,X4,W1,X17",
    doc="Chi-square test of independence over the lang × source "
    "contingency table — the drift/imbalance gate a corpus ingest runs "
    "per batch. The grid is the CROSS of the two margin aggregates "
    "(|langs| × |sources| rows — margin-sized, never corpus-sized) left-"
    "joined to observed counts so zero cells contribute their full "
    "expected mass. Per-cell statistic promotes every count to double "
    "BEFORE any multiplication (obs*nn and (nn*rn)*cn overflow int64 "
    "once the corpus passes ~2e6 rows, which under Spark ANSI mode "
    "would throw ARITHMETIC_OVERFLOW at exactly the batch scale this "
    "gate targets); the products and the one division are identically "
    "ordered on both engines so the IEEE results stay bit-equal, then "
    "floored to micro units and SUMmed as bigints. dof and N ride "
    "along for the report.",
)
def lang_source_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    o = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("n"))
    r = o.groupBy("lang").agg(F.sum("n").alias("rn"))
    c = o.groupBy("source").agg(F.sum("n").alias("cn"))
    tot = o.agg(F.sum("n").alias("nn"))
    grid = (
        r.crossJoin(F.broadcast(c))
        .crossJoin(F.broadcast(tot))
        .join(o, ["lang", "source"], "left")
        .select(
            "rn", "cn", "nn", F.coalesce("n", F.lit(0)).alias("obs")
        )
    )
    cell = grid.select(
        F.expr(
            "cast(floor("
            "  ((cast(obs as double) * cast(nn as double)"
            "    - cast(rn as double) * cast(cn as double))"
            "   * (cast(obs as double) * cast(nn as double)"
            "      - cast(rn as double) * cast(cn as double)))"
            "  / ((cast(nn as double) * cast(rn as double))"
            "     * cast(cn as double))"
            "  * 1000000.0 + 0.5) as bigint)"
        ).alias("chi2_micro_cell")
    )
    dof = (
        r.agg(F.count(F.lit(1)).alias("nl"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("ns")))
        .select(((F.col("nl") - 1) * (F.col("ns") - 1)).alias("dof"))
    )
    return (
        cell.agg(F.sum("chi2_micro_cell").alias("chi2_micro"))
        .crossJoin(F.broadcast(dof))
        .crossJoin(F.broadcast(tot.select(F.col("nn").alias("n"))))
    )


# --- community detection: deterministic label propagation --------------------
def _lpa_oracle(iterations: int) -> str:
    """Unrolled synchronous min-tie-break LPA as plain SQL — mirrors
    operators/graph.py::label_propagation round for round (same
    symmetrized edge list, same SUM(w) score, same (score DESC, lbl ASC)
    argmax)."""
    parts = [
        """
        WITH e0 AS (
          SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
                 CAST(COUNT(*) AS DOUBLE) AS w
          FROM lineitem l
          JOIN orders o ON l.l_orderkey = o.o_orderkey
          JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN supplier s ON l.l_suppkey = s.s_suppkey
          GROUP BY 1, 2
        ),
        et AS (
          SELECT src, dst, w FROM (
            SELECT src, dst, w,
                   ROW_NUMBER() OVER (PARTITION BY src
                                      ORDER BY w DESC, dst ASC) AS rn
            FROM e0)
          WHERE rn <= 2
        ),
        eu AS (
          SELECT a, b, SUM(w) AS w FROM (
            SELECT src AS a, dst AS b, w FROM et
            UNION ALL SELECT dst AS a, src AS b, w FROM et
          ) GROUP BY a, b
        ),
        nodes AS (SELECT DISTINCT a AS node FROM eu),
        l0 AS (SELECT node, node AS lbl FROM nodes)
        """
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f"""
        , s{i} AS (
          SELECT eu.a AS node, l.lbl, SUM(eu.w) AS score
          FROM eu JOIN l{i - 1} l ON eu.b = l.node
          GROUP BY eu.a, l.lbl
        ),
        b{i} AS (
          SELECT node, lbl FROM (
            SELECT node, lbl,
                   ROW_NUMBER() OVER (PARTITION BY node
                                      ORDER BY score DESC, lbl ASC) AS rn
            FROM s{i})
          WHERE rn = 1
        ),
        l{i} AS (
          SELECT l.node, COALESCE(b{i}.lbl, l.lbl) AS lbl
          FROM l{i - 1} l LEFT JOIN b{i} ON l.node = b{i}.node
        )
        """
        )
    parts.append(
        f"""
        SELECT n.n_name, CAST(l{iterations}.lbl AS BIGINT) AS community
        FROM l{iterations} JOIN nation n ON l{iterations}.node = n.n_nationkey
        ORDER BY n_name
        """
    )
    return "".join(parts)


@register(
    "community_nation_trade",
    oracle=_lpa_oracle(3),
    survey="X24",
    doc="Deterministic weighted label propagation (Raghavan et al. 2007, "
    "synchronous, min-label tie-break, 3 rounds) over the same "
    "customer-nation -> supplier-nation trade graph PageRank ranks — "
    "centrality orders nodes, communities GROUP them (domain "
    "clustering / topic sharding in a curation stack). The dense trade "
    "graph is sparsified to each nation's top-2 out-edges by weight "
    "(deterministic tie-break) — on the complete graph LPA correctly "
    "but uselessly collapses to one community; thresholding to the "
    "strongest links is the standard preprocessing (and at 10^10 edges "
    "it is also the cost control: the per-round join fan-out is the "
    "retained degree, not the raw one). Each round is one equi-join + "
    "one keyed aggregation + one per-node argmax window; pinned ties "
    "make re-runs byte-stable, which is what lets an external engine "
    "replay it exactly.",
)
def community_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import label_propagation
    from pyspark.sql.window import Window as W

    e0 = _nation_trade_edges(spark, sf_dir).withColumn(
        "w", F.col("w").cast("double")
    )
    wtop = W.partitionBy("src").orderBy(F.desc("w"), F.asc("dst"))
    edges = (
        e0.withColumn("_rn", F.row_number().over(wtop))
        .filter(F.col("_rn") <= 2)
        .select("src", "dst", "w")
    )
    labels = label_propagation(edges, iterations=3, weight="w")
    nation = _t(spark, sf_dir, "nation")
    return (
        labels.join(F.broadcast(nation), labels["node"] == nation["n_nationkey"])
        .select("n_name", F.col("label").cast("bigint").alias("community"))
        .orderBy("n_name")
    )


# --- Holt linear-trend smoothing (level + trend state fold) ------------------
@register(
    "events_holt_linear",
    oracle="""
    WITH ev AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
             FLOOR(value * 100 + 0.5) AS cents
      FROM events
    ),
    seq AS (
      SELECT user_id, list(cents ORDER BY ts, event_id) AS xs
      FROM ev GROUP BY user_id
    ),
    st AS (
      SELECT user_id, len(xs) AS n,
             list_reduce(
               list_transform(xs, v -> [CAST(v AS DOUBLE), 0.0]),
               (acc, x) -> [
                 floor((x[1] + acc[1] + acc[2]) / 2),
                 floor((floor((x[1] + acc[1] + acc[2]) / 2) - acc[1]) / 4)
                   + floor(3 * acc[2] / 4)
               ]
             ) AS s
      FROM seq
    )
    SELECT user_id, CAST(n AS BIGINT) AS n_events,
           CAST(s[1] AS BIGINT) AS level_cents,
           CAST(s[2] AS BIGINT) AS trend_cents
    FROM st
    """,
    survey="X11,W1,X26",
    doc="Holt linear-trend smoothing (double exponential: level + trend "
    "state) folded per user over the (ts, event_id)-ordered value "
    "sequence — the trend-aware sibling of events_ema_value, i.e. the "
    "last member of the smoothing family (EMA -> Holt). alpha=1/2 and "
    "beta=1/4 are applied through FLOOR-ed halving/quartering so the "
    "whole recursion stays on the integer-cents grid: every "
    "intermediate is an exact small integer in IEEE double on BOTH "
    "engines, no rounding epsilon anywhere. The fold runs inside one "
    "groupBy (per-key sequences are session-sized, the same bounded-"
    "frame argument as rolling_median_acctbal); nothing driver-side.",
)
def events_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.floor(F.col("value") * 100 + 0.5).cast("double").alias("cents"),
    )
    seq = ev.groupBy("user_id").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(ts, event_id, cents))), "
            "s -> s.cents)"
        ).alias("xs")
    )
    fold = F.expr(
        """
        aggregate(
          transform(xs, v -> array(v, 0D)),
          CAST(NULL AS ARRAY<DOUBLE>),
          (acc, x) -> CASE WHEN acc IS NULL THEN x ELSE array(
            floor((x[0] + acc[0] + acc[1]) / 2),
            floor((floor((x[0] + acc[0] + acc[1]) / 2) - acc[0]) / 4)
              + floor(3 * acc[1] / 4)
          ) END
        )
        """
    )
    # materialize the fold into one column first: Spark's subexpression
    # elimination skips lambda-bearing expressions, so embedding the same
    # F.expr in two output columns runs the O(n) fold twice per user
    return seq.withColumn("s", fold).select(
        "user_id",
        F.size("xs").cast("bigint").alias("n_events"),
        F.element_at("s", 1).cast("bigint").alias("level_cents"),
        F.element_at("s", 2).cast("bigint").alias("trend_cents"),
    )


# --- spectral: exact cross-engine power iteration ---------------------------
PI_ITERS = 3
PI_D = 64  # embeddings fixture dimensionality
PI_Q = 1_000_000


def _pi_pass_ctes(i: int) -> str:
    """One power-iteration step as CTEs: per-row quantized projection
    ``p{i}`` (LEFT-TO-RIGHT list fold — deterministic), exact-integer
    accumulators ``w{i}``, norm ``n{i}``, next unit vector ``v{i}`` —
    every float op correctly rounded over exactly-agreed integers, so
    the chain reproduces operators/ml.py::power_iteration_top_component
    bit-for-bit (see its docstring for the argument)."""
    return f"""
    p{i} AS (
      SELECT vec_id, xq,
             CAST(FLOOR(list_sum(list_transform(list_zip(xq, v{i - 1}.v),
                        p -> CAST(p[1] AS DOUBLE) * p[2]))) AS BIGINT) AS q
      FROM base CROSS JOIN v{i - 1}
    ),
    w{i} AS (
      SELECT dims.dim,
             SUM(CAST(p{i}.q AS HUGEINT) * p{i}.xq[dims.dim + 1]) AS w
      FROM p{i} CROSS JOIN dims GROUP BY dims.dim
    ),
    n{i} AS (SELECT SQRT(CAST(SUM(w * w) AS DOUBLE)) AS nrm FROM w{i}),
    v{i} AS (
      SELECT list(CAST(w AS DOUBLE) / n{i}.nrm ORDER BY dim) AS v
      FROM w{i} CROSS JOIN n{i}
    )"""


@register(
    "embedding_top_component",
    oracle=f"""
    WITH base AS (
      SELECT vec_id,
             list_transform(embedding,
                 x -> CAST(FLOOR(CAST(x AS DOUBLE) * {PI_Q}) AS BIGINT))
               AS xq
      FROM embeddings
    ),
    dims AS (SELECT UNNEST(range({PI_D})) AS dim),
    v0 AS (
      SELECT list_prepend(CAST(1.0 AS DOUBLE),
                 list_transform(range({PI_D - 1}),
                                i -> CAST(0.0 AS DOUBLE))) AS v
    ),
    {",".join(_pi_pass_ctes(i) for i in range(1, PI_ITERS + 1))}
    SELECT dims.dim AS dim,
           CAST(FLOOR(v{PI_ITERS}.v[dims.dim + 1] * 1000000 + 0.5)
                AS BIGINT) AS comp_micro
    FROM v{PI_ITERS} CROSS JOIN dims
    """,
    survey="X12,X3",
    doc=f"Dominant eigenvector of the embedding second-moment matrix by "
    f"{PI_ITERS}-step power iteration — the spectral primitive behind "
    "PCA whitening / spectral hashing / drift monitoring — with EVERY "
    "step bit-reproducible cross-engine: the corpus is floor-quantized "
    "once, each row's projection is a deterministic left-to-right fold "
    "then floor-quantized, the d accumulators are EXACT integer sums "
    "(order-free — the cross-row float-sum trap is engineered out), "
    "and normalization uses only correctly-rounded IEEE ops on "
    "exactly-agreed integers. One scan per iteration; the driver holds "
    "d floats (the kmeans convention); oracle unrolls the identical "
    "chain as CTEs. Emits (dim, comp_micro), the unit component in "
    "integer micro-units.",
)
def embedding_top_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    from ..operators.ml import power_iteration_top_component
    from ..schemas import load_fixture

    emb = load_fixture(spark, sf_dir, "embeddings")
    comp = power_iteration_top_component(emb, n_iter=PI_ITERS, q_scale=PI_Q)
    return spark.createDataFrame(
        [(j, math.floor(c * 1_000_000 + 0.5)) for j, c in enumerate(comp)],
        "dim: bigint, comp_micro: bigint",
    )
