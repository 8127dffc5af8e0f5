"""Data-quality gate queries (P4/J2 extension tier): declarative
expectation suite, heavy-hitter capture check, and blocked fuzzy matching.

The reference validates operationally — per-table row counts, NULL
handling, referential integrity as separate warehouse SQL (reference
README.md:49, :206-226). These queries generalize that into the
engine-level quality toolkit a 100 TB lakehouse runs before promoting a
batch: a constraint suite costing one scan per table, a sketch-capture
check for skew monitoring, and edit-distance entity resolution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import expectations as X
from ..operators.fuzzy import (
    deletion_variants_sql,
    fuzzy_match_pairs,
)
from ..schemas import load_fixture
from .catalog import register

PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
# Manual-review threshold: orders above this are flagged, and the fixture
# contains some at every SF — the suite demonstrably counts violations,
# it doesn't just rubber-stamp clean tables.
PRICE_REVIEW_MAX = 450_000.0


@register(
    "data_quality_expectations",
    oracle=f"""
    SELECT 'o_orderkey_unique' AS check_name,
           COUNT(*) AS n_checked,
           CAST(COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) AS BIGINT)
               AS n_violations,
           COUNT(o_orderkey) = COUNT(DISTINCT o_orderkey) AS passed
    FROM orders
    UNION ALL
    SELECT 'o_custkey_not_null', COUNT(*),
           CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) = 0
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority_in_set', COUNT(*),
           CAST(SUM(CASE WHEN o_orderpriority IN
                ({", ".join(f"'{p}'" for p in PRIORITIES)})
                THEN 0 ELSE 1 END) AS BIGINT),
           SUM(CASE WHEN o_orderpriority IN
                ({", ".join(f"'{p}'" for p in PRIORITIES)})
                THEN 0 ELSE 1 END) = 0
    FROM orders
    UNION ALL
    SELECT 'o_totalprice_review_max', COUNT(*),
           CAST(SUM(CASE WHEN o_totalprice >= 0
                          AND o_totalprice <= {PRICE_REVIEW_MAX}
                     THEN 0 ELSE 1 END) AS BIGINT),
           SUM(CASE WHEN o_totalprice >= 0 AND o_totalprice <= {PRICE_REVIEW_MAX}
               THEN 0 ELSE 1 END) = 0
    FROM orders
    UNION ALL
    SELECT 'l_discount_in_range', COUNT(*),
           CAST(SUM(CASE WHEN l_discount >= 0 AND l_discount <= 1
                     THEN 0 ELSE 1 END) AS BIGINT),
           SUM(CASE WHEN l_discount >= 0 AND l_discount <= 1
               THEN 0 ELSE 1 END) = 0
    FROM lineitem
    UNION ALL
    SELECT 'l_quantity_in_range', COUNT(*),
           CAST(SUM(CASE WHEN l_quantity >= 1 AND l_quantity <= 50
                     THEN 0 ELSE 1 END) AS BIGINT),
           SUM(CASE WHEN l_quantity >= 1 AND l_quantity <= 50
               THEN 0 ELSE 1 END) = 0
    FROM lineitem
    UNION ALL
    SELECT 'lineitem_orderkey_fk', COUNT(*),
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT),
           (SELECT COUNT(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey)) = 0
    FROM lineitem
    """,
    survey="P4,J2,A1",
    doc="Declarative expectation suite as a gate table (check_name, "
    "n_checked, n_violations, passed): all column rules on a table fold "
    "into ONE conditional aggregate over ONE scan (k rules never re-read "
    "the fact table), key uniqueness is count-minus-distinct in the same "
    "pass, and the FK check is a broadcast left-anti count — the shapes "
    "that keep a 7-rule suite at 2 fact scans + 1 dim join at any scale. "
    "One deliberately tight rule (price review threshold) has real "
    "violations at every SF, proving the counting path.",
)
def data_quality_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_fixture(spark, sf_dir, "orders")
    lineitem = load_fixture(spark, sf_dir, "lineitem")
    orders_rules = X.column_rules_report(
        orders,
        [
            X.not_null("o_custkey"),
            X.in_set("o_orderpriority", PRIORITIES),
            X.ColumnRule(
                "o_totalprice_review_max",
                (F.col("o_totalprice") >= 0)
                & (F.col("o_totalprice") <= PRICE_REVIEW_MAX),
            ),
        ],
    )
    lineitem_rules = X.column_rules_report(
        lineitem,
        [
            X.in_range("l_discount", 0.0, 1.0),
            X.in_range("l_quantity", 1.0, 50.0),
        ],
    )
    report = X.expectation_suite(
        [
            X.unique_key(orders, "o_orderkey"),
            orders_rules,
            lineitem_rules,
            X.foreign_key_report(
                lineitem, "l_orderkey", orders, "o_orderkey", "lineitem_orderkey_fk"
            ),
        ]
    )
    return report.select(
        F.col("constraint").alias("check_name"),
        "n_checked",
        "n_violations",
        "passed",
    )


FREQ_SUPPORT = 0.2


@register(
    "heavy_hitters_check",
    oracle=f"""
    WITH counts AS (
      SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang
    ),
    total AS (SELECT COUNT(*) AS n FROM documents)
    SELECT lang, n_docs, TRUE AS found_by_sketch
    FROM counts, total
    WHERE n_docs > {FREQ_SUPPORT} * n
    ORDER BY lang
    """,
    survey="X6,A4",
    doc="Heavy-hitter detection with a sketch-capture verdict: exact "
    "heavy hitters (langs with frequency > 20% of the corpus) are "
    "hash-checked, and each row carries whether Spark's freqItems "
    "sketch (support=0.2; Karp et al. frequent-items, single pass, "
    "O(1/support) memory) captured it — the guarantee freqItems "
    "documents, here oracle-asserted TRUE. The sketch path is what runs "
    "at 100 TB (constant memory, one scan); the exact path is the audit.",
)
def heavy_hitters_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_fixture(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    total = docs.agg(F.count(F.lit(1)).alias("n"))
    heavy = counts.crossJoin(F.broadcast(total)).filter(
        F.col("n_docs") > FREQ_SUPPORT * F.col("n")
    )
    sketch = docs.stat.freqItems(["lang"], FREQ_SUPPORT).select(
        F.col("lang_freqItems").alias("sketch_langs")
    )
    return (
        heavy.crossJoin(F.broadcast(sketch))
        .select(
            "lang",
            "n_docs",
            F.array_contains("sketch_langs", F.col("lang")).alias(
                "found_by_sketch"
            ),
        )
        .orderBy("lang")
    )


#: Count-min geometry for cms_heavy_hitters_check: d=4 salted rows,
#: w=1024 buckets — 4096 cells total; small enough that the sketch
#: broadcasts, large enough that fixture word frequencies stay readable
#: through collisions.
CMS_D, CMS_W = 4, 1024


@register(
    "cms_heavy_hitters_check",
    oracle=f"""
    WITH words AS (
      SELECT unnest(string_split(text, ' ')) AS k FROM documents
    ),
    rows_ AS (SELECT UNNEST(range({CMS_D})) AS row),
    cells AS (
      SELECT rows_.row,
             (('0x' || substring(md5(CAST(rows_.row AS VARCHAR) || ':' || words.k),
                                 1, 15))::BIGINT) % {CMS_W} AS bucket
      FROM words CROSS JOIN rows_
    ),
    cms AS (SELECT row, bucket, COUNT(*) AS n FROM cells GROUP BY row, bucket),
    tc AS (SELECT k, COUNT(*) AS true_n FROM words GROUP BY k),
    top AS (SELECT k, true_n FROM tc ORDER BY true_n DESC, k ASC LIMIT 20),
    probes AS (
      SELECT top.k, top.true_n, rows_.row,
             (('0x' || substring(md5(CAST(rows_.row AS VARCHAR) || ':' || top.k),
                                 1, 15))::BIGINT) % {CMS_W} AS bucket
      FROM top CROSS JOIN rows_
    ),
    est AS (
      SELECT probes.k, probes.true_n, MIN(COALESCE(cms.n, 0)) AS cms_n
      FROM probes LEFT JOIN cms USING (row, bucket)
      GROUP BY probes.k, probes.true_n
    )
    SELECT k AS word, CAST(true_n AS BIGINT) AS true_n,
           CAST(cms_n AS BIGINT) AS cms_n,
           cms_n >= true_n AS over_ok
    FROM est
    """,
    survey="X6",
    doc="Count-min sketch heavy hitters (Cormode & Muthukrishnan 2005) "
    f"— the mergeable FREQUENCY sketch completing the sketch tier "
    f"(Bloom = membership, HLL = distinct, CMS = counts): d={CMS_D} "
    f"salted md5 rows x w={CMS_W} buckets, built in ONE "
    "groupBy(row, bucket) whose shuffle carries at most d*w keys after "
    "map-side partial aggregation regardless of corpus size, merged "
    "across partitions/days/streams by SUM. The entry point-queries the "
    "top-20 true-frequency words and emits (word, true_n, cms_n, "
    "over_ok): the no-undercount guarantee is oracle-asserted per row, "
    "and the sketch table itself is bit-identical in DuckDB via the "
    "shared md5-slice hash family — the estimate column is hash-checked "
    "exactly, not just bounded.",
)
def cms_heavy_hitters_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.cms import count_min_build, count_min_estimate

    docs = load_fixture(spark, sf_dir, "documents")
    words = docs.select(F.explode(F.split("text", " ")).alias("w"))
    # hash_fn="md5" pinned: this is the cross-engine AUDIT arm the DuckDB
    # oracle hash-checks (the engine default is the xxhash64 production
    # dial since r9)
    sketch = count_min_build(words, "w", d=CMS_D, w=CMS_W, hash_fn="md5")
    true_counts = words.groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("true_n")
    )
    top = true_counts.orderBy(F.desc("true_n"), F.asc("w")).limit(20)
    est = count_min_estimate(
        sketch, top.select("w"), "w", d=CMS_D, w=CMS_W, hash_fn="md5"
    )
    return top.join(est, "w").select(
        F.col("w").alias("word"),
        "true_n",
        "cms_n",
        (F.col("cms_n") >= F.col("true_n")).alias("over_ok"),
    )


#: cms_topk_serving dials: the corpus splits into CMS_EPOCHS epochs
#: (doc_id % CMS_EPOCHS — the batch twin of the stream's file batches),
#: each contributing its top-CMS_CANDS exact within-epoch keys to the
#: candidate set; CMS_TOPK keys are served from the sketch.
CMS_EPOCHS, CMS_CANDS, CMS_TOPK = 5, 10, 20


@register(
    "cms_topk_serving",
    oracle=f"""
    WITH words AS (
      SELECT doc_id % {CMS_EPOCHS} AS ep,
             unnest(string_split(text, ' ')) AS k
      FROM documents
    ),
    rows_ AS (SELECT UNNEST(range({CMS_D})) AS row),
    cells AS (
      SELECT rows_.row,
             (('0x' || substring(md5(CAST(rows_.row AS VARCHAR) || ':' || words.k),
                                 1, 15))::BIGINT) % {CMS_W} AS bucket
      FROM words CROSS JOIN rows_
    ),
    cms AS (SELECT row, bucket, COUNT(*) AS n FROM cells GROUP BY row, bucket),
    pc AS (SELECT ep, k, COUNT(*) AS n FROM words GROUP BY ep, k),
    cand AS (
      SELECT DISTINCT k
      FROM (SELECT ep, k,
                   ROW_NUMBER() OVER (PARTITION BY ep
                                      ORDER BY n DESC, k ASC) AS rn
            FROM pc)
      WHERE rn <= {CMS_CANDS}
    ),
    probes AS (
      SELECT cand.k, rows_.row,
             (('0x' || substring(md5(CAST(rows_.row AS VARCHAR) || ':' || cand.k),
                                 1, 15))::BIGINT) % {CMS_W} AS bucket
      FROM cand CROSS JOIN rows_
    ),
    est AS (
      SELECT probes.k, MIN(COALESCE(cms.n, 0)) AS cms_n
      FROM probes LEFT JOIN cms USING (row, bucket)
      GROUP BY probes.k
    )
    SELECT k AS word, CAST(cms_n AS BIGINT) AS cms_n,
           CAST(rank AS BIGINT) AS rank
    FROM (SELECT k, cms_n,
                 ROW_NUMBER() OVER (ORDER BY cms_n DESC, k ASC) AS rank
          FROM est)
    WHERE rank <= {CMS_TOPK}
    """,
    survey="X6,X8,X33",
    doc="CMS-backed heavy-hitter TOP-K SERVING (Cormode & Muthukrishnan "
    "2005 §4, the CM+candidate-set pattern): the corpus splits into "
    f"{CMS_EPOCHS} epochs (doc_id-keyed — the deterministic batch twin "
    "of the maintenance stream's file batches), each epoch contributes "
    f"its top-{CMS_CANDS} exact WITHIN-EPOCH keys to the candidate set "
    "(batch-bounded groupBy — the corpus-wide raw-key groupBy is what "
    "the sketch replaces), and the served top-20 is ranked purely by "
    "sketch estimates probed for those candidates — at serve time "
    "nothing touches the raw corpus: a <=d*w-row broadcast sketch, an "
    "|epochs|*c-row candidate probe, one bounded rank. The streaming "
    "twin (run_cms_topk_stream/serve_cms_topk) is equality-tested "
    "against this composition including a forced epoch replay.",
)
def cms_topk_serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as Wd

    from ..operators.cms import count_min_build, count_min_topk

    docs = load_fixture(spark, sf_dir, "documents")
    words = docs.select(
        (F.col("doc_id") % CMS_EPOCHS).alias("ep"),
        F.explode(F.split("text", " ")).alias("k"),
    )
    # md5 pinned — the oracle audit arm (engine default is xxhash64)
    sketch = count_min_build(words, "k", d=CMS_D, w=CMS_W, hash_fn="md5")
    rn = Wd.partitionBy("ep").orderBy(F.desc("n"), F.asc("k"))
    cand = (
        words.groupBy("ep", "k")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("rn", F.row_number().over(rn))
        .filter(F.col("rn") <= CMS_CANDS)
        .select("k")
        .distinct()
    )
    return count_min_topk(
        sketch, cand, "k", k=CMS_TOPK, d=CMS_D, w=CMS_W, hash_fn="md5"
    ).select(F.col("k").alias("word"), "cms_n", "rank")


#: cms_topk_windowed window: serve only epochs >= CMS_WIN_SINCE of the
#: CMS_EPOCHS epoch splits — the batch twin of
#: serve_cms_topk(since_epoch=CMS_WIN_SINCE), where exclusion of older
#: epochs is partition pruning on the store (plan-asserted in
#: tests/test_cms.py).
CMS_WIN_SINCE = 3


@register(
    "cms_topk_windowed",
    oracle=f"""
    WITH words AS (
      SELECT doc_id % {CMS_EPOCHS} AS ep,
             unnest(string_split(text, ' ')) AS k
      FROM documents
    ),
    rows_ AS (SELECT UNNEST(range({CMS_D})) AS row),
    cells AS (
      SELECT words.ep, rows_.row,
             (('0x' || substring(md5(CAST(rows_.row AS VARCHAR) || ':' || words.k),
                                 1, 15))::BIGINT) % {CMS_W} AS bucket
      FROM words CROSS JOIN rows_
    ),
    cms AS (SELECT row, bucket, COUNT(*) AS n FROM cells
            WHERE ep >= {CMS_WIN_SINCE} GROUP BY row, bucket),
    pc AS (SELECT ep, k, COUNT(*) AS n FROM words
           WHERE ep >= {CMS_WIN_SINCE} GROUP BY ep, k),
    cand AS (
      SELECT DISTINCT k
      FROM (SELECT ep, k,
                   ROW_NUMBER() OVER (PARTITION BY ep
                                      ORDER BY n DESC, k ASC) AS rn
            FROM pc)
      WHERE rn <= {CMS_CANDS}
    ),
    probes AS (
      SELECT cand.k, rows_.row,
             (('0x' || substring(md5(CAST(rows_.row AS VARCHAR) || ':' || cand.k),
                                 1, 15))::BIGINT) % {CMS_W} AS bucket
      FROM cand CROSS JOIN rows_
    ),
    est AS (
      SELECT probes.k, MIN(COALESCE(cms.n, 0)) AS cms_n
      FROM probes LEFT JOIN cms USING (row, bucket)
      GROUP BY probes.k
    )
    SELECT k AS word, CAST(cms_n AS BIGINT) AS cms_n,
           CAST(rank AS BIGINT) AS rank
    FROM (SELECT k, cms_n,
                 ROW_NUMBER() OVER (ORDER BY cms_n DESC, k ASC) AS rank
          FROM est)
    WHERE rank <= {CMS_TOPK}
    """,
    survey="X40,X6,X8",
    doc="SLIDING-WINDOW heavy-hitter serving (X40) — the batch twin of "
    "streaming/cms_stream.serve_cms_topk(since_epoch=): per-epoch CMS "
    f"sketches (doc_id % {CMS_EPOCHS} epochs, one independent "
    "(ep, row, bucket, n) sketch each — exactly the epoch-partitioned "
    "layout the maintenance stream persists), cell-wise SUM over ONLY "
    f"the window's epochs (ep >= {CMS_WIN_SINCE}; SUM-mergeability is "
    "what makes the window an algebra, not a rescan), candidate union "
    "restricted to the same window, probe + rank never touching the raw "
    "corpus. In the streaming store the epoch restriction is PARTITION "
    "PRUNING — excluded epochs are never read (plan-asserted, "
    "tests/test_cms.py) — and retention is compaction.retire_epochs. "
    "md5 pinned as the cross-engine audit family; the xxhash64 "
    "production dial serves identically (stream==batch equality tests "
    "cover both).",
)
def cms_topk_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as Wd

    from ..operators.cms import count_min_build, count_min_topk

    docs = load_fixture(spark, sf_dir, "documents")
    words = docs.select(
        (F.col("doc_id") % CMS_EPOCHS).alias("ep"),
        F.explode(F.split("text", " ")).alias("k"),
    )
    # one independent sketch per epoch — the store layout; serving SUMs
    # only the window's cells (older epochs would be pruned partitions)
    per_epoch = count_min_build(
        words, "k", d=CMS_D, w=CMS_W, hash_fn="md5", group_cols=("ep",)
    )
    merged = (
        per_epoch.filter(F.col("ep") >= CMS_WIN_SINCE)
        .groupBy("row", "bucket")
        .agg(F.sum("n").cast("long").alias("n"))
    )
    rn = Wd.partitionBy("ep").orderBy(F.desc("n"), F.asc("k"))
    cand = (
        words.filter(F.col("ep") >= CMS_WIN_SINCE)
        .groupBy("ep", "k")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("rn", F.row_number().over(rn))
        .filter(F.col("rn") <= CMS_CANDS)
        .select("k")
        .distinct()
    )
    return count_min_topk(
        merged, cand, "k", k=CMS_TOPK, d=CMS_D, w=CMS_W, hash_fn="md5"
    ).select(F.col("k").alias("word"), "cms_n", "rank")


FUZZY_KEY_MAX = 500  # constant-size match set at every SF


@register(
    "fuzzy_name_match",
    oracle=f"""
    WITH c AS (
      SELECT c_custkey, c_name FROM customer WHERE c_custkey < {FUZZY_KEY_MAX}
    ),
    variants AS (
      SELECT DISTINCT c_custkey AS vid, c_name AS vname, variant
      FROM (
        SELECT c_custkey, c_name,
               unnest({deletion_variants_sql("c_name")}) AS variant
        FROM c
      )
    ),
    cand AS (
      SELECT DISTINCT a.vid AS id_a, b.vid AS id_b,
             a.vname AS name_a, b.vname AS name_b
      FROM variants a JOIN variants b
        ON a.variant = b.variant AND a.vid < b.vid
    )
    SELECT id_a, id_b, name_a, name_b,
           CAST(levenshtein(name_a, name_b) AS INT) AS dist
    FROM cand
    WHERE levenshtein(name_a, name_b) <= 1
    """,
    survey="X2,J1",
    doc="Edit-distance entity resolution with FastSS deletion-1 blocking "
    "(public algorithm): candidates from an equi-join on deletion-"
    "neighborhood variants (O(n·L) rows, never the O(n²) distance "
    "matrix), exact levenshtein verify. Deterministic string arithmetic "
    "end-to-end, so the oracle rederives the identical pair set — a "
    "BLOCKED approximate-looking join that is still fully value-hash-"
    "checked. The short-string complement of the MinHash/SimHash "
    "document tier.",
)
def fuzzy_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    customers = load_fixture(spark, sf_dir, "customer").filter(
        F.col("c_custkey") < FUZZY_KEY_MAX
    )
    return fuzzy_match_pairs(
        customers, id_col="c_custkey", text_col="c_name", max_dist=1
    ).withColumn("dist", F.col("dist").cast("int"))


@register(
    "snapshot_diff_orders",
    oracle="""
    WITH old_snap AS (
      SELECT o_orderkey, o_totalprice, o_orderpriority
      FROM orders WHERE o_orderkey % 101 <> 0
    ),
    new_snap AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 89 = 0
                  THEN ROUND(o_totalprice * 1.1, 2)
                  ELSE o_totalprice END AS o_totalprice,
             o_orderpriority
      FROM orders WHERE o_orderkey % 97 <> 0
    ),
    joined AS (
      SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
             o.o_orderkey IS NOT NULL AS in_old,
             n.o_orderkey IS NOT NULL AS in_new,
             array_to_string(list_filter([
               CASE WHEN o.o_totalprice IS DISTINCT FROM n.o_totalprice
                    THEN 'o_totalprice' END,
               CASE WHEN o.o_orderpriority IS DISTINCT FROM n.o_orderpriority
                    THEN 'o_orderpriority' END
             ], x -> x IS NOT NULL), ',') AS diff_cols
      FROM old_snap o FULL OUTER JOIN new_snap n USING (o_orderkey)
    )
    SELECT o_orderkey,
           CASE WHEN NOT in_old THEN 'added'
                WHEN NOT in_new THEN 'removed'
                ELSE 'changed' END AS change_type,
           CASE WHEN in_old AND in_new THEN diff_cols ELSE '' END
               AS changed_cols
    FROM joined
    WHERE NOT in_old OR NOT in_new OR diff_cols <> ''
    """,
    survey="J1,J3,P4",
    doc="Snapshot reconciliation (operators/diff.py): keyed diff of two "
    "table versions — added/removed keys and changed rows with the "
    "changed column names — via ONE full-outer join on the key and "
    "null-safe struct comparison; output is O(delta). The "
    "migration/backfill audit tool to run before a gold-table pointer "
    "flip. Snapshots here derive deterministically from orders (drop "
    "key%101 from old, key%97 from new, bump price on key%89), so the "
    "classification is fully oracle-checked.",
)
def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.diff import snapshot_diff

    orders = load_fixture(spark, sf_dir, "orders")
    old = orders.filter(F.col("o_orderkey") % 101 != 0).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    new = orders.filter(F.col("o_orderkey") % 97 != 0).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 89 == 0, F.round(F.col("o_totalprice") * 1.1, 2)
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
        "o_orderpriority",
    )
    return snapshot_diff(
        old, new, "o_orderkey", ["o_totalprice", "o_orderpriority"]
    )


@register(
    "entity_resolution_clusters",
    oracle=f"""
    WITH RECURSIVE c AS (
      SELECT c_custkey, c_name FROM customer WHERE c_custkey < {FUZZY_KEY_MAX}
    ),
    variants AS (
      SELECT DISTINCT c_custkey AS vid, c_name AS vname, variant
      FROM (
        SELECT c_custkey, c_name,
               unnest({deletion_variants_sql("c_name")}) AS variant
        FROM c
      )
    ),
    pairs AS (
      SELECT DISTINCT a.vid AS id_a, b.vid AS id_b
      FROM variants a JOIN variants b
        ON a.variant = b.variant AND a.vid < b.vid
      WHERE levenshtein(a.vname, b.vname) <= 1
    ),
    edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    reach(node, lbl) AS (
      SELECT a, a FROM (SELECT DISTINCT a FROM edges)
      UNION
      SELECT e.b, r.lbl FROM reach r JOIN edges e ON e.a = r.node
    ),
    comp AS (SELECT node, MIN(lbl) AS component FROM reach GROUP BY node)
    SELECT c.c_custkey,
           COALESCE(comp.component, c.c_custkey) AS cluster_id,
           c.c_custkey = COALESCE(comp.component, c.c_custkey) AS is_survivor
    FROM c LEFT JOIN comp ON c.c_custkey = comp.node
    """,
    survey="X1,X2,J2",
    doc="Entity-resolution capstone: FastSS-blocked fuzzy pairs -> "
    "connected components (iterative min-label propagation) -> cluster id "
    "+ canonical-record flag for every customer. The same "
    "pairs->components->survivors chain as document dedup, running on "
    "edit-distance edges; oracle recomputes blocking, verification, AND "
    "the component fixpoint (recursive CTE) in one statement.",
)
def entity_resolution_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.components import resolve_duplicates

    customers = load_fixture(spark, sf_dir, "customer").filter(
        F.col("c_custkey") < FUZZY_KEY_MAX
    )
    pairs = fuzzy_match_pairs(
        customers, id_col="c_custkey", text_col="c_name", max_dist=1
    )
    return resolve_duplicates(
        customers.select("c_custkey"),
        pairs.select(
            F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b")
        ),
        id_col="c_custkey",
    )


@register(
    "bpe_pair_counts",
    oracle="""
    WITH words AS (
      SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ),
    wc AS (SELECT w, COUNT(*) AS n FROM words WHERE length(w) >= 2 GROUP BY w),
    pairs AS (
      SELECT unnest(list_transform(range(1, length(w)),
                    i -> substr(w, i, 1) || '|' || substr(w, i + 1, 1))) AS pair,
             n
      FROM wc
    ),
    counts AS (SELECT pair, CAST(SUM(n) AS BIGINT) AS n_pairs
               FROM pairs GROUP BY pair),
    ranked AS (
      SELECT pair, n_pairs,
             ROW_NUMBER() OVER (ORDER BY n_pairs DESC, pair ASC) AS rnk
      FROM counts
    )
    SELECT pair, n_pairs, rnk FROM ranked WHERE rnk <= 20
    """,
    survey="X4",
    doc="BPE tokenizer-training inner loop at corpus scale: adjacent "
    "character-pair frequencies within words, weighted by word frequency "
    "— the statistic each merge round of byte-pair encoding maximizes "
    "(Sennrich et al. 2016, public algorithm). Shuffles carry (word, "
    "count) then (pair, count) — vocabulary-sized, never corpus-sized; "
    "the word pre-aggregation is what keeps the explode off the raw "
    "token stream. Top-20 with deterministic tie-break.",
)
def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_fixture(spark, sf_dir, "documents")
    wc = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    pair_expr = F.expr(
        "transform(sequence(1, length(w) - 1), "
        "i -> concat(substr(w, i, 1), '|', substr(w, i + 1, 1)))"
    )
    counts = (
        wc.select(F.explode(pair_expr).alias("pair"), "n")
        .groupBy("pair")
        .agg(F.sum("n").alias("n_pairs"))
    )
    from pyspark.sql.window import Window

    w = Window.orderBy(F.desc("n_pairs"), F.asc("pair"))
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 20)
        .select("pair", "n_pairs", "rnk")
    )


@register(
    "key_skew_profile",
    oracle="""
    WITH k AS (
      SELECT o_custkey AS key, CAST(COUNT(*) AS BIGINT) AS n
      FROM orders GROUP BY o_custkey
    ),
    s AS (
      SELECT CAST(SUM(n) AS BIGINT) AS total,
             CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(MAX(n) AS BIGINT) AS max_key_rows
      FROM k
    )
    SELECT total, n_keys, max_key_rows,
           CAST((max_key_rows * 1000000) // total AS BIGINT) AS top_share_ppm,
           CAST((total + n_keys - 1) // n_keys AS BIGINT) AS mean_key_rows
    FROM s
    """,
    survey="A4,X6",
    doc="Shuffle-key skew profile for orders.o_custkey — the observability "
    "row a 100 TB job reads BEFORE choosing salting/AQE-skew settings: "
    "total rows, distinct keys, the heaviest key's row count, and its "
    "share in integer ppm. One keyed aggregate + one 1-row rollup; "
    "the statistic that decides whether salted_priority_totals' "
    "two-stage shape is worth its extra shuffle.",
)
def key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_fixture(spark, sf_dir, "orders")
    k = orders.groupBy(F.col("o_custkey").alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return k.agg(
        F.sum("n").alias("total"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("n").alias("max_key_rows"),
    ).select(
        "total",
        "n_keys",
        "max_key_rows",
        F.expr("(max_key_rows * 1000000) div total").alias("top_share_ppm"),
        F.expr("(total + n_keys - 1) div n_keys").alias("mean_key_rows"),
    )


@register(
    "source_overlap_matrix",
    oracle="""
    WITH sh AS (
      SELECT DISTINCT source, shingle FROM (
        SELECT source, unnest(
          list_transform(range(greatest(len(string_split(text,' ')) - 4, 0)),
            i -> string_split(text,' ')[i+1] || '_' ||
                 string_split(text,' ')[i+2] || '_' ||
                 string_split(text,' ')[i+3] || '_' ||
                 string_split(text,' ')[i+4] || '_' ||
                 string_split(text,' ')[i+5])
        ) AS shingle
        FROM documents
      )
    )
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.source < b.source
    GROUP BY a.source, b.source
    """,
    survey="X2,X4",
    doc="Cross-source duplication AUDIT — the pairwise 5-gram overlap "
    "matrix mixture design consumes (how much does web-crawl A repeat "
    "web-crawl B before you weight them?): distinct (source, shingle) "
    "postings self-joined ON THE SHINGLE with source_a < source_b, "
    "counted per pair. Scale shape: the only corpus-sized stage is the "
    "distinct (source, shingle) aggregation (map-side combining, keyed "
    "shuffle); the self-join fans out at most C(|sources|,2) pairs PER "
    "SHINGLE — bounded by the source count squared, independent of "
    "corpus size — so there is no all-pairs-of-documents stage "
    "anywhere. At extreme shingle skew the X2 stop-shingle cut "
    "(max_shingle_df) composes in front unchanged.",
)
def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_fixture(spark, sf_dir, "documents")
    sh = (
        docs.select(
            "source",
            F.expr(
                # CASE guard: Spark sequence(1, 0) is descending, not
                # empty (see text_ngram_diversity)
                "element_at(transform(array(split(text, ' ')), ts -> "
                "CASE WHEN size(ts) >= 5 THEN "
                "transform(sequence(1, size(ts) - 4), "
                "i -> concat_ws('_', slice(ts, i, 5))) "
                "ELSE array() END), 1)"
            ).alias("grams"),
        )
        .select("source", F.explode("grams").alias("shingle"))
        .distinct()
    )
    a = sh.alias("a")
    b = sh.alias("b")
    return (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )


def _overlap_sketch_oracle() -> str:
    """Exact matrix CTE (verbatim source_overlap_matrix) + the sampled
    twin under the shared md5-slice threshold, LEFT-joined with the
    same 6·sqrt tolerance band the Spark side emits — estimates AND
    booleans are both value-hash-checked (the sample is a pure content
    function, so 'sketched' does not mean 'non-reproducible')."""
    gram = (
        "list_transform(range(greatest(len(string_split(text,' ')) - 4, 0)),"
        " i -> string_split(text,' ')[i+1] || '_' ||"
        " string_split(text,' ')[i+2] || '_' ||"
        " string_split(text,' ')[i+3] || '_' ||"
        " string_split(text,' ')[i+4] || '_' ||"
        " string_split(text,' ')[i+5])"
    )
    sid = "(('0x' || substring(md5(shingle), 1, 15))::BIGINT % 2147483647)"
    return f"""
    WITH sh AS (
      SELECT DISTINCT source, shingle FROM (
        SELECT source, unnest({gram}) AS shingle FROM documents
      )
    ),
    ex AS (
      SELECT a.source AS source_a, b.source AS source_b,
             CAST(COUNT(*) AS BIGINT) AS n_shared
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.source < b.source
      GROUP BY a.source, b.source
    ),
    samp AS (SELECT source, shingle FROM sh WHERE {sid} % 4 = 0),
    se AS (
      SELECT a.source AS source_a, b.source AS source_b,
             CAST(COUNT(*) * 4 AS BIGINT) AS n_shared_est
      FROM samp a JOIN samp b
        ON a.shingle = b.shingle AND a.source < b.source
      GROUP BY a.source, b.source
    )
    SELECT ex.source_a, ex.source_b, ex.n_shared,
           CAST(COALESCE(se.n_shared_est, 0) AS BIGINT) AS n_shared_est,
           ABS(COALESCE(se.n_shared_est, 0) - ex.n_shared)
             <= GREATEST(16.0, 6.0 * sqrt(ex.n_shared)) AS within_tol
    FROM ex LEFT JOIN se USING (source_a, source_b)
    """


@register(
    "source_overlap_sketched",
    oracle=_overlap_sketch_oracle(),
    survey="X2,X4,X6,X37",
    doc="SKETCHED cross-source duplication audit — the 100 TB arm of "
    "source_overlap_matrix: per-source mergeable posting sketches via a "
    "fixed-threshold content-hash sample (theta/KMV family, theta=1/4 "
    "here, 1/64..1/256 at 100 TB), so the build's one shuffle carries "
    "theta x the posting mass and the serve join is |sources|^2-bounded "
    "over sampled postings only. The same shingle samples identically "
    "in every source (pure content hash), so intersections subsample "
    "coherently — estimator rate_denom*|sampled overlap| is unbiased "
    "with sigma ~ sqrt(rate_denom*shared) — and the whole estimate is "
    "bit-reproducible in DuckDB: n_shared, n_shared_est AND the 6*sqrt "
    "tolerance boolean are all value-hash-checked (the boolean held "
    "with measured max 4.8*sqrt across sf0.001/0.01/0.1).",
)
def source_overlap_sketched(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import shingle_sid

    docs = load_fixture(spark, sf_dir, "documents")
    # r13 (guide §5): the AUDIT composition reads the distinct
    # (source, shingle) postings twice — the exact arm in full and the
    # theta-sampled twin through the content-hash filter (filter on a
    # pure shingle function commutes with the distinct, so
    # filter(distinct(explode)) == the sampled arm's
    # distinct(filter(explode))).  Materialize the postings ONCE and
    # derive both arms from them: one shingle explode + distinct pass
    # instead of two.  Standalone source_overlap_matrix /
    # source_overlap_sampled keep their single-arm shapes — at 100 TB
    # the sampled operator's filter-inside-the-scan is the point; only
    # the audit pair, which must pay the exact arm anyway, shares.
    sh = (
        docs.select(
            "source",
            F.expr(
                "element_at(transform(array(split(text, ' ')), ts -> "
                "CASE WHEN size(ts) >= 5 THEN "
                "transform(sequence(1, size(ts) - 4), "
                "i -> concat_ws('_', slice(ts, i, 5))) "
                "ELSE array() END), 1)"
            ).alias("grams"),
        )
        .select("source", F.explode("grams").alias("shingle"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def _pairs(postings: DataFrame, out: str, scale: int) -> DataFrame:
        a, b = postings.alias("a"), postings.alias("b")
        return (
            a.join(
                b,
                (F.col("a.shingle") == F.col("b.shingle"))
                & (F.col("a.source") < F.col("b.source")),
            )
            .groupBy(
                F.col("a.source").alias("source_a"),
                F.col("b.source").alias("source_b"),
            )
            .agg((F.count(F.lit(1)) * scale).cast("long").alias(out))
        )

    exact = _pairs(sh, "n_shared", 1)
    # md5 pinned — the oracle audit arm (engine default is xxhash64)
    est = _pairs(
        sh.filter(shingle_sid("shingle") % 4 == 0), "n_shared_est", 4
    )
    return exact.join(est, ["source_a", "source_b"], "left").select(
        "source_a",
        "source_b",
        "n_shared",
        F.coalesce("n_shared_est", F.lit(0)).cast("long").alias("n_shared_est"),
        (
            F.abs(F.coalesce("n_shared_est", F.lit(0)) - F.col("n_shared"))
            <= F.greatest(F.lit(16.0), 6.0 * F.sqrt("n_shared"))
        ).alias("within_tol"),
    )
