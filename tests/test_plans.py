"""Physical-plan regression tests — the 100 TB contract (SURVEY.md §4).

Correctness tests prove the small-SF answer; these prove the *plan* is the
one that survives a 1000-executor cluster: projection/predicate pushdown at
the scans, broadcast joins for dims, distributed top-k, and no accidental
cartesian products anywhere in the catalog.
"""

from __future__ import annotations

import pytest

from spotify_etl_pipeline_spark.plans import (
    executed_plan,
    final_plan,
    pushed_filter_lines,
    scan_lines,
)
from spotify_etl_pipeline_spark.plans.inspect import (
    codegen_stage_count,
    read_schema_fields,
)
from spotify_etl_pipeline_spark.queries.catalog import full_catalog


def queries():
    """name -> fn over the FULL catalog: the plan sweeps must keep
    covering driver=False production arms (rows-only ANN/sketch
    entries folded out of the driver-facing queries() in r10)."""
    return {n: sp.fn for n, sp in full_catalog().items()}

# Pairwise vector scoring is intentionally a non-equi join (brute-force
# baseline; IVF/LSH blocking is the scale path), and attaching a 1-row
# aggregate scalar (corpus size N in tf-idf) is a broadcast crossJoin by
# construction — everything else must never plan a cartesian/nested-loop
# join.
PAIRWISE_OK = {
    "knn_brute_force",
    "knn_ivf",
    "knn_quantized_topk",
    "knn_quantized_ivf",  # k-row centroid crossJoin for probe routing
    "knn_ivfadc_topk",  # same k-row centroid crossJoin (ivf_probe_routing)
    "knn_pq_auto_forced_ivfadc",  # same routing crossJoin, pinned reps
    "knn_ivfadc_residual_topk",  # same routing crossJoin + C-row reference attach
    "knn_opq_ivfadc_residual_topk",  # identical residual machinery, rotated input
    "knn_ivf_recall",  # embeds brute_force_topk (the recall reference)
    "knn_pq_recall",  # embeds brute_force_l2_topk (the recall reference)
    "knn_ivfadc_recall",  # embeds brute_force_l2_topk (the recall reference)
    "knn_ivfadc_incremental_topk",  # the sibling k-row routing crossJoin,
    # plus the C-row 1-probe delta-assignment crossJoin (assignment IS routing)
    "knn_ivfadc_deleted_topk",  # identical machinery + tombstone anti-join
    "knn_incremental_multiprobe_recall",  # embeds brute_force_l2_topk
    # (the recall reference) + both n_probe serving arms' routing
    "knn_l2_brute_force",  # the exact L2 baseline (PQ recall reference)
    "dedup_embedding_cosine",
}
SCALAR_ATTACH_OK = {
    "text_tfidf",
    "q22_idle_rich_customers",
    "lsh_blocking_stats",  # 1-row count × 1-row count crossJoin
    "q11_important_parts",  # 1-row (total, n_parts) HAVING threshold
    "heavy_hitters_check",  # 1-row total + 1-row freqItems sketch attach
    "data_quality_expectations",  # 1-row n_checked × 1-row orphan count
    "text_lm_score",  # 1-row LM total-count attach (broadcast)
    "dedup_canonical_by_quality",  # same LM total attach inside the capstone
    "pagerank_nation_trade",  # 1-row dangling-mass attach per iteration
    "text_bm25_topk",  # 1-row (N, avgdl) corpus-stats attach
    "bpe_merge_apply",  # 1-row argmax merge-rule attach (broadcast)
    "lang_source_chi2",  # margin-sized grid cross (|langs|×|sources|) + 1-row attaches
    "hll_sketch_merge_check",  # 1-row merged estimate × 1-row exact count
    "knn_brute_force_arrow_agree",  # 1-row hit count × 1-row exact totals
    "quality_lm_buckets",  # 1-row LM total-count attach (text_lm_score inside)
    "mixture_sample_temperature",  # 1-row sum-of-weights attach (broadcast)
    "corpus_curation_quality_mix",  # both of the above inside the capstone
    "order_priority_distribution",  # 1-row grand-total attach (r9 window rewrite)
    "mixture_reweighting",  # 1-row (total, n_sources) attach (r9 window rewrite)
}


def test_flagship_broadcasts_dims_and_takeordered(spark, sf_dir):
    df = queries()["flagship_top_revenue"](spark, sf_dir)
    plan = final_plan(df)
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "CartesianProduct" not in plan
    assert codegen_stage_count(plan) >= 2, "scan→join→agg should codegen"


def test_flagship_prunes_lineitem_scan(spark, sf_dir):
    df = queries()["flagship_top_revenue"](spark, sf_dir)
    (li_scan,) = scan_lines(executed_plan(df), "lineitem")
    fields = read_schema_fields(li_scan)
    assert set(fields) == {"l_orderkey", "l_extendedprice", "l_discount"}, fields


def test_filter_reaches_parquet_scan(spark, sf_dir):
    df = queries()["filter_pushdown_scan"](spark, sf_dir)
    pushed = pushed_filter_lines(executed_plan(df))
    assert pushed, "no PushedFilters on any scan"
    assert any("IsNotNull" in p or "GreaterThan" in p or "EqualTo" in p for p in pushed)


def test_pricing_summary_pushes_date_predicate(spark, sf_dir):
    df = queries()["pricing_summary"](spark, sf_dir)
    pushed = " ".join(pushed_filter_lines(executed_plan(df)))
    assert "l_shipdate" in pushed, pushed


def test_top_k_is_distributed_not_global_sort(spark, sf_dir):
    plan = executed_plan(queries()["text_word_frequency"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan


@pytest.mark.parametrize("name", sorted(queries()))
def test_no_accidental_cartesian(name, spark, sf_dir):
    if name in PAIRWISE_OK:
        pytest.skip("pairwise scoring join is intentional here")
    if name in SCALAR_ATTACH_OK:
        pytest.skip("1-row broadcast scalar attach is intentional here")
    plan = executed_plan(queries()[name](spark, sf_dir))
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"
    assert "BroadcastNestedLoopJoin" not in plan, f"{name} plans a nested-loop join"


@pytest.mark.parametrize(
    ("name", "allowed_hints"),
    [
        ("flagship_top_revenue", 0),  # customer scales with SF — no hint
        ("star_join_top_items", 0),  # part/supplier scale with SF — no hint
        ("q8_brand_market_share", 0),  # part scales with SF — no hint
        ("q5_local_supplier_volume", 2),  # nation(25) + region(5) only
        ("q3_shipping_priority", 0),  # customer/orders/lineitem all scale
        ("q10_returned_items", 1),  # nation(25) only
    ],
)
def test_no_broadcast_hints_on_scaling_tables(spark, sf_dir, name, allowed_hints):
    """Explicit broadcast hints are allowed ONLY on fixed-cardinality dims.

    customer/part/supplier grow linearly with scale factor; a forced hint
    bypasses autoBroadcastJoinThreshold and AQE, OOMing executors at
    warehouse SF. AQE still picks BroadcastHashJoin for them at small SF
    (asserted by test_flagship_broadcasts_dims_and_takeordered) — the point
    here is that it stays a *choice*, not a mandate.
    """
    from spotify_etl_pipeline_spark.plans.inspect import broadcast_hint_count

    df = queries()[name](spark, sf_dir)
    assert broadcast_hint_count(df) == allowed_hints


def test_partitioned_write_prunes_at_scan(spark, sf_dir, tmp_path):
    """Hive-style partition layout (the ETL's stage/date routing shape):
    a filter on the partition column must become a PartitionFilter —
    pruned BEFORE any file is read — not a post-scan filter."""
    from spotify_etl_pipeline_spark.schemas import load_fixture

    out = str(tmp_path / "events_by_type")
    ev = load_fixture(spark, sf_dir, "events")
    ev.write.partitionBy("event_type").parquet(out)
    df = spark.read.parquet(out).filter("event_type = 'click'")
    plan = executed_plan(df)
    assert "PartitionFilters: [" in plan, plan
    import re

    m = re.search(r"PartitionFilters: \[([^\]\n]*)", plan)
    assert m and "event_type" in m.group(1), plan
    # and the count only touches the one partition
    assert df.count() == ev.filter("event_type = 'click'").count()


def test_q3_q10_predicates_reach_scans(spark, sf_dir):
    """The docstring claims: Q3's two date predicates and Q10's returnflag
    predicate must appear as PushedFilters on their parquet scans."""
    pushed3 = " ".join(pushed_filter_lines(executed_plan(queries()["q3_shipping_priority"](spark, sf_dir))))
    assert "l_shipdate" in pushed3 and "o_orderdate" in pushed3, pushed3
    assert "c_mktsegment" in pushed3, pushed3
    pushed10 = " ".join(pushed_filter_lines(executed_plan(queries()["q10_returned_items"](spark, sf_dir))))
    assert "l_returnflag" in pushed10, pushed10


def test_decontamination_broadcasts_benchmark_shingles(spark, sf_dir):
    """The benchmark shingle set (bounded by nature — an eval suite) must
    be the broadcast side so the corpus posting list never shuffles before
    the per-doc aggregation of matches."""
    plan = final_plan(queries()["decontaminate_against_benchmark"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_runtime_bloom_filter_injects_on_selective_dim_join(spark, sf_dir):
    """At warehouse scale a selective dim filter should become a runtime
    Bloom filter on the fact scan (rows dropped BEFORE the shuffle). The
    production gate is a 10 GB application-side scan — correct at 100 TB,
    never reached at test SF — so this test lowers the gate and pins that
    the engine's declarative plans are ELIGIBLE: Catalyst injects
    might_contain/bloom aggregates into the fact side of a shuffle join."""
    from pyspark.sql import functions as F

    from spotify_etl_pipeline_spark.schemas import load_fixture

    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        # force a shuffle join: with a broadcast join the filter is moot
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = load_fixture(spark, sf_dir, "lineitem")
        part = load_fixture(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#2")
        df = (
            li.join(part, li.l_partkey == part.p_partkey)
            .groupBy("p_brand")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = df._jdf.queryExecution().optimizedPlan().toString().lower()
        assert "bloom" in plan or "might_contain" in plan, plan
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_persist_reuses_in_memory_scan(spark, sf_dir):
    """A persisted intermediate must serve later queries from
    InMemoryTableScan instead of recomputing its lineage — the reuse
    pattern iterative workloads (components, kmeans) depend on."""
    from spotify_etl_pipeline_spark.schemas import load_fixture

    li = load_fixture(spark, sf_dir, "lineitem").groupBy("l_returnflag").count()
    li.persist()
    try:
        li.count()  # materialize
        plan = executed_plan(li.filter("count > 0"))
        assert "InMemoryTableScan" in plan, plan
    finally:
        li.unpersist()


def test_nested_schema_pruning_reaches_scan(spark, tmp_path):
    """Selecting one subfield of a struct column must prune the parquet
    ReadSchema to just that leaf (SURVEY.md §4: the reference's manual
    nested field= projection, done by Catalyst automatically)."""
    from spotify_etl_pipeline_spark.plans.inspect import read_schema_fields

    out = str(tmp_path / "nested")
    spark.sql(
        "SELECT id, named_struct('a', id * 2, 'b', CAST(id AS STRING), "
        "'c', id % 7) AS payload FROM range(1000)"
    ).write.parquet(out)
    df = spark.read.parquet(out).select("payload.b")
    (scan,) = scan_lines(executed_plan(df))
    assert "payload:struct<b:string>" in scan.replace(" ", ""), scan


def test_events_ts_normalization_keeps_pushdown(spark, sf_dir):
    """normalize_events_ts wraps ts in a cast; predicates on OTHER columns
    and the column pruning must still reach the parquet scan (the round-2
    fixture regeneration changed the physical ts type — the normalization
    must stay a pure projection, never a pushdown barrier)."""
    from pyspark.sql import functions as F

    from spotify_etl_pipeline_spark.schemas import load_fixture

    ev = load_fixture(spark, sf_dir, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"
    q = ev.filter(F.col("event_type") == "click").select("event_id", "ts")
    plan = executed_plan(q)
    assert "PushedFilters: [IsNotNull(event_type), EqualTo(event_type,click)]" in plan, plan
    fields = read_schema_fields(plan)
    assert "props" not in fields and "value" not in fields, fields


def test_quantized_ivf_serves_index_from_cache(spark, sf_dir):
    """knn_quantized_ivf persists its int8 index and probe routing; the
    executed plan must reference InMemoryTableScan (index built once, not
    per branch)."""
    from spotify_etl_pipeline_spark.queries.similarity_scale import (
        knn_quantized_ivf,
    )

    df = knn_quantized_ivf(spark, sf_dir)
    try:
        df.count()  # materializes the persisted index + routing
        plan = executed_plan(df)
        assert "InMemoryTableScan" in plan, plan
    finally:
        spark.catalog.clearCache()


def test_analyze_table_stats_drive_cbo_estimates(spark, sf_dir, tmp_path):
    """Catalog statistics (ANALYZE TABLE ... FOR ALL COLUMNS) must flow
    into the optimizer: table-level rowCount replaces the raw-size guess,
    and with CBO on, an equality filter's row estimate uses the column's
    distinct count (15000 orders / 5 priorities → 3000). On a warehouse
    this estimate chain is what flips join sides/order before AQE sees a
    single runtime byte — stats collection is an engine surface, not a
    DBA nicety."""
    saved = spark.conf.get("spark.sql.cbo.enabled")
    spark.sql("DROP TABLE IF EXISTS _cbo_orders")
    try:
        spark.conf.set("spark.sql.cbo.enabled", "true")
        spark.read.parquet(f"{sf_dir}/orders.parquet").write.saveAsTable(
            "_cbo_orders"
        )
        spark.sql("ANALYZE TABLE _cbo_orders COMPUTE STATISTICS FOR ALL COLUMNS")
        base = spark.table("_cbo_orders")
        n = base.count()
        base_stats = base._jdf.queryExecution().optimizedPlan().stats()
        assert base_stats.rowCount().get() == n
        filtered = base.filter("o_orderpriority = '1-URGENT'")
        est = filtered._jdf.queryExecution().optimizedPlan().stats()
        # NDV(o_orderpriority) = 5 → estimate n/5, far below n
        assert est.rowCount().get() <= n // 4, est.rowCount()
        assert est.rowCount().get() > 0
    finally:
        spark.conf.set("spark.sql.cbo.enabled", saved)
        spark.sql("DROP TABLE IF EXISTS _cbo_orders")


def test_cms_topk_probe_is_broadcast(spark, sf_dir):
    """cms_topk_serving's probe joins the <= d*w-row sketch: it must be
    the broadcast side (the serving path never shuffles the candidate
    stream against it), and no sort-merge join may appear anywhere in
    the serve plan."""
    plan = final_plan(queries()["cms_topk_serving"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_eval_sample_prefilter_threshold_is_broadcast(spark, sf_dir):
    """The 100 TB arm's per-stratum threshold table (|strata| rows) must
    broadcast-join the corpus — the corpus never shuffles before the
    bounded ranking window."""
    from spotify_etl_pipeline_spark.operators.curation import (
        stratified_exact_n_sample,
    )
    from spotify_etl_pipeline_spark.schemas import load_fixture

    docs = load_fixture(spark, sf_dir, "documents")
    plan = final_plan(
        stratified_exact_n_sample(
            docs, n_per_stratum=20, prefilter=True, prefilter_margin=6
        )
    )
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_tombstone_anti_join_is_broadcast(spark, sf_dir):
    """knn_ivfadc_deleted_topk's serve-time delete must be ONE left-anti
    hash join with the tombstone ids on the build/broadcast side — the
    code stream never shuffles for the delete, and deletion must not
    introduce a sort-merge join anywhere in the serve plan."""
    plan = executed_plan(
        queries()["knn_ivfadc_deleted_topk"](spark, sf_dir)
    )
    assert "LeftAnti" in plan, plan
    anti_lines = [l for l in plan.splitlines() if "LeftAnti" in l]
    assert anti_lines and all(
        "BroadcastHashJoin" in l for l in anti_lines
    ), anti_lines
    assert "SortMergeJoin" not in plan


def test_packed_batches_windows_are_group_partitioned(spark, sf_dir):
    """packed_token_batches' placement window must be partitioned by the
    packing group (never a global unpartitioned window — that would
    funnel the corpus through one task), and the token-scale stage must
    be a partial+final aggregate keyed by the sequence id."""
    plan = executed_plan(queries()["packed_token_batches"](spark, sf_dir))
    import re

    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        # every window spec carries partition cols before the ORDER BY
        # (an unpartitioned spec starts straight at the order column)
        assert "lang" in spec or "doc_id" in spec, spec
    # the final packing aggregate is partial+final on (lang, shard, seq)
    assert "partial_collect_list" in plan, plan


def test_bpe_decode_is_shuffle_free_map_stage(spark, sf_dir, tmp_path):
    """bpe_decode_ids' 100 TB claim: decoding packed/encoded ids is a
    purely NARROW projection — the id→symbol artifact is a flat map
    literal, so applying the decoder to a stored id table must add ZERO
    exchanges, joins, or generators to the scan."""
    from pyspark.sql import functions as F

    from spotify_etl_pipeline_spark.operators.text import (
        bpe_decode_ids,
        bpe_encode_ids,
        bpe_train_merges,
    )
    from spotify_etl_pipeline_spark.schemas import load_fixture

    docs = load_fixture(spark, sf_dir, "documents").limit(200)
    merges = bpe_train_merges(docs, n_merges=4)
    store = str(tmp_path / "ids")
    bpe_encode_ids(docs, merges=merges).write.parquet(store)

    decoded = bpe_decode_ids(
        spark.read.parquet(store), merges
    ).select("doc_id", "decoded")
    plan = executed_plan(decoded)
    for op in ("Exchange", "Join", "Generate", "Window", "Aggregate"):
        assert op not in plan, (op, plan)
    assert "Scan parquet" in plan or "FileScan" in plan, plan


def test_pii_scrub_is_shuffle_free_map_stage(spark, sf_dir):
    """pii_scrub's 100 TB claim: redaction is ONE narrow projection —
    chained regexp_replace + regexp_count adds ZERO exchanges, joins,
    windows, aggregates, or generators to the corpus scan."""
    from spotify_etl_pipeline_spark.operators.pii import pii_scrub
    from spotify_etl_pipeline_spark.schemas import load_fixture

    docs = load_fixture(spark, sf_dir, "documents")
    plan = executed_plan(pii_scrub(docs, "text"))
    for op in ("Exchange", "Join", "Generate", "Window", "Aggregate"):
        assert op not in plan, (op, plan)
    assert "Scan parquet" in plan or "FileScan" in plan, plan
    # and the driver entry (augment + scrub) keeps the same shape
    from spotify_etl_pipeline_spark.queries.catalog import queries

    entry_plan = executed_plan(queries()["corpus_pii_scrub"](spark, sf_dir))
    for op in ("Exchange", "Join", "Generate", "Window", "Aggregate"):
        assert op not in entry_plan, (op, entry_plan)


def test_logistic_apply_is_shuffle_free_map_stage(spark, sf_dir):
    """logistic_apply's 100 TB claim: the fitted weights are plan
    LITERALS (the d scalars ARE the broadcast), so scoring + threshold
    adds ZERO exchanges, joins, windows, aggregates, or generators to
    the corpus scan — inference is a map-only stage."""
    from pyspark.sql import functions as F

    from spotify_etl_pipeline_spark.operators.ml import logistic_apply
    from spotify_etl_pipeline_spark.schemas import load_fixture

    docs = load_fixture(spark, sf_dir, "documents")
    feats = docs.select(
        "doc_id",
        (F.col("n_chars") / F.lit(1000.0)).alias("x1"),
        (F.length("text") / F.lit(100.0)).alias("x2"),
    )
    scored = logistic_apply(feats, ["x1", "x2"], [0.1, -0.2, 0.3])
    plan = executed_plan(scored)
    for op in ("Exchange", "Join", "Generate", "Window", "Aggregate"):
        assert op not in plan, (op, plan)
    assert "Scan parquet" in plan or "FileScan" in plan, plan


def test_gopher_gates_is_shuffle_free_map_stage(spark, sf_dir):
    """gopher_gates' 100 TB claim: the whole rule battery (five
    statistics + five gates + the conjunction) is ONE narrow
    projection — ZERO exchanges, joins, windows, aggregates, or
    generators added to the corpus scan."""
    from spotify_etl_pipeline_spark.operators.text import gopher_gates
    from spotify_etl_pipeline_spark.queries.catalog import queries
    from spotify_etl_pipeline_spark.schemas import load_fixture

    docs = load_fixture(spark, sf_dir, "documents")
    plan = executed_plan(gopher_gates(docs))
    for op in ("Exchange", "Join", "Generate", "Window", "Aggregate"):
        assert op not in plan, (op, plan)
    assert "Scan parquet" in plan or "FileScan" in plan, plan
    entry_plan = executed_plan(
        queries()["quality_gopher_gates"](spark, sf_dir)
    )
    for op in ("Exchange", "Join", "Generate", "Window", "Aggregate"):
        assert op not in entry_plan, (op, entry_plan)
