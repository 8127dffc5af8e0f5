"""Registry of oracle-checked queries.

Matching conventions (the driver compares row-count + column names +
order-insensitive value hash between Spark and DuckDB):

- **No timestamp-typed output columns.** Spark timestamps are session-TZ
  (pinned UTC), DuckDB's are naive; emit strings via ``date_format`` /
  ``strftime`` instead so the representations are identical.
- **Round floating aggregates in-query on both sides** (sums of doubles are
  addition-order-dependent; rounding makes both engines land on the same
  decimal).
- **Deterministic top-k**: every ORDER BY ... LIMIT carries a unique
  tie-break key.
- **Column names match exactly** between the DataFrame (``.alias``) and the
  SQL (``AS``).
- **No array-typed output columns.** The driver's pandas-based
  canonicalizer cannot hash list cells (``unhashable type: 'list'``);
  serialize arrays to a delimited string on BOTH sides
  (``array_join`` / ``array_to_string``). Integer elements round-trip
  exactly; float elements must be rounded/fixed-pointed first.
- **Pin integer oracle outputs with ``CAST(... AS BIGINT)``.** DuckDB
  ``SUM(BIGINT)`` / ``list_sum(BIGINT)`` (incl. window SUMs) return
  HUGEINT, which pandas surfaces as float64; Spark emits int64 and the
  driver hasher compares dtypes despite equal values.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    """One catalog entry.

    ``oracle`` is the DuckDB-SQL equivalent, or ``None`` for genuinely
    non-SQL-expressible operators (driver then records a rows-only check).
    ``survey`` cites the SURVEY.md §2 inventory ids this query covers.
    """

    name: str
    fn: QueryFn
    oracle: str | None
    survey: str
    doc: str = ""


CATALOG: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, survey: str, doc: str = ""):
    """Decorator: add a query function to the catalog."""

    def wrap(fn: QueryFn) -> QueryFn:
        if name in CATALOG:
            raise ValueError(f"duplicate query name: {name}")
        CATALOG[name] = QuerySpec(name=name, fn=fn, oracle=oracle, survey=survey, doc=doc)
        return fn

    return wrap


def _load_all() -> None:
    """Import every module that registers queries (import side-effect)."""
    from . import (  # noqa: F401
        similarity_queries,
        sql_surface,
        text_queries,
        window_queries,
        relational,
        corpus,
        advanced_joins,
        dedup_queries,
        multimodal_queries,
        pipeline_ops,
        reference,
        similarity_scale,
        curation_ops,
        analytics_extra,
        tpch_extra,
        quality_ops,
        stats_ops,
        substring_ops,
    )


#: External correctness sweeps consume the catalog front-to-back and cap at
#: ~50 entries per round, so ordering is a verification-rotation policy, not
#: cosmetics.  Round 4: (a) the four queries that have never received a
#: lifetime driver row (q12 carries the round-3 HUGEINT repair that was
#: fixed but never driver-verified), then (b) queries changed or added this
#: round (chi2 overflow fix, IVFADC composition, pinned-codebook PQ oracle,
#: dup-span persist), then (c) round-3 greens for re-confirmation, oldest
#: driver check first, then (d) the rest in registration order.
_SWEEP_PRIORITY: tuple[str, ...] = (
    # (a) never driver-checked (no lifetime row) — VERDICT r3 item 1
    "q12_priority_by_returnflag",
    "q20_excess_shipment_suppliers",
    "knn_quantized_ivf",
    "full_outer_click_purchase_recon",
    # (b) changed/added this round — components input now materialized
    # once (affects every resolve/cluster query) and the decontamination
    # capstone persists its fan-out frontiers
    "dedup_resolve_clusters_logstar",  # exact fixpoint + single-run input
    "dedup_resolve_clusters",
    "entity_resolution_clusters",
    "corpus_curation_decontaminated",  # corpus0/curated now persisted
    "dedup_canonical_by_quality",
    "corpus_curation",
    # (b) changed/added this round — ANN tier + overflow fixes
    "dedup_semdedup_clusters",  # new: SemDeDup cluster-scoped embedding dedup
    "bloom_decontaminate",  # new: Bloom-prefilter decontamination + FP audit
    "sql_recursive_order_chain",  # new: Spark 4 WITH RECURSIVE, verbatim twin
    "sql_lateral_topn_orders",  # new: correlated LATERAL top-n, verbatim twin
    "sql_pipe_syntax",  # new: Spark 4 |> pipe-SQL dialect, standard-SQL twin
    "community_nation_trade",  # new: deterministic LPA, unrolled-round twin
    "events_holt_linear",  # new: integer-exact Holt level+trend fold
    "market_basket_pairs",  # new: frequent-itemset support, a<b self-join
    "events_windowed_distinct_users",  # new: dedup-then-count windowed distinct
    "dedup_semdedup_pipeline",  # new: exact-collapse -> SemDeDup composition
    "lang_source_chi2",  # int64→double overflow fix on both engines
    "hll_sketch_merge_check",  # new: mergeable Datasketches HLL per-shard union
    "knn_ivfadc_topk",  # new: PQ candidates routed through IVF probing
    "knn_ivfadc_recall",  # new: hash-checked recall floor for IVFADC
    "knn_pq_pinned_topk",  # new: pinned-codebook PQ with full value oracle
    "knn_brute_force_arrow_agree",  # new: Arrow matmul kernel vs HOF exact
    "knn_brute_force_arrow",  # new: rows-only twin of the gate above
    "dup_span_coverage",  # interval union now a sweep-line lag window
    "knn_pq_topk",
    "knn_pq_recall",
    "asof_last_purchase_before_click",  # negative-tolerance guard added
    "asof_next_purchase_after_click",
    # (c) r3-green re-confirmations, priortized toward shapes sharing code
    # paths with this round's edits (ANN tier, components, stats)
    "knn_quantized_topk",
    "knn_ivf_recall",
    "knn_l2_brute_force",
    "knn_filtered_topk",
    "embedding_quantize_int8",
    "embedding_centroids",
    "lineitem_correlations",
    "ols_price_on_quantity",
    "logistic_quality_fit",
    # (c) r1/r2-green whose last driver check is oldest
    "q2_min_cost_supplier",
    "q11_important_parts",
    "dedup_minhash_signatures",
    "dedup_lsh_candidates",
    "dedup_embedding_cosine",
    "flagship_top_revenue",
    "star_join_top_items",
    "q5_local_supplier_volume",
    "q8_brand_market_share",
    "multimodal_features",
    "pricing_summary",
    "events_range_pair_join",
    "events_sessionize",
    "pack_training_sequences",
    "packing_efficiency",
    "approx_count_distinct_check",
    "percentile_approx_check",
    "chunk_documents_overlap",
    "dedup_prefix_clusters",
    "data_quality_expectations",
    "heavy_hitters_check",
    "fuzzy_name_match",
    "interval_overlap_pairs",
    "cdc_apply_snapshot",
    "events_props_variant",
    "snapshot_diff_orders",
    "bpe_pair_counts",
    "pagerank_nation_trade",
    "text_lm_score",
    "rolling_median_acctbal",
    "salted_priority_totals",
    "event_transition_matrix",
    "mixture_reweighting",
    "events_ema_value",
    "winsorize_prices",
    "target_encode_loo",
    "text_bm25_topk",
    "bpe_merge_apply",
    "vocab_oov_rate",
    "rag_bucket_index",
    "key_skew_profile",
    # (d) driver-green re-confirmations, oldest checks first (r1 sweep)
    "events_tumbling_hourly",
    "events_sliding_counts",
    "events_daily_from_hourly",
    "events_hourly_gapfill",
    "json_props_extract",
    "date_functions",
    "window_rank_lag",
    "window_running_sum",
    "latest_order_per_customer",
    "dedup_exact_distinct",
    "dedup_exact_group",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "anti_join_inactive_customers",
    "semi_join_active_customers",
    "null_handling",
    "scalar_string_functions",
    "partial_date_parse",
    "setops_nation_intersect",
    "setops_nation_except",
    "order_priority_distribution",
    "pipeline_latency_minutes",
    "freshness_latest_ship",
    "health_rowcounts",
    "grouping_sets_orders",
    "rollup_orders",
    "cube_lineitem",
    "count_distinct_exact",
    "dataset_split",
    "filter_pushdown_scan",
    "training_shuffle",
)


def _ordered() -> list[QuerySpec]:
    _load_all()
    unknown = [n for n in _SWEEP_PRIORITY if n not in CATALOG]
    if unknown:
        raise KeyError(f"_SWEEP_PRIORITY names not in catalog: {unknown}")
    head = [CATALOG[n] for n in _SWEEP_PRIORITY]
    prioritized = set(_SWEEP_PRIORITY)
    tail = [s for n, s in CATALOG.items() if n not in prioritized]
    return head + tail


def queries() -> dict[str, QueryFn]:
    return {spec.name: spec.fn for spec in _ordered()}


def oracle_sql() -> dict[str, str]:
    return {spec.name: spec.oracle for spec in _ordered() if spec.oracle is not None}
