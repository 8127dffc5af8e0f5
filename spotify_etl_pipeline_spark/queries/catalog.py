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
#: cosmetics.  Round 5 is an EVIDENCE-FRESHNESS round (VERDICT r4 item 1):
#: after round 4, 83 of 163 rows dated from rounds 1-2, BEFORE the round-3
#: widen_narrow_scan rewiring and the round-4 iterative-tier fixes.  Order:
#: (a) queries added or semantically changed THIS round (round 5: the
#: recursive-CTE row-limit gate, SemDeDup auto-C, the ngram-Jaccard
#: prefix-filter auto-crossover), then (b) every row last driver-checked in
#: round 1 — the oldest evidence in the file — then (c) round-2 rows whose
#: underlying operators were rewritten since (ANN/LSH/text map stages),
#: then (d) the remaining round-2 rows, then (e) round-3 greens, then (f)
#: the round-4 greens in registration order.  Goal state: no row's latest
#: driver check is ever more than ~2 rounds old.
_SWEEP_PRIORITY: tuple[str, ...] = (
    # (a) changed/added in round 5
    "sql_recursive_order_chain",  # cteRecursionRowLimit now input-scaled
    "dedup_semdedup_clusters",  # n_centroids="auto" sqrt-n dial added
    "dedup_semdedup_pipeline",  # same operator, composition entry
    "dedup_ngram_jaccard",  # prefix_filter="auto" corpus-count crossover
    # (b) last driver-checked in ROUND 1 (oldest evidence, refresh all 38)
    "approx_count_distinct",
    "percentile_exact",
    "percentile_approx",
    "multimodal_features",
    "multimodal_resize",
    "multimodal_frame_sample",
    "dedup_exact_distinct",
    "dedup_exact_group",
    "dedup_simhash",
    "events_zscore_anomalies",
    "histogram_totalprice",
    "largest_order_per_customer",
    "orders_priority_pivot",
    "profile_documents",
    "sample_stratified_systematic",
    "dataset_split",
    "filter_pushdown_scan",
    "null_handling",
    "semi_join_active_customers",
    "anti_join_inactive_customers",
    "latest_order_per_customer",
    "setops_nation_intersect",
    "setops_nation_except",
    "scalar_string_functions",
    "date_functions",
    "json_props_extract",
    "partial_date_parse",
    "window_rank_lag",
    "window_running_sum",
    "count_distinct_exact",
    "rollup_orders",
    "cube_lineitem",
    "grouping_sets_orders",
    "health_rowcounts",
    "freshness_latest_ship",
    "pipeline_latency_minutes",
    "order_priority_distribution",
    "pricing_summary",
    # (c) round-2 rows over operators rewritten in rounds 3-4
    # (similarity/LSH map stages, events window family)
    "knn_brute_force",
    "knn_ivf",
    "embedding_lsh_neardup",
    "lsh_blocking_stats",
    "decontaminate_against_benchmark",
    "events_tumbling_hourly",
    "events_sliding_counts",
    "events_daily_from_hourly",
    "events_hourly_gapfill",
    "text_tfidf",
    # (d) remaining round-2 rows (stable code paths), registration order
    "q4_late_shipment_priority",
    "q7_nation_volume",
    "q13_customer_distribution",
    "q18_large_volume_orders",
    "q22_idle_rich_customers",
    "window_frames",
    "window_range_frame",
    "text_token_stats",
    "text_word_frequency",
    "text_language_id",
    "text_quality_score",
    "text_bpe_token_count",
    "text_fingerprint",
    "text_normalize",
    "text_pii_redact",
    "unpivot_lineitem_metrics",
    "nullsafe_join_priority_match",
    "training_shuffle",
    "source_mixture_sample",
    "text_repetition_stats",
    "window_ntile_quartiles",
    "regexp_scalar_functions",
    "q3_shipping_priority",
    "q10_returned_items",
    "funnel_view_click_purchase",
    "cohort_weekly_retention",
    "q6_forecast_revenue",
    "q9_nation_year_profit",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q19_disjunctive_revenue",
    "q21_waiting_suppliers",
    # (e) round-3 greens, registration order
    "text_bm25_topk",
    "events_sessionize",
    "approx_count_distinct_check",
    "percentile_approx_check",
    "events_range_pair_join",
    "interval_overlap_pairs",
    "chunk_documents_overlap",
    "dedup_prefix_clusters",
    "pack_training_sequences",
    "packing_efficiency",
    "rag_bucket_index",
    "cdc_apply_snapshot",
    "events_props_variant",
    "data_quality_expectations",
    "heavy_hitters_check",
    "fuzzy_name_match",
    "snapshot_diff_orders",
    "bpe_pair_counts",
    "key_skew_profile",
    "pagerank_nation_trade",
    "text_lm_score",
    "rolling_median_acctbal",
    "salted_priority_totals",
    "event_transition_matrix",
    "mixture_reweighting",
    "events_ema_value",
    "winsorize_prices",
    "target_encode_loo",
    "bpe_merge_apply",
    "vocab_oov_rate",
    # (f) round-4 greens follow in registration order via _ordered()'s tail
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
