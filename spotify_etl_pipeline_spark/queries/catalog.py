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
    )


#: External correctness sweeps consume the catalog front-to-back and cap at
#: ~50 entries per round, so ordering is a verification-rotation policy, not
#: cosmetics.  Round 2: (a) every query that has never received a driver
#: row+schema+hash check — round 1 covered only the first 50 of 77, and the
#: round-2 additions are new — then (b) round-1-green queries whose plans
#: changed this round (broadcast hints dropped; MinHash switched to hashed
#: shingle ids) so the change is re-verified, then (c) the rest in
#: registration order (all hash-green in round 1 and still covered by the
#: local DuckDB-differential suite).
_SWEEP_PRIORITY: tuple[str, ...] = (
    # (a) never driver-checked: round-1 coverage gap
    "knn_brute_force",
    "knn_ivf",
    "embedding_quantize_int8",
    "knn_quantized_topk",
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
    "text_tfidf",
    "text_normalize",
    "text_pii_redact",
    "events_tumbling_hourly",
    "events_sliding_counts",
    "events_sessionize",
    "events_daily_from_hourly",
    "events_hourly_gapfill",
    "unpivot_lineitem_metrics",
    "nullsafe_join_priority_match",
    # (a) never driver-checked: new in round 2
    "embedding_lsh_neardup",
    "lsh_blocking_stats",
    "decontaminate_against_benchmark",
    "source_mixture_sample",
    "text_repetition_stats",
    "corpus_curation_decontaminated",
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
    "pack_training_sequences",
    "packing_efficiency",
    "training_shuffle",
    # knn_quantized_ivf is also never-checked but carries no oracle (rows-
    # only) — a driver row adds least over its local recall tests, so it
    # sits at the window boundary: with 49 full-oracle never-checked
    # entries plus it, section (a) is 51 names and the ~50th row is its
    # cut line. Everything below here is outside the expected window.
    "knn_quantized_ivf",
    "full_outer_click_purchase_recon",
    # never driver-checked: TPC-H final tranche (q2/q11/q12/q20 shapes) —
    # added after the round-2 window filled; head of the round-3 rotation.
    "q2_min_cost_supplier",
    "q11_important_parts",
    "q12_priority_by_returnflag",
    "q20_excess_shipment_suppliers",
    # (b) round-1 green but changed this round. None of these fit the
    # window — section (a) fills it — so their re-verification this round
    # is the local DuckDB-differential suite (identical row+schema+hash
    # check, tests/test_queries_oracle.py); they head the rotation next
    # round.
    "dedup_minhash_signatures",
    "dedup_lsh_candidates",
    "dedup_embedding_cosine",
    "flagship_top_revenue",
    "star_join_top_items",
    "q5_local_supplier_volume",
    "q8_brand_market_share",
    "multimodal_features",
    "corpus_curation",
    "pricing_summary",
    "asof_last_purchase_before_click",
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
