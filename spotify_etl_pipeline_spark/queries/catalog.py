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
    """Import every module that registers queries (import side-effect).

    Import order IS registration order (``CATALOG`` is insertion-ordered),
    and external correctness sweeps consume the catalog front-to-back — so
    modules whose queries most need an independent row+schema+hash check go
    first.  Round 2 rotation: similarity / sql_surface / text / window
    queries (plus ``relational``'s two tail entries) had only local-oracle
    coverage in round 1, so they lead; the round-1-verified modules follow.
    """
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
    )


def queries() -> dict[str, QueryFn]:
    _load_all()
    return {name: spec.fn for name, spec in CATALOG.items()}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {name: spec.oracle for name, spec in CATALOG.items() if spec.oracle is not None}
