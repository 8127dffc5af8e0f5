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
    non-SQL-expressible operators (approximate/ANN by nature —
    engine-order-dependent float folds, k-means fits, sketch cells).
    ``survey`` cites the SURVEY.md §2 inventory ids this query covers.

    ``driver`` (VERDICT r9 #5): ``False`` keeps the entry OUT of the
    driver-facing ``queries()``/``oracle_sql()`` — it can never go
    full-hash green, so letting the external sweep re-record it as a
    rows-only row every rotation burns a slot that a hash-checkable
    entry could use.  Every ``driver=False`` entry must name its
    hash-checked twin (the ``*_check`` / ``*_recall`` / pinned-dial
    entry carrying the driver evidence) in its oracle comment; it stays
    in :func:`full_catalog` so the bench, the cartesian plan sweep, and
    the unit suite keep exercising it.
    """

    name: str
    fn: QueryFn
    oracle: str | None
    survey: str
    doc: str = ""
    driver: bool = True


CATALOG: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None,
    survey: str,
    doc: str = "",
    driver: bool = True,
):
    """Decorator: add a query function to the catalog."""

    def wrap(fn: QueryFn) -> QueryFn:
        if name in CATALOG:
            raise ValueError(f"duplicate query name: {name}")
        CATALOG[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, survey=survey, doc=doc,
            driver=driver,
        )
        return fn

    return wrap


def full_catalog() -> dict[str, QuerySpec]:
    """EVERY registered entry, including ``driver=False`` production
    arms — the surface the bench and the plan/test sweeps iterate; the
    driver-facing :func:`queries`/:func:`oracle_sql` expose only the
    hash-checkable subset."""
    _load_all()
    return dict(CATALOG)


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
        opq_ops,
        endtoend,
    )


#: External correctness sweeps consume the catalog front-to-back and cap at
#: ~50 entries per round, so ordering is a verification-rotation policy, not
#: cosmetics.  Round 6 makes the rotation SELF-MAINTAINING: the head is the
#: short hand-list of entries whose semantics changed this round (they need
#: fresh evidence no matter what), and the tail is every other entry sorted
#: by the round of its most recent driver check — read directly from the
#: checked-in CORRECTNESS_r*.json files — oldest evidence first, with
#: registration order breaking ties and never-checked entries (new queries)
#: ahead of everything previously verified.  Goal state: no row's latest
#: driver check is ever more than ~2 rounds old, with no per-round editing
#: beyond this head list.
#:
#: Round 12 head — EMPTY again (VERDICT r11 #2: keep burning the
#: evidence tail).  Nothing already-verified changed SEMANTICS this
#: round: the r12 diff adds NEW surface (corpus_pii_scrub,
#: llm_corpus_end_to_end, quality_score_apply, quality_gopher_gates)
#: plus two result-preserving oracle-text changes re-verified green by
#: driver_sim at sf0.01 AND sf0.1 this round —
#: corpus_curation_quality_mix's shared mixture fragment now carries
#: doc_id through an intermediate CTE (final SELECT unchanged), and
#: logistic_quality_fit's unrolled-GD CTEs are AS MATERIALIZED (same
#: values, ~120 s → 0.03 s in DuckDB).  The four NEW entries sort
#: ahead automatically as never-checked: 4 new + 44 stale-r8 = 48
#: slots, inside the ~50-slot sweep, so CORRECTNESS_r12 leaves no
#: driver entry with evidence older than r9.
#:
#: The round-12 OPTIMIZATION pass (OPTIMIZATION_r12.md) also changed no
#: semantics: every rewrite (the substring-cut apply kernel, the packer's
#: chunk shuffle, the PQ fit update, the BPE trainer's checkpoint
#: cadence, the decode-roundtrip truth derivation) is result-identical
#: and was re-verified by FULL driver_sim sweeps at sf0.01 AND sf0.1
#: (195/195 green) on the final tree — the head stays empty.
_CHANGED_THIS_ROUND: tuple[str, ...] = ()


def _record_ok(rec: object) -> bool:
    """True when a driver record represents a PASSING check under its
    declared contract: full-hash green, or rows-only-by-contract
    (``err == "no_oracle"``, the driver's marker for entries that
    deliberately register no ``oracle_sql()``).  Anything with a real
    error or an explicit mismatch is a FAILING check."""
    if not isinstance(rec, dict):
        # pre-r2 files stored bare name lists; count as checked-good so a
        # bare checkout still orders sensibly
        return True
    if rec.get("err") not in (None, "no_oracle"):
        return False
    return not any(
        rec.get(k) is False for k in ("rows_match", "schema_match", "hash_match")
    )


def _latest_evidence() -> dict[str, int]:
    """Per-query round of the newest PASSING driver check, parsed from
    the CORRECTNESS_r{N}.json files the external sweep leaves at the
    repo root.  A query whose most recent check FAILED (err set, or any
    match flag explicitly false) ranks as never-checked (0) so the next
    sweep re-verifies it immediately instead of letting a known-red row
    sink to the tail for ~2 rounds.  Missing/unreadable files degrade to
    "never checked", so the ordering still works in a bare checkout."""
    import json
    import re
    from pathlib import Path

    good: dict[str, int] = {}
    seen: dict[str, int] = {}
    root = Path(__file__).resolve().parents[2]
    for p in root.glob("CORRECTNESS_r*.json"):
        m = re.search(r"r(\d+)", p.stem)
        if m is None:
            continue
        rnd = int(m.group(1))
        try:
            data = json.loads(p.read_text())
        except (OSError, ValueError):
            continue
        items = data.items() if isinstance(data, dict) else ((n, None) for n in data)
        for name, rec in items:
            seen[name] = max(seen.get(name, 0), rnd)
            if _record_ok(rec):
                good[name] = max(good.get(name, 0), rnd)
    return {
        n: 0 if seen[n] > good.get(n, 0) else good[n] for n in seen
    }


def _ordered() -> list[QuerySpec]:
    _load_all()
    unknown = [n for n in _CHANGED_THIS_ROUND if n not in CATALOG]
    if unknown:
        raise KeyError(f"_CHANGED_THIS_ROUND names not in catalog: {unknown}")
    nondriver = [
        n for n in _CHANGED_THIS_ROUND if not CATALOG[n].driver
    ]
    if nondriver:
        # the tail below filters to driver=True; a driver=False name in
        # the head would silently re-enter the sweep it was folded out of
        raise ValueError(
            f"_CHANGED_THIS_ROUND names are driver=False: {nondriver}"
        )
    latest = _latest_evidence()
    names = [n for n in CATALOG if CATALOG[n].driver]
    reg_pos = {n: i for i, n in enumerate(names)}
    head = [CATALOG[n] for n in _CHANGED_THIS_ROUND]
    changed = set(_CHANGED_THIS_ROUND)
    tail = sorted(
        (n for n in names if n not in changed),
        key=lambda n: (latest.get(n, 0), reg_pos[n]),
    )
    return head + [CATALOG[n] for n in tail]


def queries() -> dict[str, QueryFn]:
    return {spec.name: spec.fn for spec in _ordered()}


def oracle_sql() -> dict[str, str]:
    return {spec.name: spec.oracle for spec in _ordered() if spec.oracle is not None}
