"""Declarative data-quality expectation suite (SURVEY.md P4/J2 extension).

The reference asserts quality operationally — row-count reconciliation,
NULL handling, referential integrity (reference README.md:49, :206-212) —
each as a separate warehouse query. This operator folds a whole constraint
suite into the minimum number of scans: every column-level expectation on a
table becomes ONE conditional aggregation over ONE scan (violations counted
with ``sum(when(...))``), and each referential check is one left-anti-join
count. Results union into a small (constraint, n_checked, n_violations,
passed) report — the shape a pipeline gate consumes.

At 100 TB this matters because the naive formulation (one query per
constraint) re-reads the fact table per rule; here k column rules cost one
pass regardless of k, the shuffle is a single ungrouped aggregate (bytes:
one row), and FK checks broadcast the dim side exactly like the validation
joins in etl/validate.py.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class ColumnRule:
    """One column-level expectation: ``predicate`` is the PASS condition
    (violations = rows where it is false or null-violating)."""

    name: str
    predicate: F.Column


def not_null(col: str) -> ColumnRule:
    return ColumnRule(f"{col}_not_null", F.col(col).isNotNull())


def unique_key(df: DataFrame, col: str) -> DataFrame:
    """(constraint, n_checked, n_violations, passed) for key uniqueness.

    Violations = rows beyond the first per key = count - distinct count —
    computed in the same single-pass aggregate, not via a groupBy-having
    (whose shuffle would carry every key; this one's carries one row).
    """
    return df.agg(
        F.count(F.lit(1)).alias("n_checked"),
        (F.count(col) - F.countDistinct(col)).alias("n_violations"),
    ).select(
        F.lit(f"{col}_unique").alias("constraint"),
        "n_checked",
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    )


def in_set(col: str, allowed: list[str]) -> ColumnRule:
    return ColumnRule(f"{col}_in_set", F.col(col).isin(*allowed))


def in_range(col: str, lo, hi) -> ColumnRule:
    return ColumnRule(f"{col}_in_range", (F.col(col) >= lo) & (F.col(col) <= hi))


def column_rules_report(df: DataFrame, rules: list[ColumnRule]) -> DataFrame:
    """All column rules in ONE scan: each rule is a conditional-sum pair in
    a single ungrouped aggregate, then the wide row unpivots to the
    per-constraint report. A null predicate result counts as a violation
    (null-hostile by default, matching warehouse CHECK semantics)."""
    aggs = [F.count(F.lit(1)).alias("n_checked")]
    for r in rules:
        aggs.append(
            F.sum(
                F.when(r.predicate.isNull() | ~r.predicate, 1).otherwise(0)
            ).alias(f"v_{r.name}")
        )
    wide = df.agg(*aggs)
    stack = ", ".join(f"'{r.name}', v_{r.name}" for r in rules)
    return wide.select(
        F.expr(
            f"stack({len(rules)}, {stack}) AS (constraint, n_violations)"
        ),
        "n_checked",
    ).select(
        "constraint",
        "n_checked",
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    )


def foreign_key_report(
    fact: DataFrame, fact_key: str, dim: DataFrame, dim_key: str, name: str
) -> DataFrame:
    """Referential-integrity expectation as a report row: violations =
    fact rows whose key resolves to no dim row (left-anti join; the dim
    side is the small/broadcast side exactly as in etl/validate.py)."""
    n_checked = fact.agg(F.count(F.lit(1)).alias("n_checked"))
    orphans = fact.join(
        dim.select(F.col(dim_key).alias(fact_key)), fact_key, "left_anti"
    ).agg(F.count(F.lit(1)).alias("n_violations"))
    return n_checked.crossJoin(orphans).select(
        F.lit(name).alias("constraint"),
        "n_checked",
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    )


def expectation_suite(reports: list[DataFrame]) -> DataFrame:
    """Union the per-source report fragments into one gate table."""
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out
