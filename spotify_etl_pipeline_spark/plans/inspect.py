"""Stringly plan inspection over Spark's physical plans.

Spark exposes the executed plan as a formatted string; these helpers parse
just enough of it to assert the properties that matter at 100 TB:

- ``PushedFilters: [...]`` on a ``FileScan`` line — predicate reached the
  parquet reader (row-group skipping);
- ``ReadSchema`` column lists — projection pruning reached the scan;
- join strategy tokens (``BroadcastHashJoin``, ``SortMergeJoin``,
  ``CartesianProduct``, ``BroadcastNestedLoopJoin``);
- ``TakeOrderedAndProject`` — distributed top-k instead of a global sort.

With AQE enabled the pre-execution plan is a placeholder
(``AdaptiveSparkPlan isFinalPlan=false``); runtime join demotions and
coalescing only appear after an action, so :func:`final_plan` runs one.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """Physical plan string WITHOUT running the query (AQE: initial plan).

    Sufficient for static properties: scan pushdown, read schemas, and
    statically-planned join strategies.
    """
    return df._jdf.queryExecution().executedPlan().toString()


def final_plan(df: DataFrame) -> str:
    """Physical plan string AFTER execution — AQE's final plan, including
    runtime broadcast promotions and skew-join splits."""
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def scan_lines(plan: str, table: str | None = None) -> list[str]:
    """All ``FileScan`` lines, optionally only those reading ``table``."""
    lines = [ln.strip() for ln in plan.splitlines() if "FileScan" in ln]
    if table is not None:
        lines = [ln for ln in lines if f"{table}.parquet" in ln or f"/{table}" in ln]
    return lines


def pushed_filter_lines(plan: str) -> list[str]:
    """The non-empty PushedFilters clauses, one per scan that has any.

    Plan toString truncates long clauses ("[IsNotNull(x), GreaterThan(l...")
    so the capture stops at a closing bracket OR end of line.
    """
    out = []
    for m in re.finditer(r"PushedFilters: \[([^\]\n]*)", plan):
        if m.group(1).strip():
            out.append(m.group(1).strip())
    return out


def codegen_stage_count(plan: str) -> int:
    """Number of distinct whole-stage-codegen stages (rendered as ``*(N)``
    operator prefixes in the plan string)."""
    return len(set(re.findall(r"\*\((\d+)\)", plan)))


def broadcast_hint_count(df: DataFrame) -> int:
    """Number of explicit broadcast HINTS in the analyzed logical plan.

    Counts ``ResolvedHint`` nodes (what ``F.broadcast(df)`` / ``/*+
    BROADCAST */`` become) — NOT runtime broadcast joins. A hint forces the
    strategy regardless of size, so queries over tables that grow with
    scale factor must show 0 here and leave the choice to
    autoBroadcastJoinThreshold + AQE; only fixed-cardinality dims
    (nation=25, region=5 rows) may carry one.
    """
    return df._jdf.queryExecution().analyzed().toString().count("ResolvedHint")


def read_schema_fields(scan_line: str) -> list[str]:
    """Column names out of a scan line's ``ReadSchema: struct<...>`` clause."""
    m = re.search(r"ReadSchema: struct<([^>]*)>", scan_line)
    if not m:
        return []
    return [f.split(":")[0].strip() for f in m.group(1).split(",") if f.strip()]


def jobs_triggered(spark, thunk):
    """Count the Spark jobs a callable fires — the eager-work probe.

    Declarative plan construction should fire ZERO jobs; operators with
    sanctioned bounded actions (auto dials sizing from a count, iterative
    fixpoint probes) fire a known small number, and callers that supply
    sizes from stored index metadata must fire none.  Implemented with a
    throwaway job group: every job submitted while the thunk runs lands in
    the group, and the status tracker reports the group's job ids.

    Returns ``(n_jobs, thunk_result)``.
    """
    import uuid

    sc = spark.sparkContext
    group = f"job-probe-{uuid.uuid4().hex[:8]}"
    # save the caller's thread-local job labels: setJobGroup overwrites
    # group id, description, AND interrupt-on-cancel, so all three must
    # be restored or later jobs on this thread run mislabeled under the
    # probe's description (and with its cancel policy).
    prior = {
        k: sc.getLocalProperty(k)
        for k in (
            "spark.jobGroup.id",
            "spark.job.description",
            "spark.job.interruptOnCancel",
        )
    }
    sc.setJobGroup(group, "jobs_triggered probe")
    try:
        result = thunk()
    finally:
        for k, v in prior.items():
            sc.setLocalProperty(k, v)
    return len(sc.statusTracker().getJobIdsForGroup(group)), result
