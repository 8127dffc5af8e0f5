"""Physical-plan inspection helpers (scale hygiene).

The reference has no optimizer to inspect (SURVEY.md §4); here the plan IS
the performance contract: filters must reach the parquet scan, small dims
must broadcast, top-k must plan as TakeOrderedAndProject, and nothing may
fall back to a cartesian product by accident. tests/test_plans.py pins
those shapes so a refactor that silently loses pushdown fails CI.
"""

from .inspect import (
    executed_plan,
    final_plan,
    jobs_triggered,
    pushed_filter_lines,
    scan_lines,
)

__all__ = [
    "executed_plan",
    "final_plan",
    "jobs_triggered",
    "pushed_filter_lines",
    "scan_lines",
]
