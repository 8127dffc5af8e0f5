"""Dump `.explain("formatted")` physical plans for catalog queries.

Optimization-round evidence tool (guide §1.1/§7.2): writes one
``<out_dir>/<query>_<tag>.txt`` per query so before/after plan shapes are
reviewable without running Spark.  The dump is the PRE-execution plan
(`AdaptiveSparkPlan isFinalPlan=false` under AQE) — static shape only:
Exchange count/placement, join strategies, PushedFilters/ReadSchema,
WholeStageCodegen spans, Python-eval nodes.

Usage:
    python tools/dump_plans.py <out_dir> <tag> [sf_dir] [name ...]

With no names, dumps every bench HEADLINE query.
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from spotify_etl_pipeline_spark.queries.catalog import full_catalog  # noqa: E402
from spotify_etl_pipeline_spark.session import get_spark  # noqa: E402


def formatted_plan(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def summarize(plan: str) -> str:
    """One-line shape summary prepended to each dump."""
    n_exchange = len(re.findall(r"\bExchange\b", plan))
    joins = re.findall(
        r"\b(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)\b",
        plan,
    )
    py_nodes = re.findall(
        r"\b(BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|"
        r"FlatMapGroupsInPandas)\b",
        plan,
    )
    n_codegen = len(set(re.findall(r"\*\((\d+)\)", plan)))
    from collections import Counter

    def fmt(c):
        return ",".join(f"{k}x{v}" if v > 1 else k for k, v in Counter(c).items())

    return (
        f"exchanges={n_exchange} codegen_spans={n_codegen} "
        f"joins=[{fmt(joins)}] python=[{fmt(py_nodes)}]"
    )


def main() -> None:
    out_dir = sys.argv[1]
    tag = sys.argv[2]
    sf_dir = (
        sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    )
    names = sys.argv[4:] or list(HEADLINE)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="dump_plans")
    cat = full_catalog()
    for name in names:
        if name not in cat:
            print(f"SKIP {name}: not in catalog")
            continue
        t0 = time.time()
        try:
            df = cat[name].fn(spark, sf_dir)
            plan = formatted_plan(df)
        except Exception as exc:  # noqa: BLE001
            print(f"ERR  {name}: {type(exc).__name__}: {exc}"[:200])
            continue
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(f"-- {name} ({tag}) sf_dir={sf_dir}\n")
            fh.write(f"-- {summarize(plan)}\n\n")
            fh.write(plan)
        print(f"OK   {name}: {summarize(plan)} [{time.time() - t0:.1f}s]")
    spark.stop()


if __name__ == "__main__":
    main()
