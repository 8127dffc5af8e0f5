"""Local mirror of the driver's correctness sweep.

Runs the first N catalog queries in sweep-priority order at a given SF dir
(default sf0.01 — the driver's scale), comparing Spark vs DuckDB with the
same canonicalization the driver uses (tests/oracle_compare.py). Emits one
line per query and a nonzero exit if anything is red.

Usage: python scripts/sweep_check.py [N] [SF_DIR]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from spotify_etl_pipeline_spark.queries import catalog  # noqa: E402
from spotify_etl_pipeline_spark.schemas import FIXTURE_TABLES  # noqa: E402
from spotify_etl_pipeline_spark.session import get_spark  # noqa: E402
from tests.oracle_compare import compare_results, frame_problems  # noqa: E402


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    spark = get_spark(app_name="sweep_check")
    duck = duckdb.connect()
    for t in FIXTURE_TABLES:
        duck.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    specs = catalog._ordered()[:n]
    failures = 0
    for spec in specs:
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir)
            spark_pdf = sdf.toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"RED  {spec.name}: spark error: {exc}")
            failures += 1
            continue
        if spec.oracle is None:
            print(
                f"rows {spec.name}: {len(spark_pdf)} rows "
                f"({time.time() - t0:.1f}s, no oracle)"
            )
            continue
        try:
            duck_pdf = duck.execute(spec.oracle).fetchdf()
        except Exception as exc:  # noqa: BLE001
            print(f"RED  {spec.name}: oracle error: {exc}")
            failures += 1
            continue
        problems = compare_results(
            list(spark_pdf.columns),
            [tuple(r) for r in spark_pdf.itertuples(index=False, name=None)],
            list(duck_pdf.columns),
            [tuple(r) for r in duck_pdf.itertuples(index=False, name=None)],
        )
        problems += frame_problems(spark_pdf, duck_pdf)
        if problems:
            print(f"RED  {spec.name}: {problems[:3]}")
            failures += 1
        else:
            print(
                f"OK   {spec.name}: {len(spark_pdf)} rows "
                f"({time.time() - t0:.1f}s)"
            )
    print(f"\n{len(specs) - failures}/{len(specs)} green")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
