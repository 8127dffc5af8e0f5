"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` expose the oracle-checked catalog
(spotify_etl_pipeline_spark.queries — one entry per implemented operator
from SURVEY.md §2).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from spotify_etl_pipeline_spark.queries import catalog as _catalog  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Top-10 customers by discounted revenue: scan → join ×2 (one broadcast) →
    hash aggregate → TakeOrderedAndProject (reference README.md:234-244 shape).
    """
    from spotify_etl_pipeline_spark.queries.reference import flagship_top_revenue

    return flagship_top_revenue(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _catalog.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each oracle-checkable query."""
    return _catalog.oracle_sql()
