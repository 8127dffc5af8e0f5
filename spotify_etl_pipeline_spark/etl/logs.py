"""Operational log tables (reference S10/S11/S12: error logs
lambda_function.py:245-263, execution logs :279-290, failed payloads
:312-321) as append-only Parquet tables feeding the monitoring queries
(T4, README.md:221-226)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..schemas import PIPELINE_ERRORS_SCHEMA, PIPELINE_RUNS_SCHEMA


def _coerce(value, field: T.StructField):
    """The extractor stamps timestamps as ISO-8601 strings (wire format,
    sources/ingest.py run_log/err dicts); parse them here so its rows load
    without callers needing an undocumented conversion."""
    if isinstance(value, str) and isinstance(field.dataType, T.TimestampType):
        return datetime.fromisoformat(value)
    return value


def _append(spark: SparkSession, path: str, rows: list[dict], schema) -> None:
    data = [
        tuple(_coerce(r.get(f.name), f) for f in schema.fields) for r in rows
    ]
    spark.createDataFrame(data, schema).write.mode("append").parquet(path)


def append_run_log(spark: SparkSession, root: str, rows: list[dict]) -> None:
    _append(spark, f"{root}/_pipeline_runs", rows, PIPELINE_RUNS_SCHEMA)


def append_error_log(spark: SparkSession, root: str, rows: list[dict]) -> None:
    _append(spark, f"{root}/_pipeline_errors", rows, PIPELINE_ERRORS_SCHEMA)


def read_run_log(spark: SparkSession, root: str) -> DataFrame:
    return spark.read.schema(PIPELINE_RUNS_SCHEMA).parquet(f"{root}/_pipeline_runs")


def read_error_log(spark: SparkSession, root: str) -> DataFrame:
    return spark.read.schema(PIPELINE_ERRORS_SCHEMA).parquet(f"{root}/_pipeline_errors")


def observed(df, name: str = "metrics"):
    """Attach an in-flight metric observation to a DataFrame.

    Spark's ``Observation`` evaluates aggregate expressions DURING the
    action that consumes the DataFrame — row counts and sums come back to
    the driver with the job, no second scan (reference's CloudWatch
    per-run metrics, lambda/extraction/README.md:156-164, done
    Spark-natively). Returns ``(df, observation)``; read
    ``observation.get`` after an action runs.
    """
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    obs = Observation(name)
    return df.observe(obs, F.count(F.lit(1)).alias("n_rows")), obs
