"""Operational log tables (reference S10/S11/S12: error logs
lambda_function.py:245-263, execution logs :279-290, failed payloads
:312-321) as append-only Parquet tables feeding the monitoring queries
(T4, README.md:221-226)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..schemas import PIPELINE_ERRORS_SCHEMA, PIPELINE_RUNS_SCHEMA


def append_run_log(spark: SparkSession, root: str, rows: list[dict]) -> None:
    spark.createDataFrame(
        [tuple(r.get(f.name) for f in PIPELINE_RUNS_SCHEMA.fields) for r in rows],
        PIPELINE_RUNS_SCHEMA,
    ).write.mode("append").parquet(f"{root}/_pipeline_runs")


def append_error_log(spark: SparkSession, root: str, rows: list[dict]) -> None:
    spark.createDataFrame(
        [tuple(r.get(f.name) for f in PIPELINE_ERRORS_SCHEMA.fields) for r in rows],
        PIPELINE_ERRORS_SCHEMA,
    ).write.mode("append").parquet(f"{root}/_pipeline_errors")


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
