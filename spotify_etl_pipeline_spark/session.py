"""SparkSession builder with scale-aware defaults.

The reference runs single-process Python in a 512 MB Lambda
(lambda/extraction/README.md:113-115); our engine targets a multi-executor
cluster reading ~100 TB, tested on local[N]. The defaults below are the ones
that matter at both scales:

- AQE on (runtime shuffle-partition coalescing, skew-join splitting, dynamic
  broadcast selection) — lets one config serve sf0.001 through 100 TB.
- ``spark.sql.shuffle.partitions`` sized to local cores here; on a real
  cluster AQE's coalescing makes the initial number mostly irrelevant as long
  as it is high enough (set ~2-3× total cores there).
- Session timezone pinned to UTC so timestamp semantics match the DuckDB
  oracle and are cluster-location-independent.
- Arrow enabled for any pandas interchange (vectorized UDF path).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "spotify_etl_pipeline_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``SPARK_GRAFT_CPUS`` (driver contract) controls local parallelism;
    defaults to all cores.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        n = (os.cpu_count() or 8) if cpus in ("*", "") else int(cpus)
        shuffle_partitions = max(int(n), 8)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.optimizer.nestedSchemaPruning.enabled", "true")
        # events.parquet carries TIMESTAMP(NANOS); declared once here (not
        # flipped inside reader helpers) so every parquet read in the
        # session interprets nanos columns the same way.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
        # Broadcast thresholds are split by evidence quality. The STATIC
        # planner only has size ESTIMATES (file size × projection ratio),
        # which underestimate the built HashedRelation by several × — at an
        # sf10 tiling it happily broadcast a 15M-row orders projection and
        # flagship ran 2.6× slower than the shuffle plan. So the static
        # threshold stays conservative (16 MB). AQE re-plans joins at stage
        # boundaries from MEASURED shuffle sizes, so its threshold is the
        # generous one (64 MB): small-at-runtime sides still broadcast,
        # growing tables demote to sort-merge without any per-query hints.
        .config("spark.sql.autoBroadcastJoinThreshold", str(16 * 1024 * 1024))
        .config(
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
            str(64 * 1024 * 1024),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
