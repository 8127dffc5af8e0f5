"""Compaction cost vs store size (SCALE.md §Round-10 evidence for
streaming/compaction.py): synthesize PQ-code-shaped epoch stores at
several (rows, epochs) points, time compact_epoch_store, and record the
serve-side read time before/after (the benefit: file-listing +
tiny-file overhead collapses to one partition).

Usage: python tools/bench_compaction.py [out_dir]
Prints one JSON line per store point.
"""
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sparkgraft_compact"

spark = (
    SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]"
    )
    .appName("bench-compaction")
    .config("spark.sql.shuffle.partitions", "16")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from spotify_etl_pipeline_spark.streaming.compaction import (  # noqa: E402
    compact_epoch_store,
)


def read_secs(path: str) -> float:
    spark.catalog.refreshByPath(path)
    t0 = time.time()
    spark.read.parquet(path).drop("epoch").agg(
        F.count(F.lit(1)), F.sum(F.crc32(F.col("pq_codes").cast("string")))
    ).collect()
    return time.time() - t0


for rows, epochs in ((100_000, 20), (1_000_000, 50), (5_000_000, 200)):
    path = os.path.join(OUT, f"codes_{rows}_{epochs}")
    shutil.rmtree(path, ignore_errors=True)
    per_epoch = rows // epochs
    base = spark.range(rows).select(
        F.col("id").alias("vec_id"),
        F.pmod("id", F.lit(16)).alias("label"),
        F.array(*[
            F.pmod(F.col("id") * (i + 3), F.lit(16)) for i in range(8)
        ]).alias("pq_codes"),
    )
    for e in range(epochs):
        base.filter(
            (F.col("vec_id") >= e * per_epoch)
            & (F.col("vec_id") < (e + 1) * per_epoch)
        ).coalesce(1).write.parquet(f"{path}/epoch={e}")
    pre = read_secs(path)
    t0 = time.time()
    compact_epoch_store(spark, path)
    compact_sec = time.time() - t0
    post = read_secs(path)
    n_files_post = sum(len(fs) for _, _, fs in os.walk(path))
    print(json.dumps({
        "rows": rows, "epochs": epochs,
        "compact_sec": round(compact_sec, 2),
        "read_before_sec": round(pre, 2),
        "read_after_sec": round(post, 2),
        "files_after": n_files_post,
    }))
    shutil.rmtree(path, ignore_errors=True)

spark.stop()
