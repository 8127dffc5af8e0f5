"""Measure the substring tier on the planted hot-gram tile (SCALE.md).

Fresh JVM per invocation (the bench_scale protocol); warm + min-of-2
noop-sink runs of exact_substring_spans over the hotgram documents
parquet (one 10-token gram in 50% of docs — the Window-skew adversary
the r7 partial-agg rewrite exists for).

Usage::  python tools/bench_hotgram.py [/tmp/sparkgraft_scale/hotgram]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sparkgraft_scale/hotgram"


def main() -> None:
    from spotify_etl_pipeline_spark.operators.text import exact_substring_spans
    from spotify_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name="bench-hotgram", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SRC}/documents.parquet")

    def noop():
        exact_substring_spans(docs, min_len=10).write.format("noop").mode(
            "overwrite"
        ).save()

    noop()  # warm
    best = float("inf")
    for _ in range(2):
        spark.catalog.clearCache()
        t0 = time.time()
        noop()
        best = min(best, time.time() - t0)
    n = docs.count()
    print(json.dumps({"tile": "hotgram", "n_docs": n, "sec": round(best, 2)}))


if __name__ == "__main__":
    main()
