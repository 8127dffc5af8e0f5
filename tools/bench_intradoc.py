"""Intra-doc repetition tier at PRODUCTION extent (SCALE.md §Round-8).

Generates (once) a planted within-doc tile — N docs of B(60) F(30)
B(60) layout for half the docs (a 60-token block repeated inside the
doc; tokens are doc-unique so every duplicated window is strictly
intra-doc), B(60) F(30) for the control half — then measures
``intradoc_cut_corpus`` at L=50 (Lee et al.'s production span extent;
the catalog entry runs L=4 only because the driver fixture
self-repeats nowhere longer).  Warm + min-of-2 noop-sink, fresh JVM
per invocation (the bench_scale protocol), with a planted-extent spot
check (every planted doc must cut exactly 60 tokens).

Usage::  python tools/bench_intradoc.py [n_docs] [/tmp/sparkgraft_scale/intradoc]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sparkgraft_scale/intradoc"
L = 50


def main() -> None:
    from pyspark.sql import functions as F

    from spotify_etl_pipeline_spark.operators.text import intradoc_cut_corpus
    from spotify_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name="bench-intradoc", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    path = f"{OUT}/documents_{N_DOCS}.parquet"
    if not os.path.exists(path):
        block = (
            "concat_ws(' ', transform(sequence(0, 59), "
            "i -> concat('b', id, 'x', i)))"
        )
        filler = (
            "concat_ws(' ', transform(sequence(0, 29), "
            "j -> concat('f', id, 'w', j)))"
        )
        spark.range(N_DOCS).select(
            F.col("id").alias("doc_id"),
            F.expr(
                f"CASE WHEN id % 2 = 0 THEN concat({block}, ' ', {filler}, "
                f"' ', {block}) ELSE concat({block}, ' ', {filler}) END"
            ).alias("text"),
        ).write.mode("overwrite").parquet(path)
    docs = spark.read.parquet(path)

    def noop():
        intradoc_cut_corpus(docs, min_len=L).write.format("noop").mode(
            "overwrite"
        ).save()

    noop()  # warm
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        noop()
        best = min(best, time.time() - t0)
    # planted-extent spot check: every even doc cuts exactly 60 tokens
    chk = (
        intradoc_cut_corpus(docs, min_len=L)
        .groupBy((F.col("doc_id") % 2).alias("planted"))
        .agg(
            F.countDistinct("n_cut").alias("distinct_cuts"),
            F.max("n_cut").alias("max_cut"),
            F.min("n_cut").alias("min_cut"),
        )
        .orderBy("planted")
        .collect()
    )
    ok = (
        chk[0]["planted"] == 0
        and chk[0]["min_cut"] == chk[0]["max_cut"] == 60
        and chk[1]["min_cut"] == chk[1]["max_cut"] == 0
    )
    print(
        json.dumps(
            {
                "metric": "intradoc_cut_production_L",
                "n_docs": N_DOCS,
                "L": L,
                "sec": round(best, 2),
                "planted_extents_exact": ok,
            }
        )
    )


if __name__ == "__main__":
    main()
