"""Counterfactual for SCALE.md: the PRE-r7 ``Window.partitionBy(h)``
min/max cross-doc test on the planted hot-gram tile, reproduced inline
(the operator itself no longer has this plan — it moved to the
partial-aggregating ``groupBy`` + join-back in operators/text.py).

Run next to tools/bench_hotgram.py on the same tile to compare the two
plans under the same fresh-JVM warm + min-of-2 noop-sink protocol.

Usage::  python tools/bench_hotgram_window.py [/tmp/sparkgraft_scale/hotgram]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sparkgraft_scale/hotgram"
L = 10


def main() -> None:
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from spotify_etl_pipeline_spark.session import get_spark

    spark = get_spark(
        app_name="hotgram-window-counterfactual", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SRC}/documents.parquet")

    def old_plan():
        tt = docs.select("doc_id", F.split("text", " ").alias("toks")).select(
            "doc_id", "toks", F.size("toks").alias("n_tokens")
        )
        grams = tt.filter(F.col("n_tokens") >= L).select(
            "doc_id",
            F.explode(F.expr(f"sequence(1, n_tokens - {L} + 1)")).alias("p"),
            F.expr(f"array_join(slice(toks, p, {L}), ' ')").alias("gram"),
        )
        seeds = grams.select("doc_id", "p", F.xxhash64("gram").alias("h"))
        wh = Window.partitionBy("h")
        wg = Window.partitionBy("gram")
        cand = (
            seeds.withColumn("_mn", F.min("doc_id").over(wh))
            .withColumn("_mx", F.max("doc_id").over(wh))
            .filter(F.col("_mn") != F.col("_mx"))
            .select("doc_id", "p")
        )
        dup = (
            cand.join(tt.select("doc_id", "toks"), "doc_id")
            .select(
                "doc_id",
                "p",
                F.expr(f"array_join(slice(toks, p, {L}), ' ')").alias("gram"),
            )
            .withColumn("_mn", F.min("doc_id").over(wg))
            .withColumn("_mx", F.max("doc_id").over(wg))
            .filter(F.col("_mn") != F.col("_mx"))
            .select("doc_id", "p")
        )
        wd = Window.partitionBy("doc_id").orderBy("p")
        wrun = wd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        return (
            dup.withColumn("_prev", F.lag("p").over(wd))
            .withColumn(
                "_brk",
                F.when(
                    F.col("_prev").isNull() | (F.col("p") - F.col("_prev") > L),
                    F.lit(1),
                ).otherwise(F.lit(0)),
            )
            .withColumn("_island", F.sum("_brk").over(wrun))
            .groupBy("doc_id", "_island")
            .agg(
                F.min("p").cast("long").alias("span_start"),
                (F.max("p") + L - F.min("p")).cast("long").alias("span_len"),
            )
            .select("doc_id", "span_start", "span_len")
        )

    def noop():
        old_plan().write.format("noop").mode("overwrite").save()

    noop()  # warm
    best = float("inf")
    for _ in range(2):
        spark.catalog.clearCache()
        t0 = time.time()
        noop()
        best = min(best, time.time() - t0)
    print(
        f'{{"tile": "{os.path.basename(SRC)}", "plan": "window-pre-r7", '
        f'"sec": {best:.2f}}}'
    )


if __name__ == "__main__":
    main()
