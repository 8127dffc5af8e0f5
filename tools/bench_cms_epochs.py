"""Windowed CMS serving under MANY epochs (SCALE.md §Round-11 evidence,
VERDICT r10 #8): the X40 claim is that all-history serving grows with
d·w·epochs while a since_epoch window stays constant, with pre-window
epochs excluded by partition pruning and reclaimed by retire_epochs.
The r10 tile measured 3 epochs — too few for the growth to show; this
bench builds 50- and 200-epoch stores over the sf10 documents tile
(500 K docs) and records all-history vs window serve cost plus the
retire_epochs maintenance cost.

The epoch partitions are written directly in the store's layout (one
``epoch=N`` dir per doc_id%E slice, sketch + per-epoch top-c candidate
lists, production xxhash64 family, via one partitionBy write per
artifact) — identical bytes to what run_cms_topk_stream leaves behind;
driving 200 availableNow triggers would measure the stream scheduler,
not serving.  Serve times are warm min-of-2 (the repo's protocol).

Usage: python tools/bench_cms_epochs.py [docs_parquet_dir] [out_dir]
Prints one JSON line per epoch-count point.
"""
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SRC = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sparkgraft_scale/sf10"
OUT_ROOT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sparkgraft_cms_epochs"
D, W, C, K, WIN = 4, 1024, 20, 20, 5  # window = last WIN epochs

spark = (
    SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '16')}]"
    )
    .appName("bench-cms-epochs")
    .config("spark.sql.shuffle.partitions", "32")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from spotify_etl_pipeline_spark.operators.cms import count_min_build  # noqa: E402
from spotify_etl_pipeline_spark.streaming.cms_stream import (  # noqa: E402
    serve_cms_topk,
)
from spotify_etl_pipeline_spark.streaming.compaction import (  # noqa: E402
    retire_epochs,
)


def build_store(docs, out: str, n_epochs: int) -> float:
    shutil.rmtree(out, ignore_errors=True)
    words = docs.select(
        (F.col("doc_id") % n_epochs).alias("epoch"),
        F.explode(F.split("text", " ")).alias("k"),
    )
    t0 = time.time()
    sketch = count_min_build(
        words, "k", d=D, w=W, hash_fn="xxhash64", group_cols=("epoch",)
    ).withColumn("hash_fn", F.lit("xxhash64"))
    sketch.write.partitionBy("epoch").parquet(f"{out}/sketch")
    rn = Window.partitionBy("epoch").orderBy(F.desc("n"), F.asc("k"))
    (
        words.groupBy("epoch", "k")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("rn", F.row_number().over(rn))
        .filter(F.col("rn") <= C)
        .select("epoch", "k")
        .write.partitionBy("epoch")
        .parquet(f"{out}/cands")
    )
    return time.time() - t0


def serve_secs(out: str, since=None):
    samples = []
    rows = None
    for _ in range(3):  # 1 warm + min-of-2
        t0 = time.time()
        rows = [
            tuple(r)
            for r in serve_cms_topk(
                spark, out, k=K, d=D, w=W, hash_fn="xxhash64",
                since_epoch=since,
            ).collect()
        ]
        samples.append(time.time() - t0)
    return min(samples[1:]), rows


docs = spark.read.parquet(f"{SRC}/documents.parquet")
n_docs = docs.count()
for n_epochs in (50, 200):
    out = os.path.join(OUT_ROOT, f"e{n_epochs}")
    build_s = build_store(docs, out, n_epochs)
    all_s, _ = serve_secs(out)
    win_s, win_rows = serve_secs(out, since=n_epochs - WIN)
    t0 = time.time()
    retired = retire_epochs(spark, f"{out}/sketch", before_epoch=n_epochs - WIN)
    retired_c = retire_epochs(spark, f"{out}/cands", before_epoch=n_epochs - WIN)
    retire_s = time.time() - t0
    post_s, post_rows = serve_secs(out, since=n_epochs - WIN)
    assert post_rows == win_rows, "retention changed the windowed answer"
    print(
        json.dumps(
            {
                "n_docs": n_docs,
                "epochs": n_epochs,
                "window_epochs": WIN,
                "build_sec": round(build_s, 2),
                "serve_all_history_sec": round(all_s, 2),
                "serve_window_sec": round(win_s, 2),
                "retire_sec": round(retire_s, 2),
                "retired_parts": retired + retired_c,
                "serve_window_after_retire_sec": round(post_s, 2),
            }
        ),
        flush=True,
    )
spark.stop()
