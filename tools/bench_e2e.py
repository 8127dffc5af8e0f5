"""Per-stage wall-time budget for the end-to-end corpus capstone at a
scale tile (SCALE.md §Round-12 protocol): fresh JVM, one run, stage
boundaries attributed via curate_encode_pack's on_stage hook (each
boundary is an EAGER localCheckpoint, so elapsed-between-marks is that
stage's cost), then the lazy encode→pack→manifest tail timed as one
noop-sink materialization.

Usage::

    python tools/gen_e2e_scale.py 100           # build the tile first
    python tools/bench_e2e.py /tmp/sparkgraft_scale/e2e_sf10
    python tools/bench_e2e.py /tmp/sparkgraft_scale/e2e_sf10 4000000
    # ^ optional 2nd arg: mixture token budget (default the catalog's
    # E2E_BUDGET=16k).  A production-scale budget un-bounds the tail —
    # encode/pack/manifest then process corpus-scale token mass instead
    # of a fixed 16k sample, which is the arm that verifies the tail
    # re-inherits the standalone entries' scaling when composed.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sparkgraft_scale/e2e_sf10"
BUDGET = int(sys.argv[2]) if len(sys.argv) > 2 else None
# 3rd arg 'approx' switches the quality tier to the broadcast
# percentile_approx-cutoff arm (the 100 TB dial) in place of the
# per-lang ntile window — the composed measurement of that dial.
APPROX = len(sys.argv) > 3 and sys.argv[3] == "approx"


def main() -> None:
    from spotify_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name="bench-e2e", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from spotify_etl_pipeline_spark.operators.packing import (
        packed_shard_manifest,
    )
    from spotify_etl_pipeline_spark.queries.endtoend import curate_encode_pack
    from spotify_etl_pipeline_spark.schemas import load_fixture

    docs = load_fixture(spark, SF_DIR, "documents").select(
        "doc_id", "lang", "text"
    )
    n_docs = docs.count()

    times: dict[str, float] = {}
    last = time.time()

    def on_stage(name: str) -> None:
        nonlocal last
        now = time.time()
        times[name] = round(now - last, 2)
        print(f"  {name}: {times[name]}s", file=sys.stderr)
        last = now

    t_all = time.time()
    kw = {} if BUDGET is None else {"budget": BUDGET}
    if APPROX:
        kw["approx"] = True
    packed, split, train = curate_encode_pack(docs, on_stage=on_stage, **kw)
    t0 = time.time()
    # mirror the driver entry's full tail: manifest JOIN per-lang split
    # audit (an unmaterialized audit frame would make this stage time
    # measure less than the entry's composition — code-review r12)
    man = packed_shard_manifest(packed)
    audit = split.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")
    )  # cheap; split is checkpointed
    man.join(audit, "lang").write.format("noop").mode("overwrite").save()
    times["encode_pack_manifest"] = round(time.time() - t0, 2)
    total = round(time.time() - t_all, 2)

    stats = {
        "budget": BUDGET or "default",
        "approx": APPROX,
        "n_docs": n_docs,
        "train_docs": train.count(),
        "split_rows": split.count(),
        "manifest_rows": man.count(),
    }
    print(json.dumps({"sf_dir": SF_DIR, "total_sec": total,
                      "stages": times, **stats}))


if __name__ == "__main__":
    main()
