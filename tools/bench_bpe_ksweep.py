"""BPE encoder k-sweep on the merge-table axis (SCALE.md §Round-8).

Trains the real k=6 merge table once, then pads it with never-matching
rules (symbols over letters absent from the corpus charset filter's
hot region — same trick as tests/test_bpe_trainer.py) to k ∈ {6, 100,
1000, 5000} and times ``bpe_encode_tokens`` at each k.  k<=100 takes
the single-projection narrow-map fast path; k>100 exercises the
chunked vocabulary regime the round-8 fix added (the pre-fix code
built ONE k-deep nested replace expression, which fails Catalyst
analysis/codegen at production k≈30 000).

Usage::  python tools/bench_bpe_ksweep.py [sf_dir] [k1 k2 ...]
"""
import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
KS = [int(k) for k in sys.argv[2:]] or [6, 100, 1000, 5000]


def main() -> None:
    from spotify_etl_pipeline_spark.operators.text import (
        bpe_encode_tokens,
        bpe_train_merges,
    )
    from spotify_etl_pipeline_spark.schemas import load_fixture
    from spotify_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name="bench-bpe-ksweep", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_fixture(spark, SF_DIR, "documents").localCheckpoint(eager=True)

    real = [
        (int(r["step"]), r["x"], r["y"], int(r["n_pairs"]))
        for r in bpe_train_merges(docs, n_merges=6).collect()
    ]
    # padding rules over a 4-letter alphabet product: symbols like
    # 'nnnnn' never arise from the real merges, so they never match —
    # each still costs a full replace() scan, which is what we measure.
    pads = [
        ("n" + "".join(t), "zzz")
        for t in itertools.product("nopqrstuvwxyz", repeat=4)
    ]
    results = {}
    for k in KS:
        rules = real[:k] + [
            (len(real) + i + 1, x, y, 0) for i, (x, y) in enumerate(pads[: k - len(real)])
        ]
        merges = spark.createDataFrame(
            rules, "step: bigint, x: string, y: string, n_pairs: bigint"
        ).localCheckpoint(eager=True)

        def noop():
            bpe_encode_tokens(docs, merges=merges).write.format("noop").mode(
                "overwrite"
            ).save()

        noop()  # warm
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            noop()
            best = min(best, time.time() - t0)
        results[str(k)] = round(best, 2)
        print(f"k={k}: {best:.2f}s", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "bpe_encode_ksweep",
                "sf_dir": SF_DIR,
                "docs": docs.count(),
                "chunk_size": 100,
                "sec_by_k": results,
            }
        )
    )


if __name__ == "__main__":
    main()
