"""Char-bigram LM fit+score at a scale tile (round-13 target #1).

Times ``lm_score_milli`` — the kernel inside text_lm_score /
quality_lm_buckets / corpus_curation_quality_mix / the e2e quality
stage — over a documents tile under the bench protocol (fresh JVM,
untimed warm run, noop sink, min of N timed runs).

Usage::

    python tools/bench_lmscore.py [sf_dir] [n_runs]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sparkgraft_scale/e2e_sf10"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 2


def main() -> None:
    from spotify_etl_pipeline_spark.queries.stats_ops import lm_score_milli
    from spotify_etl_pipeline_spark.schemas import load_fixture
    from spotify_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name="bench-lmscore")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_fixture(spark, SF_DIR, "documents").select(
        "doc_id", "lang", "text"
    )
    # pin the one-time Python/Arrow worker spin-up outside the windows
    spark.range(64).repartition(8).mapInPandas(lambda it: it, "id long").count()

    def noop() -> None:
        lm_score_milli(docs).write.format("noop").mode("overwrite").save()

    noop()  # warm
    ss = []
    for _ in range(N):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        noop()
        ss.append(round(time.perf_counter() - t0, 2))
    print(json.dumps({"sf_dir": SF_DIR, "samples": ss, "min": min(ss)}))
    spark.stop()


if __name__ == "__main__":
    main()
