"""Isolated per-query timing — the round-13 A/B meter.

Runs the named catalog queries under the bench.py protocol (fresh JVM,
untimed warm run, noop-sink materialization, min of N timed runs with the
DataFrame cache cleared inside each window) WITHOUT the other 60 headline
queries around them — the serialized re-measure the r12 verdict asked for
when adjudicating noise, and the before/after meter for single-operator
changes.

Usage::

    python tools/minibench.py [-n N] [--sf DIR] name [name ...]

Prints one JSON line: {"sf_dir": ..., "n": N, "queries": {name: min_sec},
"samples": {name: [s, ...]}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spotify_etl_pipeline_spark.queries.catalog import full_catalog  # noqa: E402
from spotify_etl_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    n = 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "-n":
            n = int(args[i + 1])
            i += 2
        elif args[i] == "--sf":
            sf_dir = args[i + 1]
            i += 2
        else:
            names.append(args[i])
            i += 1
    if not names:
        sys.exit(__doc__)
    spark = get_spark(app_name="minibench")
    cat = full_catalog()
    # pin the one-time Python/Arrow worker spin-up outside any timed window
    spark.range(64).repartition(8).mapInPandas(lambda it: it, "id long").count()
    out: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    for name in names:
        fn = cat[name].fn
        spark.sparkContext.setJobDescription(f"minibench warm {name}")
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        ss: list[float] = []
        for r in range(n):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"minibench {name} run{r}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            ss.append(round(time.perf_counter() - t0, 3))
        spark.catalog.clearCache()
        out[name] = min(ss)
        samples[name] = ss
    print(json.dumps({"sf_dir": sf_dir, "n": n, "queries": out, "samples": samples}))
    spark.stop()


if __name__ == "__main__":
    main()
