"""Count-min sketch (Cormode & Muthukrishnan 2005): the mergeable
frequency sketch — point-queryable approximate counts in d·w fixed
integers regardless of corpus size.

Why it belongs in a 100 TB engine next to the membership sketch
(operators/bloom.py) and the distinct sketch (HLL via
approx_count_distinct): the CMS table is a pure SUM-mergeable aggregate,
so it partial-aggregates map-side, merges across partitions / days /
streams for free, and answers "how often did key k occur" without
storing keys — the standard building block for frequency capping,
heavy-hitter monitoring, and repeated-ngram tracking over streams too
wide to groupBy exactly.

Guarantee: estimates never undercount (every occurrence lands in all d
counters it hashes to; collisions only ADD), and overcount is bounded by
e·N/w with probability 1−e^−d.  Both halves are in-query assertions in
the driver entry (`cms_heavy_hitters_check`).

Hash family: ``xxhash64`` (JVM-native) is the PRODUCTION DEFAULT — the
CMS bounds need pairwise-independent-ish hashing, not cryptographic, and
the digest dominates build cost at 10⁸+ occurrences (measured 7.0×
through the full serve path, SCALE.md).  The ``md5`` dial is the AUDIT
arm: the repo's cross-engine md5-slice bigint
(queries/oracle_sql_helpers.MD5_SID_* — first 60 digest bits),
row-salted with a ``i:`` prefix, bucketed by ``% w`` — bit-identical in
DuckDB, so the whole sketch is value-hash-checkable; the oracle catalog
entries pin it explicitly.  Build and probe must use the SAME family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Spark-side md5-slice bigint (keep in sync with MD5_SID_SPARK in
#: queries/oracle_sql_helpers.py — the cross-engine hash family).
_SID = "cast(conv(substring(md5({x}), 1, 15), 16, 10) as bigint)"


def _bucket_expr(row_col: str, key_sql: str, w: int, hash_fn: str) -> F.Column:
    # explicit cast: ANSI mode (Spark 4 default) rejects implicit
    # int→string coercion inside concat
    salted = f"concat(cast({row_col} as string), ':', {key_sql})"
    if hash_fn == "md5":
        # the AUDIT arm: cross-engine bigint (oracle-checkable in DuckDB)
        # — ~1 µs/row: at 10⁸+ occurrences the digest IS the build cost,
        # so it is opt-in; the oracle catalog entries pin it explicitly
        return F.expr(_SID.format(x=salted) + f" % {int(w)}")
    if hash_fn == "xxhash64":
        # the PRODUCTION DEFAULT: JVM-native, an order of magnitude
        # cheaper; same guarantees (the CMS bounds need pairwise-
        # independent-ish hashing, not cryptographic) — its one cost is
        # that an external SQL engine can't reproduce it, hence md5 above
        return F.expr(f"pmod(xxhash64({salted}), {int(w)})")
    raise ValueError(f'hash_fn must be "md5" or "xxhash64", got {hash_fn!r}')


def count_min_build(
    items: DataFrame, key_col: str, d: int = 4, w: int = 1024,
    hash_fn: str = "xxhash64", group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Build the sketch: (row, bucket, n) with d·w live cells at most.

    One explode (×d, constant) + ONE groupBy(row, bucket) — the shuffle
    carries at most d·w distinct keys after map-side partial aggregation
    no matter how many input rows arrive, which is the sketch's entire
    scale argument.  Merging sketches from two corpora/partitions/days
    is ``unionByName`` + the same groupBy-SUM — no rescan.

    ``group_cols`` builds one independent sketch PER GROUP in the same
    pass — (group…, row, bucket, n), |groups|·d·w cells at most — the
    epoch-keyed layout the streaming store persists one partition at a
    time: summing a subset of groups cell-wise serves that subset's
    window exactly (SUM-mergeability), which is what
    ``serve_cms_topk(since_epoch=)`` exploits.
    """
    gc = list(group_cols)
    exploded = items.select(
        *gc,
        F.col(key_col).cast("string").alias("k"),
        F.explode(F.array(*[F.lit(i) for i in range(int(d))])).alias("row"),
    )
    return (
        exploded.select(
            *gc, "row", _bucket_expr("row", "k", w, hash_fn).alias("bucket")
        )
        .groupBy(*gc, "row", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def count_min_estimate(
    sketch: DataFrame, candidates: DataFrame, key_col: str, d: int = 4,
    w: int = 1024, hash_fn: str = "xxhash64",
) -> DataFrame:
    """Point-query the sketch for each candidate key: (key, cms_n) with
    ``cms_n = min over the d salted rows`` — never below the true count.

    The sketch is ≤ d·w rows by construction, so it BROADCASTS and the
    candidate side never shuffles for the lookup; the only shuffle is
    the d-row min-fold per candidate, keyed on the candidate itself.
    """
    probes = candidates.select(
        F.col(key_col).cast("string").alias("k")
    ).select(
        "k",
        F.explode(F.array(*[F.lit(i) for i in range(int(d))])).alias("row"),
    ).select("k", "row", _bucket_expr("row", "k", w, hash_fn).alias("bucket"))
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy("k")
        .agg(F.min(F.coalesce("n", F.lit(0))).cast("long").alias("cms_n"))
        .select(F.col("k").alias(key_col), "cms_n")
    )


def count_min_topk(
    sketch: DataFrame, candidates: DataFrame, key_col: str, k: int = 20,
    d: int = 4, w: int = 1024, hash_fn: str = "xxhash64",
) -> DataFrame:
    """Serve top-k heavy hitters FROM THE SKETCH: probe every candidate
    key, rank by estimate — (key, cms_n, rank), ties toward the
    lexicographically smaller key.

    The CMS stores no keys, so heavy-hitter serving is sketch + a
    CANDIDATE SET (Cormode & Muthukrishnan 2005 §4's CM+heap pattern):
    candidates come from bounded per-batch/per-epoch top-c lists (see
    streaming/cms_stream.py), never from a corpus-wide raw-key groupBy
    — the candidate table is |epochs|·c rows, the probe is a broadcast
    join against the ≤ d·w-row sketch, and the final rank is a
    ROW_NUMBER over ≤ |candidates| estimates.  No stage touches the raw
    corpus at serve time.  The no-undercount guarantee makes the served
    set a superset-biased approximation: a true heavy hitter in the
    candidate set can never be ranked below its true mass."""
    from pyspark.sql.window import Window

    est = count_min_estimate(sketch, candidates, key_col, d=d, w=w,
                             hash_fn=hash_fn)
    rk = Window.orderBy(F.desc("cms_n"), F.asc(key_col))
    return (
        est.withColumn("rank", F.row_number().over(rk))
        .filter(F.col("rank") <= int(k))
        .select(key_col, "cms_n", F.col("rank").cast("long").alias("rank"))
    )
