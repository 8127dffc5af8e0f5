"""Streaming count-min sketch maintenance — the online half of
``operators.cms``.

CMS is SUM-mergeable, which makes its streaming form trivial-by-design
and exactly the reason the sketch exists: each micro-batch builds its
OWN d×w sketch (one groupBy whose shuffle carries ≤ d·w keys whatever
the batch size) and writes it epoch-partitioned; the serving sketch is
the SUM over epochs — no per-key state store, no watermark, no
shuffle-growing state, and a replayed epoch overwrites its own
partition instead of double-counting (the epoch-keyed exactly-once
scheme shared by dedup_index.py / decontam_stream.py / the gold-table
writers).

Merged-stream == whole-corpus-batch is asserted in tests both at the
sketch-cell level and through point estimates, including after a forced
epoch replay.

At 100 TB / unbounded streams: per-trigger cost is O(batch) narrow work
+ a ≤ d·w-row write; the store grows by d·w rows per epoch and
compaction is the same SUM (a maintenance job can fold history into one
epoch at any time without changing any estimate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.cms import count_min_build
from ..schemas import DOCUMENTS_SCHEMA


def run_cms_stream(
    spark: SparkSession,
    docs_dir: str,
    out_path: str,
    checkpoint: str,
    d: int = 4,
    w: int = 1024,
    max_files_per_trigger: int = 1,
    hash_fn: str = "xxhash64",
) -> None:
    """Drive the sketch-maintenance stream over current files: per
    micro-batch, build the batch's word-frequency sketch and write it
    under ``epoch=<n>``.

    ``hash_fn`` forwards to :func:`..operators.cms.count_min_build`;
    the default is the ``xxhash64`` production dial (measured 6.7× over
    md5 on the build stage, SCALE.md §Round-7; 7.0× through the full
    serve path) and ``md5`` is the explicit cross-engine audit arm —
    estimates must of course be probed with the SAME family the sketch
    was built with.  Epoch SUM-merging is family-agnostic (cells are
    (row, bucket, n)).
    """

    def step(batch: DataFrame, epoch: int) -> None:
        words = batch.select(F.explode(F.split("text", " ")).alias("k"))
        sketch = count_min_build(words, "k", d=d, w=w, hash_fn=hash_fn)
        sketch.withColumn("hash_fn", F.lit(hash_fn)).write.mode(
            "overwrite"
        ).parquet(f"{out_path}/epoch={epoch}")

    q = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_dir)
        .writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def list_epoch_values(spark: SparkSession, path: str) -> list[int]:
    """Epoch values present in a store, from ONE Hadoop-FS directory
    listing — no Spark job.  The r11 many-epoch measurement (SCALE.md
    §Round-11) showed windowed serves paying O(live epochs) even though
    partition pruning kept excluded DATA unread: the provenance guard's
    ``select("epoch").distinct().collect()`` planned a job over every
    partition, and the windowed read still listed the whole store.
    Listing the partition directories through the FileSystem API (works
    on local FS, HDFS, and Hadoop-backed object stores alike) makes the
    epoch inventory metadata-priced, and lets windowed readers hand
    Spark ONLY the in-window partition paths.  Thin alias of
    ``stores.epoch_values`` — the shared epoch-store filesystem layer
    every guard and maintenance job uses."""
    from .stores import epoch_values

    return epoch_values(spark, path)


def _windowed_store(
    spark: SparkSession, out_path: str, since_epoch: int
) -> DataFrame:
    """The in-window slice of an epoch store: refuse a provenance-free
    compacted base, then read ONLY the ``epoch >= since_epoch``
    partition directories — both the guard and the read are priced by
    the WINDOW (one FS listing + |window| partition paths), not by live
    history.  An empty window stays O(1): the correctly-typed empty
    slice is derived from ONE partition path (the newest epoch), never
    a whole-store listing (ADVICE r11)."""
    from .compaction import BASE_EPOCH

    epochs = list_epoch_values(spark, out_path)
    if BASE_EPOCH in epochs:
        raise ValueError(
            f"CMS store {out_path} contains a compacted epoch={BASE_EPOCH} "
            "base — epoch provenance is gone, a windowed read is "
            "impossible; use retire_epochs (not full-history "
            "compaction) on stores served with since_epoch"
        )
    if not epochs:
        raise ValueError(
            f"CMS store {out_path} has no epoch partitions — the feed "
            "has not written yet (or the path is wrong); a windowed "
            "serve needs at least one epoch to exist"
        )
    live = [e for e in epochs if e >= since_epoch]
    if not live:
        return spark.read.parquet(
            f"{out_path}/epoch={max(epochs)}"
        ).limit(0)
    return spark.read.parquet(
        *[f"{out_path}/epoch={e}" for e in live]
    )


def read_merged_sketch(
    spark: SparkSession,
    out_path: str,
    expect_hash_fn: str | None = None,
    since_epoch: int | None = None,
) -> DataFrame:
    """The serving sketch: SUM the epoch partitions cell-wise. Identical
    schema to :func:`..operators.cms.count_min_build`, so
    ``count_min_estimate`` works on it unchanged — and folding history
    into fewer epochs (compaction) is this same aggregation.

    Every epoch written by this module carries a ``hash_fn`` marker
    column (ADVICE r9: a store built under one hash family probed with
    another silently breaks the never-undercount guarantee — the cells
    are just integers, nothing else can catch the mismatch).  Pass
    ``expect_hash_fn`` to FAIL LOUDLY instead: the read raises if any
    epoch was built under a different family, or if the store predates
    the marker entirely (rebuild it, or re-stamp with a known family).
    The marker is dropped from the returned frame, so downstream probes
    are unchanged; validation cost is one distinct over the ≤ d·w·epochs
    cell store.

    ``since_epoch`` turns the same store into a SLIDING-WINDOW sketch:
    only partitions with ``epoch >= since_epoch`` enter the SUM — the
    windowed/decayed frequency view (recent-heavy-hitter serving)
    that epoch-keyed sketches make free, because each epoch is an
    independent mergeable sketch.  Exclusion is PATH-level (r11): the
    reader lists epoch directories once through the FileSystem API and
    hands Spark only the in-window partition paths, so excluded epochs
    are never read AND never listed — both the provenance guard and the
    scan are priced by the window, not by live history (the r10
    PartitionFilter formulation still paid an O(live epochs) listing +
    a guard job; measured, SCALE.md §Round-11).  A windowed read
    REFUSES a store
    containing a folded ``epoch=-1`` base (full-history compaction
    destroys epoch provenance — windowed stores retire old epochs with
    :func:`..compaction.retire_epochs` instead of folding them)."""
    # a session that WROTE this store (foreachBatch) may hold a stale
    # file-listing cache for it — observed at the sf10 tile as a
    # zero-row read of a populated store; refresh is cheap and makes
    # write-then-serve sessions correct (all store readers do this)
    spark.catalog.refreshByPath(out_path)
    if since_epoch is not None:
        store = _windowed_store(spark, out_path, int(since_epoch))
    else:
        # the whole-path read has no listing of its own, so it must
        # run the mid-swap guard explicitly: after a crashed
        # compact_cms_store some epochs are dot-prefixed (invisible to
        # Spark) and a plain read would silently UNDERCOUNT — the one
        # failure a CMS must never produce (code-review r12; the
        # windowed arm gets the same guard via epoch_partitions)
        from .stores import epoch_partitions

        epoch_partitions(spark, out_path)
        store = spark.read.parquet(out_path)
    if "hash_fn" in store.columns:
        if expect_hash_fn is not None:
            families = sorted(
                r[0] for r in store.select("hash_fn").distinct().collect()
            )
            # an empty slice (empty window) has no family to validate
            # and no cells to mis-probe — estimates are correctly 0;
            # raising "built with hash family []" here would be noise
            if families and families != [expect_hash_fn]:
                raise ValueError(
                    f"CMS store {out_path} was built with hash family "
                    f"{families}, probe requested {expect_hash_fn!r} — "
                    "estimates would be garbage; rebuild the store or "
                    "probe with the matching family"
                )
        store = store.drop("hash_fn")
    elif expect_hash_fn is not None:
        raise ValueError(
            f"CMS store {out_path} carries no hash-family marker "
            "(pre-marker store): rebuild it with the current writer, "
            "or read without expect_hash_fn only if the build family "
            "is known out-of-band"
        )
    return (
        store.groupBy("row", "bucket")
        .agg(F.sum("n").cast("long").alias("n"))
    )


def run_cms_topk_stream(
    spark: SparkSession,
    docs_dir: str,
    out_path: str,
    checkpoint: str,
    d: int = 4,
    w: int = 1024,
    per_epoch_candidates: int = 10,
    max_files_per_trigger: int = 1,
    hash_fn: str = "xxhash64",
) -> None:
    """Heavy-hitter maintenance stream: per micro-batch write (a) the
    batch's sketch under ``sketch/epoch=<n>`` and (b) the batch's top
    ``per_epoch_candidates`` keys by WITHIN-BATCH exact count under
    ``cands/epoch=<n>`` — the bounded candidate-set half of the
    CM+heap heavy-hitter pattern (a batch-local groupBy is batch-sized;
    the corpus-wide raw-key groupBy is exactly what the sketch
    replaces).  Both artifacts are epoch-keyed, so a replayed epoch
    overwrites itself: the sketch SUM and the candidate-union are both
    replay-idempotent (the shared exactly-once scheme).  A key that is
    a true heavy hitter globally is a heavy hitter in SOME batch for
    any bounded stream partitioning of its mass at c ≥ batch
    cardinality of competitors — the standard candidate-recall caveat,
    tested as stream==batch equality under a matching epoch split."""

    def step(batch: DataFrame, epoch: int) -> None:
        words = batch.select(F.explode(F.split("text", " ")).alias("k"))
        sketch = count_min_build(words, "k", d=d, w=w, hash_fn=hash_fn)
        sketch.withColumn("hash_fn", F.lit(hash_fn)).write.mode(
            "overwrite"
        ).parquet(f"{out_path}/sketch/epoch={epoch}")
        cand = (
            words.groupBy("k")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), F.asc("k"))
            .limit(int(per_epoch_candidates))
            .select("k")
        )
        cand.write.mode("overwrite").parquet(f"{out_path}/cands/epoch={epoch}")

    q = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_dir)
        .writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def serve_cms_topk(
    spark: SparkSession,
    out_path: str,
    k: int = 20,
    d: int = 4,
    w: int = 1024,
    hash_fn: str = "xxhash64",
    since_epoch: int | None = None,
) -> DataFrame:
    """Serve "current top-k frequent keys" from the store WITHOUT
    touching the raw corpus: SUM the epoch sketches cell-wise, union
    the epoch candidate lists (distinct — |epochs|·c rows), probe, rank
    (``operators.cms.count_min_topk``).  The store's persisted
    ``hash_fn`` marker is validated against the requested family before
    any probe (a mismatch raises instead of silently serving garbage
    estimates).

    ``since_epoch`` serves the SLIDING WINDOW instead of all history —
    "top-k over the last N epochs", the recency-weighted heavy-hitter
    report streaming monitors actually want: both the sketch SUM and
    the candidate union restrict to ``epoch >= since_epoch`` (partition
    pruning — older epochs are never read), and the result equals a
    batch build over only the window's documents exactly (tested)."""
    from ..operators.cms import count_min_topk

    merged = read_merged_sketch(
        spark, f"{out_path}/sketch", expect_hash_fn=hash_fn,
        since_epoch=since_epoch,
    )
    spark.catalog.refreshByPath(f"{out_path}/cands")
    if since_epoch is not None:
        cands = _windowed_store(
            spark, f"{out_path}/cands", int(since_epoch)
        )
    else:
        # same whole-path mid-swap guard as read_merged_sketch: a
        # partially-visible cands store would silently narrow the
        # probe set
        from .stores import epoch_partitions

        epoch_partitions(spark, f"{out_path}/cands")
        cands = spark.read.parquet(f"{out_path}/cands")
    cands = cands.select("k").distinct()
    return count_min_topk(merged, cands, "k", k=k, d=d, w=w, hash_fn=hash_fn)
