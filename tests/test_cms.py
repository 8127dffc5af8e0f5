"""operators/cms.py — count-min sketch guarantees: no undercount ever,
bounded overcount, and SUM-mergeability (the property that makes it the
distributed/streaming frequency sketch)."""

from __future__ import annotations

import os
from pathlib import Path

from pyspark.sql import functions as F

from spotify_etl_pipeline_spark.operators.cms import (
    count_min_build,
    count_min_estimate,
)
from spotify_etl_pipeline_spark.schemas import load_fixture

D, W = 4, 1024


def _words(spark, sf_dir):
    return (
        load_fixture(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("w"))
    )


def test_cms_never_undercounts_and_overcount_bounded(spark, sf_dir):
    words = _words(spark, sf_dir)
    n_total = words.count()
    sketch = count_min_build(words, "w", d=D, w=W)
    true_counts = words.groupBy("w").agg(F.count(F.lit(1)).alias("tn"))
    est = count_min_estimate(sketch, true_counts.select("w"), "w", d=D, w=W)
    joined = {
        r["w"]: (r["tn"], r["cms_n"])
        for r in true_counts.join(est, "w").collect()
    }
    assert joined
    slack = max(10, (3 * n_total) // W)  # ~e*N/w expected overcount
    for tn, cn in joined.values():
        assert cn >= tn  # the hard guarantee
        assert cn <= tn + slack  # the probabilistic one, generous


def test_cms_is_sum_mergeable(spark, sf_dir):
    words = _words(spark, sf_dir)
    a = words.filter(F.length("w") % 2 == 0)
    b = words.filter(F.length("w") % 2 != 0)
    merged = (
        count_min_build(a, "w", d=D, w=W)
        .unionByName(count_min_build(b, "w", d=D, w=W))
        .groupBy("row", "bucket")
        .agg(F.sum("n").cast("long").alias("n"))
    )
    whole = count_min_build(words, "w", d=D, w=W)
    as_set = lambda df: {  # noqa: E731
        (r["row"], r["bucket"], r["n"]) for r in df.collect()
    }
    assert as_set(merged) == as_set(whole)


def test_cms_estimate_zero_for_absent_key(spark):
    items = spark.createDataFrame([("x",)] * 3 + [("y",)], ["w"])
    sketch = count_min_build(items, "w", d=D, w=W)
    probes = spark.createDataFrame([("x",), ("never-seen",)], ["w"])
    got = {
        r["w"]: r["cms_n"]
        for r in count_min_estimate(sketch, probes, "w", d=D, w=W).collect()
    }
    assert got["x"] >= 3
    # an absent key can only collide upward, but with 4 rows over 1024
    # buckets and 2 live keys the min row is empty -> exact zero
    assert got["never-seen"] == 0


def test_cms_stream_matches_batch_including_replay(spark, sf_dir, tmp_path):
    """Streamed per-epoch sketches summed cell-wise must equal the
    whole-corpus batch sketch (SUM-mergeability through the actual
    streaming machinery), and overwriting a replayed epoch must not
    double-count."""
    from spotify_etl_pipeline_spark.streaming.cms_stream import (
        read_merged_sketch,
        run_cms_stream,
    )

    docs = load_fixture(spark, sf_dir, "documents")
    src = str(tmp_path / "src")
    docs.repartition(3).write.parquet(src)
    out = str(tmp_path / "cms")
    ckpt = str(tmp_path / "ckpt")
    run_cms_stream(spark, src, out, ckpt, d=D, w=W, max_files_per_trigger=1)

    merged = read_merged_sketch(spark, out, expect_hash_fn="xxhash64")
    words = docs.select(F.explode(F.split("text", " ")).alias("k"))
    whole = count_min_build(words, "k", d=D, w=W)
    as_set = lambda df: {  # noqa: E731
        (r["row"], r["bucket"], r["n"]) for r in df.collect()
    }
    assert as_set(merged) == as_set(whole)

    # forced replay: rewrite epoch 0 with identical content — the
    # overwrite must leave the merged sketch unchanged (exactly-once).
    # Materialize first (bounded: <= d*w rows) — Spark cannot lazily
    # read the same files an overwrite is deleting.
    epoch0_rows = spark.read.parquet(f"{out}/epoch=0").collect()
    spark.createDataFrame(
        epoch0_rows, "row: int, bucket: bigint, n: bigint, hash_fn: string"
    ).write.mode("overwrite").parquet(f"{out}/epoch=0")
    # drop the stale file-status cache for both the partition dir and
    # the root listing (they are cached as separate paths)
    spark.catalog.refreshByPath(out)
    # pre-overwrite plan is stale
    merged = read_merged_sketch(spark, out, expect_hash_fn="xxhash64")
    assert as_set(merged) == as_set(whole)

    # and estimates through the merged sketch behave identically
    probes = words.groupBy("k").count().orderBy(F.desc("count"), "k").limit(5)
    est_m = {
        r["k"]: r["cms_n"]
        for r in count_min_estimate(merged, probes.select("k"), "k", D, W).collect()
    }
    est_w = {
        r["k"]: r["cms_n"]
        for r in count_min_estimate(whole, probes.select("k"), "k", D, W).collect()
    }
    assert est_m == est_w and est_m


def test_cms_store_hash_family_mismatch_raises(spark, sf_dir, tmp_path):
    """ADVICE r9: a persisted epoch store carries a hash-family marker
    and a probe under a different family must FAIL LOUDLY — before the
    marker, an md5-built store probed with the (new) xxhash64 default
    silently returned garbage estimates.  A marker-less (pre-upgrade)
    store must also refuse validated reads instead of guessing."""
    import pytest

    from spotify_etl_pipeline_spark.streaming.cms_stream import (
        read_merged_sketch,
        run_cms_stream,
        serve_cms_topk,
    )

    docs = load_fixture(spark, sf_dir, "documents").limit(50)
    src = str(tmp_path / "src")
    docs.coalesce(1).write.parquet(src)
    out = str(tmp_path / "cms_md5")
    run_cms_stream(spark, src, out, str(tmp_path / "ck1"), d=D, w=W,
                   hash_fn="md5")

    # matching family reads fine; the marker column is dropped
    merged = read_merged_sketch(spark, out, expect_hash_fn="md5")
    assert set(merged.columns) == {"row", "bucket", "n"}
    # mismatched family raises, naming both sides
    with pytest.raises(ValueError, match="md5.*xxhash64"):
        read_merged_sketch(spark, out, expect_hash_fn="xxhash64")
    # the serve path validates too (it probes with its hash_fn arg)
    topk_store = str(tmp_path / "hh_md5")
    from spotify_etl_pipeline_spark.streaming.cms_stream import (
        run_cms_topk_stream,
    )

    run_cms_topk_stream(spark, src, topk_store, str(tmp_path / "ck2"),
                        d=D, w=W, hash_fn="md5")
    with pytest.raises(ValueError, match="hash family"):
        serve_cms_topk(spark, topk_store, k=5, d=D, w=W,
                       hash_fn="xxhash64").collect()
    assert serve_cms_topk(spark, topk_store, k=5, d=D, w=W,
                          hash_fn="md5").count() == 5

    # legacy store without the marker: validated read refuses
    legacy = str(tmp_path / "legacy")
    spark.read.parquet(f"{out}/epoch=0").drop("hash_fn").write.parquet(
        f"{legacy}/epoch=0"
    )
    with pytest.raises(ValueError, match="no hash-family marker"):
        read_merged_sketch(spark, legacy, expect_hash_fn="md5")
    # unvalidated read still works for out-of-band-known stores
    assert read_merged_sketch(spark, legacy).count() > 0


def test_cms_md5_audit_arm_keeps_guarantees(spark, sf_dir):
    """The md5 audit arm (cross-engine, oracle-checkable) must keep both
    CMS guarantees — the xxhash64 production dial is the default and is
    exercised by every other test in this file since r9."""
    words = _words(spark, sf_dir)
    n_total = words.count()
    sk = count_min_build(words, "w", d=D, w=W, hash_fn="md5")
    tc = words.groupBy("w").agg(F.count(F.lit(1)).alias("tn"))
    est = count_min_estimate(sk, tc.select("w"), "w", d=D, w=W,
                             hash_fn="md5")
    slack = max(10, (3 * n_total) // W)
    for r in tc.join(est, "w").collect():
        assert r["tn"] <= r["cms_n"] <= r["tn"] + slack


def test_cms_topk_stream_matches_batch_including_replay(spark, sf_dir, tmp_path):
    """Heavy-hitter serving (r8): the maintenance stream's epoch-summed
    sketch + unioned per-epoch candidates must serve the SAME top-k as
    the batch composition (cms_topk_serving's shape) when the stream's
    file batches match the batch twin's doc_id % E epoch split — and a
    forced epoch replay (sketch AND candidate partitions rewritten)
    must leave the served ranking unchanged (exactly-once)."""
    from spotify_etl_pipeline_spark.operators.cms import (
        count_min_build,
        count_min_topk,
    )
    from spotify_etl_pipeline_spark.streaming.cms_stream import (
        run_cms_topk_stream,
        serve_cms_topk,
    )

    E, C, K = 5, 10, 20
    docs = load_fixture(spark, sf_dir, "documents")
    src = str(tmp_path / "src")
    for e in range(E):  # one file per epoch -> batches == epoch split
        docs.filter(F.col("doc_id") % E == e).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    out = str(tmp_path / "hh")
    ckpt = str(tmp_path / "ckpt")
    run_cms_topk_stream(
        spark, src, out, ckpt, d=D, w=W, per_epoch_candidates=C,
        max_files_per_trigger=1,
    )
    served = [
        (r["k"], r["cms_n"], r["rank"])
        for r in serve_cms_topk(spark, out, k=K, d=D, w=W).collect()
    ]

    words = docs.select(
        (F.col("doc_id") % E).alias("ep"),
        F.explode(F.split("text", " ")).alias("k"),
    )
    sketch = count_min_build(words, "k", d=D, w=W)
    from pyspark.sql.window import Window

    rn = Window.partitionBy("ep").orderBy(F.desc("n"), F.asc("k"))
    cand = (
        words.groupBy("ep", "k")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("rn", F.row_number().over(rn))
        .filter(F.col("rn") <= C)
        .select("k")
        .distinct()
    )
    batch = [
        (r["k"], r["cms_n"], r["rank"])
        for r in count_min_topk(sketch, cand, "k", k=K, d=D, w=W).collect()
    ]
    assert served == batch and len(served) == K

    # forced replay of epoch 0: rewrite both artifacts with identical
    # content — serving must not change (the epoch-keyed exactly-once
    # scheme covers the candidate lists too)
    for part, schema in (
        ("sketch", "row: int, bucket: bigint, n: bigint, hash_fn: string"),
        ("cands", "k: string"),
    ):
        rows = spark.read.parquet(f"{out}/{part}/epoch=0").collect()
        spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
            f"{out}/{part}/epoch=0"
        )
        spark.catalog.refreshByPath(f"{out}/{part}")
    replayed = [
        (r["k"], r["cms_n"], r["rank"])
        for r in serve_cms_topk(spark, out, k=K, d=D, w=W).collect()
    ]
    assert replayed == batch


def test_cms_windowed_serving_and_retention(spark, sf_dir, tmp_path):
    """Sliding-window heavy hitters: since_epoch must serve exactly the
    batch build over only the window's documents (each epoch is an
    independent mergeable sketch — exclusion is partition pruning, not
    subtraction), and retire_epochs must drop pre-window history without
    changing the windowed answer; guards refuse the two config errors
    (emptying the store / windowing a provenance-free folded base)."""
    import pytest

    from spotify_etl_pipeline_spark.operators.cms import (
        count_min_build,
        count_min_topk,
    )
    from spotify_etl_pipeline_spark.schemas import load_fixture
    from spotify_etl_pipeline_spark.streaming.cms_stream import (
        read_merged_sketch,
        run_cms_topk_stream,
        serve_cms_topk,
    )
    from spotify_etl_pipeline_spark.streaming.compaction import (
        compact_cms_store,
        retire_epochs,
    )

    E, C, K, SINCE = 5, 10, 20, 3
    docs = load_fixture(spark, sf_dir, "documents")
    src = str(tmp_path / "src")
    for e in range(E):  # one file per epoch -> batches == epoch split
        docs.filter(F.col("doc_id") % E == e).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    out = str(tmp_path / "hh")
    run_cms_topk_stream(spark, src, out, str(tmp_path / "ckpt"), d=D, w=W,
                        per_epoch_candidates=C, max_files_per_trigger=1)

    def served(since=None):
        return [
            tuple(r)
            for r in serve_cms_topk(
                spark, out, k=K, d=D, w=W, since_epoch=since
            ).collect()
        ]

    # batch twin over ONLY the window's documents
    win_docs = docs.filter(F.col("doc_id") % E >= SINCE)
    words = win_docs.select(
        (F.col("doc_id") % E).alias("ep"),
        F.explode(F.split("text", " ")).alias("k"),
    )
    sketch = count_min_build(words, "k", d=D, w=W)
    from pyspark.sql.window import Window

    rn = Window.partitionBy("ep").orderBy(F.desc("n"), F.asc("k"))
    cand = (
        words.groupBy("ep", "k")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("rn", F.row_number().over(rn))
        .filter(F.col("rn") <= C)
        .select("k")
        .distinct()
    )
    want = [
        tuple(r)
        for r in count_min_topk(sketch, cand, "k", k=K, d=D, w=W).collect()
    ]
    full = served()
    assert served(since=SINCE) == want and want != full

    # retention: drop pre-window epochs from both artifacts — the
    # windowed answer is unchanged, and all-history now == the window
    assert retire_epochs(spark, f"{out}/sketch", before_epoch=SINCE) == SINCE
    assert retire_epochs(spark, f"{out}/cands", before_epoch=SINCE) == SINCE
    assert served(since=SINCE) == want
    assert served() == want

    # guard: refusing to empty the store
    with pytest.raises(ValueError, match="would empty"):
        retire_epochs(spark, f"{out}/sketch", before_epoch=E + 1)
    # guard: a folded base has no epoch provenance -> windowed read raises
    compact_cms_store(spark, f"{out}/sketch")
    with pytest.raises(ValueError, match="windowed read is impossible"):
        read_merged_sketch(spark, f"{out}/sketch",
                           expect_hash_fn="xxhash64", since_epoch=SINCE)
    with pytest.raises(ValueError, match="all-history store"):
        retire_epochs(spark, f"{out}/sketch", before_epoch=SINCE)


def test_windowed_sketch_read_prunes_epoch_partitions(spark, sf_dir, tmp_path):
    """Pre-window epochs must never be read.  Since r11 the exclusion
    is stronger than a PartitionFilter: the windowed reader lists the
    epoch directories through the FileSystem API and hands Spark ONLY
    the in-window partition paths (the r10 PartitionFilter plan still
    paid an O(live epochs) file listing + a provenance-guard Spark job
    — measured in SCALE.md §Round-11).  Assert the scan's file index
    contains the in-window path and NOT the excluded ones."""
    from spotify_etl_pipeline_spark.streaming.cms_stream import (
        list_epoch_values,
        read_merged_sketch,
        run_cms_stream,
    )
    from spotify_etl_pipeline_spark.schemas import load_fixture

    docs = load_fixture(spark, sf_dir, "documents")
    src = str(tmp_path / "src")
    for part in (0, 1, 2):
        docs.filter(F.col("doc_id") % 3 == part).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    out = str(tmp_path / "cms")
    run_cms_stream(spark, src, out, str(tmp_path / "ckpt"), d=D, w=W,
                   max_files_per_trigger=1)
    assert list_epoch_values(spark, out) == [0, 1, 2]

    df = read_merged_sketch(spark, out, expect_hash_fn="xxhash64",
                            since_epoch=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    files = df.inputFiles()
    assert files and all("epoch=2" in f for f in files), files
    assert "epoch=0" not in plan and "epoch=1" not in plan, plan[:2000]
    # and the windowed answer is still the in-window build
    got = {(r["row"], r["bucket"], r["n"]) for r in df.collect()}
    from spotify_etl_pipeline_spark.operators.cms import count_min_build

    win_words = docs.filter(F.col("doc_id") % 3 == 2).select(
        F.explode(F.split("text", " ")).alias("k")
    )
    want = {
        (r["row"], r["bucket"], r["n"])
        for r in count_min_build(win_words, "k", d=D, w=W).collect()
    }
    assert got == want


def test_windowed_sketch_empty_window_reads_one_partition(
    spark, sf_dir, tmp_path
):
    """A window past the newest epoch must serve an EMPTY sketch whose
    scan touches at most ONE partition path (the schema donor) — the
    old fallback re-read the whole store just to produce zero rows,
    re-introducing the O(live-epochs) listing the windowed reader
    exists to avoid; and with expect_hash_fn set it raised a misleading
    "built with hash family []" error (ADVICE r11)."""
    from spotify_etl_pipeline_spark.operators.cms import count_min_estimate
    from spotify_etl_pipeline_spark.schemas import load_fixture
    from spotify_etl_pipeline_spark.streaming.cms_stream import (
        read_merged_sketch,
        run_cms_stream,
    )

    docs = load_fixture(spark, sf_dir, "documents")
    src = str(tmp_path / "src")
    for part in (0, 1, 2):
        docs.filter(F.col("doc_id") % 3 == part).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    out = str(tmp_path / "cms")
    run_cms_stream(spark, src, out, str(tmp_path / "ckpt"), d=D, w=W,
                   max_files_per_trigger=1)

    df = read_merged_sketch(spark, out, expect_hash_fn="xxhash64",
                            since_epoch=99)
    dirs = {f.rsplit("/", 1)[0] for f in df.inputFiles()}
    assert len(dirs) <= 1, dirs  # schema donor only — never the store
    assert df.count() == 0
    assert df.columns == ["row", "bucket", "n"]
    # empty sketch serves estimate 0 (never-undercount holds trivially)
    probe = spark.createDataFrame([("anything",)], "k string")
    est = count_min_estimate(df, probe, "k", d=D, w=W).collect()
    assert [r["cms_n"] for r in est] == [0]

    # a store with NO epochs at all is a loud config error, not an
    # empty frame
    import pytest

    with pytest.raises(ValueError, match="no epoch partitions"):
        read_merged_sketch(spark, str(tmp_path / "nothing"),
                           since_epoch=0)


def test_cms_topk_windowed_entry_equals_streamed_serve(
    spark, sf_dir, tmp_path
):
    """The driver-facing cms_topk_windowed entry must be bit-equal to
    serve_cms_topk(since_epoch=) over a store whose stream epochs match
    the entry's doc_id%E split, under the same (md5) hash family — the
    X40 claim that the batch twin and the windowed streaming serve are
    one algebra."""
    from spotify_etl_pipeline_spark.queries.quality_ops import (
        CMS_CANDS,
        CMS_EPOCHS,
        CMS_TOPK,
        CMS_WIN_SINCE,
        cms_topk_windowed,
    )
    from spotify_etl_pipeline_spark.schemas import load_fixture
    from spotify_etl_pipeline_spark.streaming.cms_stream import (
        run_cms_topk_stream,
        serve_cms_topk,
    )

    docs = load_fixture(spark, sf_dir, "documents")
    src = str(tmp_path / "src")
    seen: set = set()
    for e in range(CMS_EPOCHS):  # one file per epoch -> epoch split
        docs.filter(F.col("doc_id") % CMS_EPOCHS == e).coalesce(
            1
        ).write.mode("append").parquet(src)
        # FileStreamSource orders files by mtime; two appends landing in
        # the same mtime tick could swap epoch assignment (ADVICE r11).
        # Force a distinct, increasing mtime per epoch file.
        parts = {p for p in Path(src).glob("part-*.parquet")}
        (new,) = parts - seen
        os.utime(new, (1_700_000_000 + e, 1_700_000_000 + e))
        seen = parts
    out = str(tmp_path / "hh")
    run_cms_topk_stream(
        spark, src, out, str(tmp_path / "ckpt"), d=D, w=W,
        per_epoch_candidates=CMS_CANDS, max_files_per_trigger=1,
        hash_fn="md5",
    )
    streamed = [
        tuple(r)
        for r in serve_cms_topk(
            spark, out, k=CMS_TOPK, d=D, w=W, hash_fn="md5",
            since_epoch=CMS_WIN_SINCE,
        ).collect()
    ]
    entry = [tuple(r) for r in cms_topk_windowed(spark, sf_dir).collect()]
    # the window's candidate union can hold fewer than CMS_TOPK distinct
    # keys (2 in-window epochs x CMS_CANDS with overlap) — the serve is
    # bounded by the candidate set, identically on both arms
    assert entry == streamed
    assert 0 < len(entry) <= CMS_TOPK
