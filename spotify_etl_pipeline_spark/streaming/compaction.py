"""Epoch-store compaction — the maintenance job every epoch-keyed store
in this repo eventually needs.

The exactly-once scheme shared by pq_index_stream / cms_stream /
dedup_index / the tombstone feeds writes one partition per foreachBatch
epoch; over a long-lived stream the store accumulates one directory per
trigger, and serve-time reads pay the file-listing + tiny-file cost for
all of them.  Compaction folds the existing epoch partitions into a
single BASE partition without changing what serving sees:

- **row stores** (PQ code tables, LSH signature tables, CMS candidate
  lists, tombstone feeds): serving is a plain union, so the fold is the
  identity — a rewrite of the same rows into one partition.
- **sketch stores** (CMS cells): serving is a cell-wise SUM, and the SUM
  is associative — folding epochs with the same aggregation preserves
  every downstream estimate exactly (``compact_cms_store`` keeps the
  per-cell ``hash_fn`` marker through the groupBy so family validation
  survives compaction).

Exactly-once is preserved for everything that happens AFTER a
compaction:

- the base partition is ``epoch=-1`` — foreachBatch epoch ids are
  non-negative and monotonically increasing, so no future trigger can
  ever collide with it (and re-compacting folds the previous base in);
- subsequent appends keep writing fresh ``epoch=<n>`` partitions from
  the stream's checkpoint; serving stays union/SUM over base + new;
- a replay can only re-run the checkpoint's in-flight (uncommitted)
  batch — by Structured Streaming's contract a COMMITTED epoch never
  fires again, so fold only epochs the checkpoint has committed: for an
  ``availableNow`` run that has terminated, that is all of them.  The
  replayed in-flight epoch overwrites its own (un-folded) partition
  exactly as before.

The swap itself is write-to-temp → rename old partitions to dot-prefixed
names (invisible to Spark's file index) → rename temp into place →
delete the dot-prefixed originals.  Deletion happens strictly AFTER the
base rename, so a crash mid-swap never loses data (either the dot-
prefixed originals or the base survive, recoverable by hand).  The swap
is still NOT atomic for concurrent readers: the rename loop is O(#parts)
cheap renames, and a reader listing inside that window can see a subset
of the old partitions with no base yet — the contract is single-writer
with no concurrent reader DURING the swap (trivially true between
``availableNow`` runs, the only supported schedule).  All directory
operations go through the Hadoop FileSystem API (streaming/stores.py),
so the same code is correct on local FS (the test environment — which
exercises the identical call path via Hadoop's LocalFileSystem) and on
HDFS / Hadoop-backed object stores, under the same single-maintainer
contract.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import stores

#: The partition every compaction folds into. Negative on purpose:
#: foreachBatch epochs are >= 0, so the base can never be overwritten by
#: a (replayed) trigger.
BASE_EPOCH = -1


def list_epoch_partitions(spark: SparkSession, path: str) -> list[str]:
    """Snapshot the ``epoch=*`` partition directory names under a store.
    Compactions that read-then-truncate (``compact_index_with_tombstones``)
    take this snapshot FIRST and pass it through, so an epoch written by
    a live feed between the read and the truncate survives untouched.
    One FileSystem listing (stores.py) — correct on local FS and
    cluster filesystems alike."""
    return stores.epoch_partitions(spark, path)


def compact_epoch_store(
    spark: SparkSession,
    path: str,
    fold: Callable[[DataFrame], DataFrame] | None = None,
    parts: list[str] | None = None,
) -> int:
    """Fold the ``epoch=*`` partitions under ``path`` (including a
    previous ``epoch=-1`` base) into a single fresh base partition.
    Returns the number of partitions folded.  ``fold`` post-processes
    the unioned rows (identity for row stores; cell-wise SUM for
    sketches) and must preserve the serving semantics — the tests pin
    serve-equality before/after for each store kind.

    ``parts`` restricts the fold to an explicit partition snapshot
    (names from :func:`list_epoch_partitions`): only those partitions
    are read, and only those are removed by the swap — epochs that
    appear after the snapshot survive as-is.  Requires the snapshot to
    cover any existing ``epoch={BASE_EPOCH}`` base (folding around the
    base would leave two bases).
    """
    snapshot_given = parts is not None
    if parts is None:
        parts = list_epoch_partitions(spark, path)
    if not parts:
        raise ValueError(f"no epoch partitions under {path}")
    base_dir = f"epoch={BASE_EPOCH}"
    if (
        snapshot_given
        and base_dir not in parts
        and stores.is_dir(spark, os.path.join(path, base_dir))
    ):
        raise ValueError(
            f"partition snapshot for {path} omits the existing {base_dir} "
            "base — folding around it would produce two bases"
        )
    if snapshot_given:
        df = spark.read.parquet(*[os.path.join(path, d) for d in parts])
        df = df.select([c for c in df.columns if c != "epoch"])
    else:
        df = spark.read.parquet(path).drop("epoch")
    if fold is not None:
        df = fold(df)
    tmp = os.path.join(path, ".compact_tmp")
    # a dot-prefixed dir is invisible to Spark's file index, so the fold
    # can be WRITTEN while the source partitions are still being READ —
    # no materialize-to-driver step, the swap below happens only after
    # the write (and its full upstream read) has finished
    df.write.mode("overwrite").parquet(tmp)
    # swap: drop a marker, rename originals away (cheap, recoverable),
    # install the new base, delete the originals, remove the marker.  A
    # crash at any point leaves either the dot-prefixed originals or
    # the installed base on disk, never neither — and while the marker
    # (or any ``.old_*`` dir) exists, every store listing
    # (stores.epoch_partitions) REFUSES to serve or re-swap the store
    # (ADVICE r11: the pre-marker guards saw a crashed-swap store as
    # "no epochs yet" and silently served an empty tombstone set).
    # recover_swap() rolls an interrupted swap forward or back,
    # classifying on .compact_tmp presence (the install IS the
    # tmp→base rename, so a surviving tmp means it never happened);
    # the base partition still renames FIRST so a mid-loop crash never
    # leaves two base-shaped dirs.
    marker = os.path.join(path, stores.SWAP_MARKER)
    stores.touch(spark, marker)
    for d in sorted(parts, key=lambda n: n != base_dir):
        stores.rename(
            spark, os.path.join(path, d), os.path.join(path, f".old_{d}")
        )
    stores.rename(spark, tmp, os.path.join(path, base_dir))
    for d in parts:
        stores.delete(spark, os.path.join(path, f".old_{d}"))
    stores.delete(spark, marker)
    spark.catalog.refreshByPath(path)
    return len(parts)


def recover_swap(spark: SparkSession, path: str) -> str:
    """Recover a store whose compaction crashed mid-swap (the state
    every listing refuses with "interrupted compaction swap").  Roll
    FORWARD when the new base was installed — delete the renamed-away
    originals and the marker, exactly what the crashed job would have
    done next; roll BACK otherwise — restore the original partition
    names and drop the half-written temp.  Either way the store serves
    exactly one consistent state afterwards; returns ``"completed"``,
    ``"rolled_back"``, or ``"clean"`` (nothing to do).  Same
    single-maintainer contract as the compaction itself."""
    arts = stores.swap_artifacts(spark, path)
    if not arts:
        return "clean"
    olds = [n for n in arts if n.startswith(".old_epoch=")]
    # classify on the TEMP dir, not the base: the install is the
    # tmp→base rename, so ".compact_tmp still present" ⟺ the install
    # never happened — whereas "a base exists" is ambiguous on a
    # previously-compacted store whose ORIGINAL epoch=-1 base is still
    # in place after a crash between the marker touch and the first
    # rename (the base-first rename ordering only disambiguates once
    # the loop has begun)
    if stores.is_dir(spark, os.path.join(path, ".compact_tmp")):
        for n in olds:
            stores.rename(
                spark,
                os.path.join(path, n),
                os.path.join(path, n.removeprefix(".old_")),
            )
        stores.delete(spark, os.path.join(path, ".compact_tmp"))
        action = "rolled_back"
    elif stores.is_dir(spark, os.path.join(path, f"epoch={BASE_EPOCH}")):
        for n in olds:
            stores.delete(spark, os.path.join(path, n))
        action = "completed"
    else:
        # no tmp (so the install should have happened) and no base:
        # not a state this swap can produce — refuse to guess
        raise ValueError(
            f"store {path} has swap artifacts {arts} but neither a "
            ".compact_tmp nor an installed base — manual inspection "
            "required"
        )
    stores.delete(spark, os.path.join(path, stores.SWAP_MARKER))
    spark.catalog.refreshByPath(path)
    return action


def retire_epochs(
    spark: SparkSession, path: str, before_epoch: int
) -> int:
    """RETENTION for windowed stores: delete every epoch partition with
    ``epoch < before_epoch`` outright — the maintenance twin of
    sliding-window serving (``cms_stream.serve_cms_topk(since_epoch=)``),
    where history outside the window must DISAPPEAR, not fold into a
    base (folding would silently re-enter the window's SUM forever).

    Refuses a store that already contains a folded ``epoch=-1`` base:
    full-history compaction destroys epoch provenance, so a store is
    either an all-history store (compact it) or a windowed store
    (retire it) — mixing the two is a configuration error this guard
    turns into a loud failure.  Retired epochs are committed history
    (same contract as compaction), so exactly-once for live epochs is
    untouched.  Returns the number of partitions deleted."""
    parts = {
        int(d.split("=", 1)[1]): d
        for d in stores.epoch_partitions(spark, path)
    }
    if not parts:
        raise ValueError(f"no epoch partitions under {path}")
    if BASE_EPOCH in parts:
        raise ValueError(
            f"store {path} contains a compacted epoch={BASE_EPOCH} base — "
            "it is an all-history store; retire_epochs is for windowed "
            "stores that never full-history-compact"
        )
    victims = [d for e, d in parts.items() if e < int(before_epoch)]
    if len(victims) == len(parts):
        raise ValueError(
            f"retire_epochs(before_epoch={before_epoch}) would empty "
            f"{path} (max live epoch {max(parts)}) — refusing"
        )
    for d in victims:
        stores.delete(spark, os.path.join(path, d))
    spark.catalog.refreshByPath(path)
    return len(victims)


def compact_index_with_tombstones(
    spark: SparkSession,
    codes_path: str,
    tombstones_path: str,
    id_col: str = "vec_id",
) -> tuple[int, int]:
    """PHYSICAL deletion — the maintenance job that turns serve-time
    tombstones into reclaimed storage (the Faiss ``remove_ids``
    rebuild / Delta ``VACUUM``-after-delete shape): fold the code store
    to its base partition with tombstoned rows REMOVED, then truncate
    the tombstone store to an empty base.

    CONTRACT: ``codes_path`` must hold ALL live code rows — the base
    build bootstraps the store as its ``epoch=-1`` partition and appends
    land as stream epochs.  (If any code rows lived outside the store,
    truncating the tombstones would silently lose the deletes against
    them.)

    Truncating the tombstones is not just cleanup — it is REQUIRED for
    re-insert correctness: serving computes ``codes ∖ tombstones``, so
    a tombstone that outlived its physical delete would wrongly
    suppress a later re-append of the same id (delete → re-add must
    serve the new row, exactly Faiss).  After this job the pair of
    stores serves bit-identically to the logical (anti-join) serve it
    replaced, new appends/deletes keep working from their checkpoints
    (fresh epochs never collide with the bases), and the dead rows'
    storage is actually gone.

    Returns (code partitions folded, tombstone partitions folded).
    Same committed-epoch contract as :func:`compact_epoch_store`: run
    it only when both streams' checkpoints have committed their epochs
    (always true between ``availableNow`` runs).  The tombstone store is
    SNAPSHOTTED up front and only the snapshotted partitions are read
    and later truncated — a tombstone epoch written by a live delete
    feed between the fold and the truncate survives unapplied (it keeps
    scrubbing at serve time and is reclaimed by the next compaction)
    instead of being destroyed."""
    tomb_parts = list_epoch_partitions(spark, tombstones_path)
    if not tomb_parts:
        raise ValueError(f"no epoch partitions under {tombstones_path}")
    # snapshot the CODE partitions too (ADVICE r11): an append epoch
    # landing between this listing and the fold's file-index creation
    # must survive as a live partition OUTSIDE the fold — an
    # unsnapshotted whole-path read could fold it into the base AND
    # leave it live, duplicating its rows
    code_parts = list_epoch_partitions(spark, codes_path)
    if not code_parts:
        raise ValueError(f"no epoch partitions under {codes_path}")
    # lazy is safe AND scale-right (no driver collect, anti-join shuffles
    # on the id key like every serve): the folded codes are fully WRITTEN
    # before compact_epoch_store touches any partition, the snapshotted
    # tombstone files still exist at fold time, and the tombstone store
    # is only rewritten by the second call below, strictly after
    dead = (
        spark.read.parquet(
            *[os.path.join(tombstones_path, d) for d in tomb_parts]
        )
        .select(id_col)
        .distinct()
    )

    def drop_dead(df: DataFrame) -> DataFrame:
        return df.join(dead, id_col, "left_anti")

    n_codes = compact_epoch_store(
        spark, codes_path, fold=drop_dead, parts=code_parts
    )
    # truncate ONLY the snapshotted tombstone partitions: same swap
    # dance, empty base; post-snapshot epochs are left in place
    n_tombs = compact_epoch_store(
        spark,
        tombstones_path,
        fold=lambda df: df.limit(0),
        parts=tomb_parts,
    )
    return n_codes, n_tombs


def compact_cms_store(spark: SparkSession, path: str) -> int:
    """Sketch-store flavor: fold epochs with the cell-wise SUM serving
    already applies (associative — estimates are bit-identical before
    and after), grouping by the ``hash_fn`` marker so family validation
    (``cms_stream.read_merged_sketch``) still works on the compacted
    store.  A mixed-family store compacts without merging across
    families and still fails validation at probe time, exactly as
    before."""

    def fold(df: DataFrame) -> DataFrame:
        keys = ["row", "bucket"] + (
            ["hash_fn"] if "hash_fn" in df.columns else []
        )
        return df.groupBy(*keys).agg(F.sum("n").cast("long").alias("n"))

    return compact_epoch_store(spark, path, fold=fold)
