"""Epoch-store filesystem layer — every epoch-keyed store operation
that touches directories (existence guards, epoch inventories, the
compaction swap, retention deletes) goes through the Hadoop FileSystem
API here instead of ``os``/``shutil``.

Why it matters at 100 TB: the epoch stores these modules maintain
(PQ code tables, LSH signature indexes, CMS sketches, packing offsets,
tombstone feeds) live wherever the stream's ``out_path`` points — on a
cluster that is HDFS or a Hadoop-backed object store, where
``os.listdir`` simply does not resolve.  ``Path.getFileSystem`` picks
the right implementation from the URI scheme (``file:`` in the test
environment, ``hdfs:``/``s3a:``/… on a cluster), so the SAME guard and
maintenance code is correct in both; the local tests run through the
identical call path (Hadoop's ``LocalFileSystem``), not a parallel
local branch.

Costs: each call is one py4j round-trip + one namenode/list operation —
metadata-priced, no Spark job.  This module is also where the r11
windowed-serving fix lives conceptually: serving windows take their
epoch inventory from ONE ``listStatus`` instead of a Spark job over
every live partition (SCALE.md §Round-11).
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath


#: Marker file a compaction creates before its rename swap and removes
#: after the post-install deletes: its presence (or a leftover
#: ``.old_epoch=*`` dir) means the store is mid-/crashed-swap and MUST
#: NOT be served or re-compacted until recovered.
SWAP_MARKER = ".compact_inprogress"


def swap_artifacts(spark: SparkSession, path: str) -> list[str]:
    """Names of interrupted-compaction artifacts under a store: the
    ``SWAP_MARKER`` file and any ``.old_epoch=*`` dirs.  A leftover
    ``.compact_tmp`` alone is NOT listed — a crash during the fold
    write leaves the source partitions fully intact (serving is
    unaffected) and the next compaction's overwrite replaces it."""
    fs, jpath = _fs_and_path(spark, path)
    if not fs.exists(jpath):
        return []
    found = []
    for st in fs.listStatus(jpath):
        name = st.getPath().getName()
        if name == SWAP_MARKER or name.startswith(".old_epoch="):
            found.append(name)
    return sorted(found)


def epoch_partitions(spark: SparkSession, path: str) -> list[str]:
    """The ``epoch=*`` partition directory NAMES under a store, from one
    FileSystem listing — [] for a missing or epoch-less store.  This is
    the snapshot compactions pass through (read-then-truncate safety:
    epochs appearing after the snapshot survive untouched).

    RAISES on a store left mid-swap by a crashed compaction (the
    ``SWAP_MARKER`` file or ``.old_epoch=*`` dirs present): every
    consumer of this listing — serve guards (``store_has_epochs``),
    windowed readers (``epoch_values``), retention and compaction
    entries — would otherwise act on a partial store.  The
    pre-marker behavior returned the partial listing, which made
    ``read_tombstones`` serve an EMPTY delete set after a crash
    between the rename-away and the base install.  (The artifact check
    shares this function's single ``listStatus`` — no extra round
    trip.)"""
    fs, jpath = _fs_and_path(spark, path)
    if not fs.exists(jpath):
        return []
    names = []
    arts = []
    for st in fs.listStatus(jpath):
        name = st.getPath().getName()
        if name == SWAP_MARKER or name.startswith(".old_epoch="):
            arts.append(name)
        elif st.isDirectory() and name.startswith("epoch="):
            names.append(name)
    if arts:
        raise RuntimeError(
            f"epoch store {path} holds an interrupted compaction swap "
            f"({sorted(arts)}) — a partial store must not be served "
            "(ADVICE r11: the guards would otherwise see an EMPTY "
            "tombstone store and silently resurrect deleted rows) or "
            "re-swapped; run "
            "streaming.compaction.recover_swap(spark, path) first"
        )
    return sorted(names)


def epoch_values(spark: SparkSession, path: str) -> list[int]:
    """Epoch numbers present in a store, sorted ascending."""
    return sorted(
        int(n.split("=", 1)[1]) for n in epoch_partitions(spark, path)
    )


def store_has_epochs(spark: SparkSession, path: str) -> bool:
    """True when an epoch-keyed store exists and holds >= 1 partition.
    Serve-path readers guard on this: a serve configured with a feed
    BEFORE its first epoch arrives must serve the empty/unscrubbed
    view, not raise."""
    return bool(epoch_partitions(spark, path))


def rename(spark: SparkSession, src: str, dst: str) -> None:
    """Directory rename through the store's FileSystem (atomic on HDFS
    and local FS; object stores without atomic rename inherit their
    committer's semantics — the compaction docstrings carry the
    single-maintainer contract either way)."""
    fs, jsrc = _fs_and_path(spark, src)
    jdst = spark._jvm.org.apache.hadoop.fs.Path(dst)
    if not fs.rename(jsrc, jdst):
        raise OSError(f"rename failed: {src} -> {dst}")


def delete(spark: SparkSession, path: str) -> None:
    """Recursive delete through the store's FileSystem."""
    fs, jpath = _fs_and_path(spark, path)
    if fs.exists(jpath) and not fs.delete(jpath, True):
        raise OSError(f"delete failed: {path}")


def touch(spark: SparkSession, path: str) -> None:
    """Create an empty file (marker) through the store's FileSystem."""
    fs, jpath = _fs_and_path(spark, path)
    fs.create(jpath, True).close()


def is_dir(spark: SparkSession, path: str) -> bool:
    fs, jpath = _fs_and_path(spark, path)
    return bool(fs.exists(jpath)) and bool(fs.getFileStatus(jpath).isDirectory())
