"""Event-driven incremental ETL as a checkpointed file-source stream.

Reference semantics (README.md:42-44): new file in raw_data/to_processed/
triggers the transform; consumed files move to already_processed/. With a
Structured Streaming file source + checkpoint the archive step becomes
unnecessary — the checkpoint IS the processed-file ledger (exactly-once,
SURVEY.md S9/T2) — and ``Trigger.AvailableNow`` gives the same
run-to-completion batches the Lambda had (T1).

The silver upsert runs in ``foreachBatch`` via latest-wins merge. Snapshot
isolation on plain parquet: each epoch writes a fresh snapshot directory and
flips a pointer file (at 100 TB you'd swap this sink for Delta/Iceberg MERGE
— same logical plan, transactional commit instead of pointer flip).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from ..etl.incremental import upsert
from ..etl.normalize import normalize_documents
from ..schemas import RAW_PLAYLIST_SCHEMA

SILVER_TABLES = ("albums", "artists", "songs")
_PKS = {"albums": "album_id", "artists": "artist_id", "songs": "song_id"}


def read_bronze_stream(spark: SparkSession, bronze_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(RAW_PLAYLIST_SCHEMA)
        .option("multiLine", True)
        .option("maxFilesPerTrigger", 100)
        .json(bronze_dir)
    )


def _pointer_path(root: str, table: str) -> str:
    return os.path.join(root, table, "_CURRENT")


def read_silver(spark: SparkSession, root: str, table: str) -> DataFrame | None:
    ptr = _pointer_path(root, table)
    if not os.path.exists(ptr):
        return None
    with open(ptr, encoding="utf-8") as fh:
        snap = fh.read().strip()
    return spark.read.parquet(os.path.join(root, table, snap))


def _pointer_epoch(root: str, table: str) -> int | None:
    ptr = _pointer_path(root, table)
    if not os.path.exists(ptr):
        return None
    with open(ptr, encoding="utf-8") as fh:
        return int(fh.read().strip().removeprefix("snap_"))


def _write_snapshot(df: DataFrame, root: str, table: str, epoch_id: int) -> None:
    snap = f"snap_{epoch_id:020d}"
    df.write.mode("overwrite").parquet(os.path.join(root, table, snap))
    tmp = _pointer_path(root, table) + ".tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        fh.write(snap)
    os.replace(tmp, _pointer_path(root, table))  # atomic pointer flip
    _gc_snapshots(root, table, keep=2)


def _gc_snapshots(root: str, table: str, keep: int) -> None:
    """Delete superseded snapshots (keep the newest ``keep`` for in-flight
    readers) — without this, disk grows as epochs × full-table size."""
    tdir = os.path.join(root, table)
    snaps = sorted(d for d in os.listdir(tdir) if d.startswith("snap_"))
    for old in snaps[:-keep]:
        shutil.rmtree(os.path.join(tdir, old), ignore_errors=True)


def bronze_to_silver_batch(
    spark: SparkSession, batch: DataFrame, silver_root: str, epoch_id: int
) -> None:
    """One micro-batch: normalize the new documents, merge into silver.

    foreachBatch is at-least-once: after a crash between the pointer flip
    and the checkpoint commit, the SAME epoch replays — and would read the
    snapshot it is about to overwrite. Tables whose pointer already records
    this (or a later) epoch are therefore skipped: the pointer flip is the
    per-table commit marker that makes the replay a no-op.
    """
    tables = normalize_documents(batch)
    for name in SILVER_TABLES:
        applied = _pointer_epoch(silver_root, name)
        if applied is not None and applied >= epoch_id:
            continue  # this epoch already committed for this table
        increment = tables[name]
        existing = read_silver(spark, silver_root, name)
        merged = (
            increment
            if existing is None
            else upsert(increment, existing, _PKS[name])
        )
        _write_snapshot(merged, silver_root, name, epoch_id)


def run_incremental(
    spark: SparkSession, bronze_dir: str, silver_root: str, checkpoint: str
) -> None:
    """Process all currently-available bronze files exactly once, then stop.

    Re-running after new files land processes ONLY the new files (the
    checkpoint remembers consumed ones) — the reference's event-driven
    incremental contract without any archive move.
    """
    stream = read_bronze_stream(spark, bronze_dir)
    query = (
        stream.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", checkpoint)
        .foreachBatch(
            lambda batch, epoch: bronze_to_silver_batch(
                spark, batch, silver_root, epoch
            )
        )
        .start()
    )
    query.awaitTermination()
