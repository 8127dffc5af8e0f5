"""Streaming spectrum maintenance — the online half of the embedding
drift monitor (queries/opq_ops.py::embedding_drift_components is the
batch half).

Each micro-batch computes its OWN exact top component (the
bit-reproducible power iteration of operators/ml.py — a batch inside
``foreachBatch`` is an ordinary DataFrame, so the driver-loop iterative
operator runs unchanged) and writes it epoch-partitioned: d+0 rows per
epoch, no state store, no watermark, and a replayed epoch overwrites
its own partition — the epoch-keyed exactly-once scheme shared by
cms_stream / dedup_index / decontam_stream.  Serving reads the bounded
(epochs × d)-row store and reports consecutive-epoch drift angles
driver-side.

At 100 TB / unbounded streams: per-trigger cost is n_iter × (one
accumulator pass over the BATCH, not the history); the store grows by
d rows per epoch.  Drift between epochs is the angle between exact
per-epoch components — batch-content-deterministic, so replays and
re-ingests cannot move a reported angle (stream==batch incl. replay
tested).

DRIFT→REINDEX recipe (the monitor's consumer): run this stream beside
an OPQ index (queries/opq_ops.py); while consecutive-epoch angles stay
under a threshold (~20°) keep serving through the frozen
rotation+codebooks — refits are expensive artifacts; when an epoch
trips the threshold, refit ``power_iteration_components`` →
``opq_householders`` → ``pq_fit`` on the drifted data and re-encode.
Measured on a planted-drift tile (fresh dominant directions orthogonal
to the build's): frozen-artifact ADC recall@10 degrades to 0.31, the
refit recovers 0.86 — the whole recipe is pinned end-to-end in
tests/test_opq.py::test_drift_triggered_reindex_recovers_recall.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession

from ..operators.ml import power_iteration_top_component
from ..schemas import EMBEDDINGS_SCHEMA


def run_spectrum_stream(
    spark: SparkSession,
    emb_dir: str,
    out_path: str,
    checkpoint: str,
    n_iter: int = 3,
    q_scale: int = 1_000_000,
    max_files_per_trigger: int = 1,
) -> None:
    """Drive the per-epoch spectrum over current files: one exact top
    component per micro-batch, written under ``epoch=<n>`` as
    (dim, comp_micro) in the established integer micro-unit form."""

    def step(batch: DataFrame, epoch: int) -> None:
        comp = power_iteration_top_component(
            batch, n_iter=n_iter, q_scale=q_scale
        )
        spark.createDataFrame(
            [(j, math.floor(c * 1_000_000 + 0.5)) for j, c in enumerate(comp)],
            "dim: bigint, comp_micro: bigint",
        ).write.mode("overwrite").parquet(f"{out_path}/epoch={epoch}")

    q = (
        spark.readStream.schema(EMBEDDINGS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(emb_dir)
        .writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def drift_report(spark: SparkSession, out_path: str) -> list[dict]:
    """Consecutive-epoch drift: [(epoch_a, epoch_b, dot_micro,
    angle_centideg)] from the stored per-epoch components — a bounded
    (epochs × d)-row read, everything else driver-side deterministic
    float math on the agreed micro-unit integers (both engines would
    read the same store; there is nothing distributed left to check)."""
    rows = spark.read.parquet(out_path).collect()  # bounded: epochs × d
    comps: dict[int, dict[int, int]] = {}
    for r in rows:
        comps.setdefault(int(r["epoch"]), {})[int(r["dim"])] = int(
            r["comp_micro"]
        )
    report = []
    for a, b in zip(sorted(comps), sorted(comps)[1:]):
        va, vb = comps[a], comps[b]
        dot = sum(va[j] * vb.get(j, 0) for j in sorted(va)) / 1e12
        dot = max(-1.0, min(1.0, dot))
        report.append(
            {
                "epoch_a": a,
                "epoch_b": b,
                "dot_micro": math.floor(abs(dot) * 1_000_000 + 0.5),
                "angle_centideg": math.floor(
                    math.degrees(math.acos(abs(dot))) * 100 + 0.5
                ),
            }
        )
    return report
