"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.8 extension; the PySpark arbitrary-state API).

Built-in windowed aggregations cover time buckets; anything with bespoke
per-key state machines (running totals with alert thresholds, fraud
counters, feature freshness) needs the arbitrary-stateful operator. The
example here keeps one running (count, sum) per user and emits the updated
totals for every micro-batch the user appears in, evicting state for users
idle past a processing-time timeout — the canonical bounded-state pattern
for an unbounded keyspace (at 100 TB/day the timeout IS the memory bound).

State is a tuple in a ``GroupState``; rows stream through Arrow batches.
Batch-equivalence (availableNow over the fixture == groupBy on the same
data) is asserted in tests — the operator is deliberately deterministic so
that check is exact.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

STATE_SCHEMA = "n LONG, total DOUBLE"


def _make_update_fn(idle_timeout_ms: int | None):
    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            # idle key: evict state, emit nothing
            state.remove()
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [round(total, 2)],
            }
        )

    return update


def running_user_totals(
    events: DataFrame, idle_timeout_ms: int | None = None
) -> DataFrame:
    """Per-user running (count, sum(value)) arbitrary-stateful operator.

    ``idle_timeout_ms`` turns on processing-time state eviction — the
    memory bound for an unbounded keyspace on a continuous stream. Leave it
    off (default) for run-to-completion ``availableNow`` jobs: a pending
    timeout keeps the query alive waiting to fire it, so bounded runs would
    never terminate.
    """
    timeout = (
        GroupStateTimeout.NoTimeout
        if idle_timeout_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return events.groupBy("user_id").applyInPandasWithState(
        _make_update_fn(idle_timeout_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )


try:  # Spark ≥ 4.0; gated so loading this module never requires it
    from pyspark.sql.streaming import StatefulProcessor as _StatefulProcessorBase
except ImportError:  # pragma: no cover - not reachable on pinned pyspark
    _StatefulProcessorBase = object


class _RunningTotalsProcessor(_StatefulProcessorBase):
    """Spark 4 ``StatefulProcessor`` computing the same per-user running
    (count, sum) as :func:`running_user_totals` — the transformWithState
    successor API: named typed state slots (value/list/map) with built-in
    TTL instead of a single tuple + manual timeout choreography.
    """

    def __init__(self, ttl_ms: int | None = None):
        self._ttl = ttl_ms

    def init(self, handle) -> None:
        # TTL replaces the manual setTimeoutDuration/remove dance of the
        # GroupState version: state for idle users expires server-side.
        self._totals = handle.getValueState(
            "totals", STATE_SCHEMA, ttlDurationMs=self._ttl
        )

    def handleInputRows(self, key, rows, timer_values):
        n, total = self._totals.get() if self._totals.exists() else (0, 0.0)
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
        self._totals.update((n, total))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [round(total, 2)],
            }
        )

    def close(self) -> None:
        pass


def running_user_totals_tws(
    events: DataFrame, ttl_ms: int | None = None
) -> DataFrame:
    """Per-user running totals on the ``transformWithStateInPandas`` API
    (Spark 4's arbitrary-state operator). Semantically identical to
    :func:`running_user_totals`; equivalence of the two APIs AND the batch
    groupBy is asserted in tests/test_streaming.py — the migration-path
    proof that bespoke state machines carry over unchanged.

    Runtime requirements beyond Spark ≥ 4.0: the RocksDB state store
    provider and the ``protobuf`` Python package (the state-server wire
    protocol) — the latter is absent from this build container, so the
    equivalence test skips with the boundary documented; the
    ``applyInPandasWithState`` twin above carries the executed coverage.
    """
    if _StatefulProcessorBase is object:
        raise NotImplementedError(
            "transformWithStateInPandas requires Spark >= 4.0"
        )
    return events.groupBy("user_id").transformWithStateInPandas(
        _RunningTotalsProcessor(ttl_ms),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="update",
        timeMode="none",
    )


# --- per-user rolling EMA (order-sensitive frame state) ----------------------
EMA_OUTPUT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("ema8", DoubleType()),
    ]
)

EMA_STATE_SCHEMA = "vals ARRAY<DOUBLE>"


def _make_ema_update_fn(n_window: int, idle_timeout_ms: int | None):
    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        hist = list(state.get[0]) if state.exists else []
        pdf = pd.concat(list(pdfs), ignore_index=True)
        # order-sensitive operator: impose (ts, event_id) order inside the
        # batch; cross-batch correctness holds when batch boundaries are
        # event-time ordered (exact under availableNow replay, and under a
        # watermarked source that releases batches in order)
        pdf = pdf.sort_values(["ts", "event_id"])
        ids: list[int] = []
        emas: list[float] = []
        for ev, cents in zip(pdf["event_id"], pdf["cents"]):
            hist.append(float(cents))
            if len(hist) > n_window:
                hist = hist[-n_window:]
            n = len(hist)
            # oldest->newest fold, weight 0.5^(n-1-i): same order and the
            # same exact dyadic terms as the batch twin's aggregate(); the
            # sum is exact, so stream==batch is byte-identical
            ema = 0.0
            for i, v in enumerate(hist):
                ema += v * 2.0 ** (i + 1 - n)
            ids.append(int(ev))
            emas.append(ema)
        state.update((hist,))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {"event_id": ids, "user_id": [key[0]] * len(ids), "ema8": emas}
        )

    return update


def rolling_user_ema(
    events: DataFrame, n_window: int = 8, idle_timeout_ms: int | None = None
) -> DataFrame:
    """Streaming twin of the ``events_ema_value`` catalog query: per-user
    finite-window EMA (decay 0.5, newest weight 1) as an arbitrary-stateful
    operator whose state is the last ``n_window`` quantized values.

    The frame state is O(n_window) doubles per active user —
    ``idle_timeout_ms`` bounds the keyspace exactly like
    :func:`running_user_totals`. Quantization (``floor(value*100 + 0.5)``)
    happens Spark-side before the Python boundary so both twins consume
    identical doubles.
    """
    prepped = events.select(
        "event_id",
        "user_id",
        "ts",
        (F.floor(F.col("value") * 100 + F.lit(0.5))).cast("double").alias("cents"),
    )
    timeout = (
        GroupStateTimeout.NoTimeout
        if idle_timeout_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return prepped.groupBy("user_id").applyInPandasWithState(
        _make_ema_update_fn(n_window, idle_timeout_ms),
        outputStructType=EMA_OUTPUT_SCHEMA,
        stateStructType=EMA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )
