"""As-of (point-in-time) join — an operator Spark's DataFrame API lacks.

``asof_join(left, right, ...)`` attaches, to every left row, the payload of
the latest right row with ``right_ts <= left_ts`` within the same key group
(the financial "last tick at or before t" join; DuckDB/Pandas ``ASOF JOIN``).

Implementation is the sort-based union trick, not a range join:

1. union left and right rows into one stream tagged by side
   (right sorts *before* left at equal timestamps, giving the
   at-or-before semantics);
2. one window over ``(key ORDER BY ts, side, seq)`` takes
   ``last(right_payload, ignorenulls=True)`` — each left row sees exactly
   the most recent right payload at or before it;
3. keep the left rows.

Scale: exactly ONE shuffle, on the join key — same exchange a plain
equi-join would need — and the per-key sort is what any time-series layout
wants anyway (at 100 TB the input is typically already bucketed+sorted by
(key, ts), making this shuffle-free). A naive implementation as
``left.join(right, key AND right_ts <= left_ts)`` + max-window explodes to
O(|matches|) intermediate rows and is quadratic on hot keys; this one is
O(|left| + |right|).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_values: list[str],
    tiebreak: str | None = None,
    how: str = "inner",
    direction: str = "backward",
    tolerance: int | None = None,
) -> DataFrame:
    """Point-in-time join (pandas ``merge_asof`` surface).

    ``direction='backward'`` (default): latest right row at-or-before the
    left timestamp. ``direction='forward'``: earliest right row
    at-or-after it. ``tolerance`` bounds the match gap — in microseconds
    for timestamp keys, in the column's own units for numeric keys; an
    over-tolerance match behaves as no match.

    Returns all left columns plus ``right_values`` (null-filled for
    unmatched left rows when ``how='left'``; unmatched rows dropped when
    ``how='inner'``). ``tiebreak`` orders simultaneous right rows (the one
    sorting LAST wins) so results are deterministic under ts collisions.

    Either direction is the same single-shuffle union+window plan — the
    forward pass just orders the window by descending timestamp, so the
    running ``last()`` sees the *smallest* at-or-after right row.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how={how!r}")
    if direction not in ("backward", "forward"):
        raise ValueError(f"unsupported direction={direction!r}")
    if tolerance is not None and tolerance < 0:
        # gap >= 0 always holds, so a negative bound would silently match
        # nothing; fail loudly like pandas merge_asof does
        raise ValueError(f"tolerance must be non-negative, got {tolerance}")

    lcols = left.columns
    rv_cols = [F.col(c) for c in right_values]
    if tolerance is not None:
        # carry the matched right timestamp for the gap check
        rv_cols.append(F.col(right_ts).alias("__rts"))
    payload = F.struct(*rv_cols).alias("_rv")
    seq = F.col(tiebreak) if tiebreak else F.lit(0)

    # side: right=0 sorts before left=1 at equal ts ⇒ '<=' semantics.
    r = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        seq.alias("_seq"),
        payload,
        *[F.lit(None).alias(f"_l_{c}") for c in lcols],
    )
    l = left.select(
        *[F.col(c) for c in on],
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_seq"].dataType).alias("_seq"),
        F.lit(None).cast(r.schema["_rv"].dataType).alias("_rv"),
        *[F.col(c).alias(f"_l_{c}") for c in lcols],
    )
    ts_order = F.col("_ts") if direction == "backward" else F.col("_ts").desc()
    w = (
        Window.partitionBy(*on)
        .orderBy(ts_order, "_side", "_seq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = (
        r.unionByName(l)
        .withColumn("_match", F.last("_rv", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    if tolerance is not None:
        lt, rt = F.col("_ts"), F.col("_match").getField("__rts")
        from pyspark.sql.types import TimestampNTZType, TimestampType

        ts_type = merged.schema["_ts"].dataType
        if isinstance(ts_type, (TimestampType, TimestampNTZType)):
            lt = F.unix_micros(lt.cast("timestamp"))
            rt = F.unix_micros(rt.cast("timestamp"))
        gap = (lt - rt) if direction == "backward" else (rt - lt)
        merged = merged.withColumn(
            "_match", F.when(gap <= F.lit(tolerance), F.col("_match"))
        )
    if how == "inner":
        merged = merged.filter(F.col("_match").isNotNull())
    out_left = [F.col(f"_l_{c}").alias(c) for c in lcols]
    out_right = [F.col("_match").getField(c).alias(c) for c in right_values]
    return merged.select(*out_left, *out_right)
