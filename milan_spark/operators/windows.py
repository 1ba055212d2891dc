"""Time and record-count windows (SURVEY.md §2.5).

Reference semantics (doc/Milan Operations.md:7-25, IR
``program/GroupingExpressions.scala:104-245``):

- TumblingWindow(dateExtractor, period, offset) — epoch-aligned, shifted.
- SlidingWindow(dateExtractor, size, slide, offset) — a record falls in
  size/slide windows.
- SlidingRecordWindow(n) — last-N-records per group key
  (``flink/generator/RecordWindowGenerator.scala:19`` keeps a priority queue;
  here a plain ``rowsBetween`` frame).

Spark realization: ``F.window(ts, size, slide, offset)`` — the window-start
struct field is the group key passed to the aggregate select, matching the
reference's "group key = window start Instant"
(doc/Streams in Milan and streaming operations.md:70-71). Watermarks (the
reference fixes delay = window size, WindowedStreamsGenerator.scala:129-130)
map to ``withWatermark(ts, size)`` in the streaming backend.

Session windows don't exist in the reference; ``session_window_agg`` exposes
Spark's native one as an exceeds-parity operator.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window as W, functions as F

from milan_spark.session import SEQ_COL


def tumbling_window(
    df: DataFrame,
    ts: str | Column,
    period: str,
    *,
    offset: str | None = None,
    keys: Sequence[str] = (),
    aggs: Sequence[Column] = (),
    start_alias: str = "window_start",
) -> DataFrame:
    """Milan TumblingWindow (GroupingExpressions.scala:173, lang/Stream.scala:207).

    Groups by the window-start timestamp (+ optional group keys) and applies
    the aggregate Columns. Offset shifts window boundaries like the
    reference's epoch-aligned offset parameter.
    """
    return sliding_window(
        df, ts, size=period, slide=period, offset=offset, keys=keys, aggs=aggs, start_alias=start_alias
    )


def sliding_window(
    df: DataFrame,
    ts: str | Column,
    size: str,
    slide: str,
    *,
    offset: str | None = None,
    keys: Sequence[str] = (),
    aggs: Sequence[Column] = (),
    start_alias: str = "window_start",
) -> DataFrame:
    """Milan SlidingWindow (GroupingExpressions.scala:245): every record lands
    in ``size/slide`` windows; Spark's ``F.window`` generates the window
    assignment natively (no explode needed — the TimeWindowing rule expands
    sliding windows inside Catalyst).
    """
    ts = F.col(ts) if isinstance(ts, str) else ts
    win = F.window(ts, size, slide, offset) if offset else F.window(ts, size, slide)
    grouped = df.groupBy(win.alias("__w"), *keys)
    out = grouped.agg(*aggs)
    return out.select(F.col("__w.start").alias(start_alias), *keys, *[c for c in out.columns if c not in ("__w", *keys)])


def record_window(
    df: DataFrame,
    n: int,
    aggs: dict[str, Column],
    *,
    keys: Sequence[str] = (),
    seq: str = SEQ_COL,
) -> DataFrame:
    """Milan SlidingRecordWindow — last N records per key
    (GroupingExpressions.scala:104, lang/GroupedStream.scala:46).

    For each arriving record, evaluates each named aggregate Column over the
    trailing N-record frame (inclusive). The reference maintains a per-key
    priority queue (PriorityQueueTypeInformation.scala:1); the batch plan is a
    single sort per key with a bounded ``rowsBetween`` frame — bounded memory
    at any scale.
    """
    part = W.partitionBy(*keys) if keys else W.partitionBy(F.lit(1))
    frame = part.orderBy(seq).rowsBetween(-(n - 1), 0)
    out = df
    for name, agg in aggs.items():
        out = out.withColumn(name, agg.over(frame))
    return out


def session_window_agg(
    df: DataFrame,
    ts: str | Column,
    gap: str,
    *,
    keys: Sequence[str] = (),
    aggs: Sequence[Column] = (),
    start_alias: str = "session_start",
    end_alias: str = "session_end",
) -> DataFrame:
    """Session windows (exceeds-parity; absent in the reference — SURVEY §2.5)."""
    ts = F.col(ts) if isinstance(ts, str) else ts
    grouped = df.groupBy(F.session_window(ts, gap).alias("__w"), *keys)
    out = grouped.agg(*aggs)
    return out.select(
        F.col("__w.start").alias(start_alias),
        F.col("__w.end").alias(end_alias),
        *keys,
        *[c for c in out.columns if c not in ("__w", *keys)],
    )
