"""Regular-grid time-series repair: gap filling, forward fill, and linear
interpolation (beyond the reference — Milan windows aggregate events that
EXIST; a metrics/feature pipeline also needs the buckets that DON'T, since
"no data point this hour" and "value was 0 this hour" are different facts,
and downstream models consume fixed-frequency series).

Design for scale:

- ``gap_fill`` builds each key's dense grid with ``sequence()`` + explode —
  pure JVM generators, O(buckets) rows, no driver loop and no cross-join
  against a global calendar (the usual small-data recipe, which at 100 TB
  would manufacture |keys| x |global range| rows even for keys that lived
  a day). The observed-bucket join is per-key equi-join, one shuffle on
  (key, bucket), and the grid side is generated ALREADY keyed so it
  co-shuffles with the data rather than broadcasting a calendar.
- ``forward_fill`` / ``interpolate_linear`` are single window passes per
  key ordered by time (``last(ignorenulls)`` / ``first(ignorenulls)``) —
  Spark's frame-bounded window exec streams each partition once; no
  self-join, no UDF. Monotonic frames (unbounded-preceding / -following)
  are O(n) per key.
- A key's grid length is bounded by ITS OWN [min, max] span; one immortal
  key cannot inflate every other key's series. Skew from one very
  long-lived key lands in one partition — the documented mitigation is
  range-bucketing that key's grid by time (split the sequence), which
  composes with these operators since all of them are per-(key, bucket).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window as W, functions as F

from milan_spark.errors import require_columns, require_temporal


def time_bucket(ts: Column | str, step_seconds: int) -> Column:
    """Floor a timestamp to a ``step_seconds`` grid (epoch-aligned)."""
    c = F.col(ts) if isinstance(ts, str) else ts
    secs = F.unix_timestamp(c)
    return F.timestamp_seconds(secs - secs % step_seconds)


def gap_fill(
    df: DataFrame,
    keys: Sequence[str],
    ts: str,
    step_seconds: int,
    aggs: dict[str, Column],
    *,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Aggregate onto a regular ``step_seconds`` grid and DENSIFY it: every
    key gets one row per bucket between its own first and last observation,
    with NULL aggregate values in empty buckets (the caller decides whether
    a gap means 0, forward-fill, or interpolate — conflating them here is
    the classic silent-wrong-metric bug).

    ``aggs`` maps output column name -> aggregate Column over the bucket's
    rows. Two shuffles total (bucket aggregate, grid left-join), both on
    (keys, bucket).
    """
    require_columns("gap_fill", df, [*keys, ts])
    require_temporal("gap_fill", df, ts)
    b = time_bucket(ts, step_seconds)
    observed = (
        df.withColumn(bucket_col, b)
        .groupBy(*keys, bucket_col)
        .agg(*[c.alias(n) for n, c in aggs.items()])
    )
    grid = (
        observed.groupBy(*keys)
        .agg(
            F.min(bucket_col).alias("__lo"), F.max(bucket_col).alias("__hi")
        )
        .select(
            *keys,
            F.explode(
                F.sequence(
                    "__lo", "__hi",
                    F.expr(f"INTERVAL {int(step_seconds)} SECONDS"),
                )
            ).alias(bucket_col),
        )
    )
    return grid.join(observed, [*keys, bucket_col], "left")


def forward_fill(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    cols: Sequence[str],
    *,
    suffix: str = "_ffill",
) -> DataFrame:
    """Per key, replace NULLs in ``cols`` with the most recent non-NULL
    value in ``order_col`` order (rows before the first observation stay
    NULL). One window pass; emits ``<col><suffix>`` beside the original."""
    require_columns("forward_fill", df, [*keys, order_col, *cols])
    w = (
        W.partitionBy(*keys)
        .orderBy(order_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    out = df
    for c in cols:
        out = out.withColumn(
            f"{c}{suffix}", F.last(c, ignorenulls=True).over(w)
        )
    return out


def interpolate_linear(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    *,
    out_col: str | None = None,
) -> DataFrame:
    """Per key, fill NULL values by linear interpolation between the
    nearest preceding and following non-NULL observations (times from
    ``ts_col``); edges beyond the first/last observation fall back to the
    one-sided neighbor. Two monotonic window passes (prev/next), pure
    column algebra — the formula every engine evaluates identically, so
    it stays oracle-checkable."""
    require_columns("interpolate_linear", df, [*keys, ts_col, value_col])
    out_col = out_col or f"{value_col}_interp"
    wp = (
        W.partitionBy(*keys)
        .orderBy(ts_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wn = (
        W.partitionBy(*keys)
        .orderBy(ts_col)
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    v = F.col(value_col)
    t = F.unix_timestamp(ts_col).cast("double")
    tv = F.when(v.isNotNull(), t)
    prev_v = F.last(v, ignorenulls=True).over(wp)
    prev_t = F.last(tv, ignorenulls=True).over(wp)
    next_v = F.first(v, ignorenulls=True).over(wn)
    next_t = F.first(tv, ignorenulls=True).over(wn)
    interp = prev_v + (next_v - prev_v) * (t - prev_t) / (next_t - prev_t)
    filled = (
        F.when(v.isNotNull(), v)
        .when(prev_v.isNull(), next_v)
        .when(next_v.isNull(), prev_v)
        .when(next_t == prev_t, prev_v)
        .otherwise(interp)
    )
    return df.withColumn(out_col, filled)
