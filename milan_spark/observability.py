"""Observability: per-stream metrics and record lineage (SURVEY.md §2.9).

Reference surface → here:

- ``MetricDefinition`` / ``HistogramDefinition`` per stream
  (milan-lang/.../application/metrics/HistogramDefinition.scala:25; counters
  inside operator runtimes, LeftJoinKeyedCoProcessFunction.scala:16-18) →
  :func:`observe` on any DataFrame: metric expressions ride the existing plan
  via ``Dataset.observe`` — computed during the action that runs anyway, no
  extra pass, and delivered through Spark's observation mechanism (works for
  batch actions and per-microbatch in streaming via QueryListener).
- record lineage (``flink/internal/LineageRecordFactory.scala:1``,
  ``milan-lang/.../types/RecordPointer.scala``: every record gets a recordId,
  joins/maps emit LineageRecords) → :func:`with_record_id` +
  :func:`lineage_edges`: deterministic content-hash ids and an edge DataFrame
  (output_id → input_id) derived from any operator output that kept its
  inputs' id columns. Edges are data, not a side output — at scale they are
  written like any other sink.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Observation, functions as F

RECORD_ID = "__record_id"


def observe(df: DataFrame, name: str, **metrics: Column) -> tuple[DataFrame, Observation]:
    """Attach named metric aggregates to a plan (ref: MetricDefinition;
    the reference's operator counters like 'left_input_record_count').

    Returns (df, observation); after any action on ``df``,
    ``observation.get`` holds {metric: value} — counters and histograms cost
    one traversal shared with the action itself.

    >>> df, obs = observe(src, "ingest", n=F.count(F.lit(1)),
    ...                   p95=F.percentile_approx("value", 0.95))
    >>> df.write.parquet(...); obs.get["n"]
    """
    ob = Observation(name)
    out = df.observe(ob, *[m.alias(a) for a, m in metrics.items()])
    return out, ob


def counter(col: str | Column | None = None) -> Column:
    """Record counter (ref: the per-operator recordCount counters)."""
    return F.count(F.lit(1)) if col is None else F.count(col)


def histogram(col: str | Column, percentiles: Sequence[float] = (0.5, 0.9, 0.99)) -> Column:
    """Value-distribution metric (ref: HistogramDefinition.scala:25)."""
    return F.percentile_approx(col, list(percentiles))


def with_record_id(df: DataFrame, *cols: str, alias: str = RECORD_ID) -> DataFrame:
    """Append a deterministic record id: xxhash64 over ``cols`` (all columns
    when omitted). Content-derived, so ids are stable across retries and
    partitionings — unlike the reference's per-run UUIDs, replays don't fork
    lineage.
    """
    use = list(cols) if cols else list(df.columns)
    return df.withColumn(alias, F.xxhash64(*use))


def lineage_edges(
    out_df: DataFrame,
    out_id: str | Column,
    in_ids: Sequence[str | Column],
    op_name: str,
) -> DataFrame:
    """(output_id, input_id, op) edge list for an operator whose output rows
    kept their inputs' record-id columns (enrichment joins and maps do —
    ref: joins emit a LineageRecord per output pairing the consumed records,
    LineageRecordFactory.scala:1).

    Null input ids (e.g. the unmatched side of an enrichment join) produce no
    edge, matching the reference's absent-pointer behavior.
    """
    oid = F.col(out_id) if isinstance(out_id, str) else out_id
    edges = None
    for iid in in_ids:
        ic = F.col(iid) if isinstance(iid, str) else iid
        e = out_df.select(
            oid.alias("output_id"), ic.alias("input_id"), F.lit(op_name).alias("op")
        ).filter(F.col("input_id").isNotNull())
        edges = e if edges is None else edges.unionByName(e)
    return edges
