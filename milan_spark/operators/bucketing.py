"""Bucketed-table layout for co-located (shuffle-free) joins (SCALE.md).

The reference leaves physical layout to Flink's runtime partitioning; on
Spark the equivalent *persistent* optimization is bucketing: write both fact
tables bucketed-and-sorted on the join key, and every subsequent equi-join
or aggregation on that key plans with ZERO exchanges — the scan itself
reports the hash partitioning. On a 100 TB pipeline that is the difference
between re-shuffling the fact table per query and never shuffling it at all;
bucketing is THE tool for join keys that recur across a query workload
(user_id, doc_id), complementing `broadcast()` (small dims) and AQE
(one-shot skew).

Rules encoded here:
- bucket counts must MATCH on both sides (or one be a divisor) for a
  co-located plan; pick a power of two sized so one bucket of the larger
  table fits an executor core (~128-256 MB);
- sort within buckets by the join key: the sort-merge join then skips its
  sort too (scan order satisfies the requirement);
- bucket pruning: equality predicates on the bucket column read 1/n of the
  files (Spark's FileSourceScanExec bucket pruning).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    *,
    sort_cols: Sequence[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) table.

    ``sort_cols`` defaults to the bucket columns — the layout that lets a
    later sort-merge join skip both the exchange AND the sort.
    """
    if isinstance(bucket_cols, str):
        bucket_cols = [bucket_cols]
    sort_cols = list(sort_cols) if sort_cols is not None else list(bucket_cols)
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table_name)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on, how: str = "inner"
) -> DataFrame:
    """Join two tables bucketed on the join key — plans with no Exchange on
    either side (verified by ``tests/test_bucketing.py``)."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
