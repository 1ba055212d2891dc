"""Skew mitigation utilities (SURVEY.md §4 'physical: partitioning/shuffle').

The reference has no answer to key skew — Flink ``keyBy`` hashes whatever the
key distribution is, and hot keys serialize onto one subtask. Here AQE's
skew-join splitting (`spark.sql.adaptive.skewJoin`, on by default in
``session.get_spark``) handles sort-merge joins at runtime; these helpers
cover the cases AQE does not:

- :func:`salted_join` — broadcast-averse joins where one side's hot keys
  would overwhelm single tasks even after AQE splitting (AQE can split the
  probe side's partitions but replicating the build side requires the salt).
- :func:`salted_aggregate` — holistic aggregates (collect_list/set, exact
  distinct) on hot keys. Algebraic aggregates (sum/count/min/max/avg) do NOT
  need this: Catalyst's partial aggregation already combines map-side.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F

SALT_COL = "__salt"


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str | Sequence[str],
    *,
    salt: int = 8,
    how: str = "inner",
    salt_from: str | Column | None = None,
) -> DataFrame:
    """Equi-join with the large side's rows spread across ``salt`` shards and
    the small side replicated ``salt`` times, so a hot key occupies ``salt``
    tasks instead of one.

    The shard id is content-derived (xxhash64 of ``salt_from``, defaulting to
    all of the large side's columns) — deterministic under retries, unlike
    rand(). Supports 'inner' and 'left' (large side preserved); the replicated
    side must be the smaller one since the shuffle grows it ×salt.
    """
    keys = [on] if isinstance(on, str) else list(on)
    src = (
        F.col(salt_from)
        if isinstance(salt_from, str)
        else salt_from
        if salt_from is not None
        else F.xxhash64(*large.columns)
    )
    l = large.withColumn(SALT_COL, F.pmod(src, F.lit(salt)).cast("int"))
    s = small.withColumn(SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    out = l.join(s, keys + [SALT_COL], how)
    return out.drop(SALT_COL)


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, Column],
    *,
    salt: int = 16,
    merge: dict[str, Column] | None = None,
    salt_from: str | Column | None = None,
) -> DataFrame:
    """Two-phase aggregation through a salted intermediate key: phase 1
    aggregates (keys, salt) shards, phase 2 merges shards per key.

    ``aggs`` maps output name → phase-1 aggregate; ``merge`` maps the same
    names → phase-2 merge aggregate over the phase-1 column (defaults to the
    obvious merges: F.sum for counts/sums — pass explicitly for anything
    else, e.g. ``F.flatten(F.collect_list(c))`` for list collection).
    """
    src = (
        F.col(salt_from)
        if isinstance(salt_from, str)
        else salt_from
        if salt_from is not None
        else F.xxhash64(*df.columns)
    )
    salted = df.withColumn(SALT_COL, F.pmod(src, F.lit(salt)).cast("int"))
    phase1 = salted.groupBy(*keys, SALT_COL).agg(
        *[c.alias(a) for a, c in aggs.items()]
    )
    merge = merge or {}
    finals = [merge.get(a, F.sum(a)).alias(a) for a in aggs]
    return phase1.groupBy(*keys).agg(*finals)


def hot_key_salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    *,
    min_share: tuple[int, int] = (1, 100),
    salt: int = 8,
    how: str = "inner",
    capacity: int | None = None,
) -> DataFrame:
    """Differentiated skew join with *measured* hot keys: detect keys holding
    ≥ ``min_share`` of the large side (operators.heavyhitters — a Misra-Gries
    candidate pass plus candidate-only verify, so detection never shuffles the
    key domain), then route only those rows through :func:`salted_join` while
    the cold majority takes the plain equi-join. The small side is split the
    same way, so salting replicates only the rows that join hot keys.

    Result is row-identical to ``large.join(small, on, how)`` for 'inner' and
    'left'. At 100 TB the detection pass is the cheap part (two narrow scans);
    persist ``large`` (or pre-compute the hot-key set offline — it changes
    slowly for real workloads) so the hot/cold split does not rescan the
    source twice.
    """
    from milan_spark.operators.heavyhitters import exact_heavy_hitters

    hot = F.broadcast(
        exact_heavy_hitters(large, on, min_share, capacity).select(
            F.col("item").alias("__hot_k")
        )
    )
    lk = large.withColumn("__hot_k", F.col(on).cast("string"))
    sk = small.withColumn("__hot_k", F.col(on).cast("string"))
    l_hot = lk.join(hot, "__hot_k", "leftsemi").drop("__hot_k")
    l_cold = lk.join(hot, "__hot_k", "leftanti").drop("__hot_k")
    s_hot = sk.join(hot, "__hot_k", "leftsemi").drop("__hot_k")
    s_cold = sk.join(hot, "__hot_k", "leftanti").drop("__hot_k")
    hot_part = salted_join(l_hot, s_hot, on, salt=salt, how=how)
    cold_part = l_cold.join(s_cold, on, how)
    return hot_part.unionByName(cold_part)
