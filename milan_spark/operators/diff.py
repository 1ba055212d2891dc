"""Snapshot diff — CDC-style change classification between two versions of
a keyed table (warehouse/pipeline staple; no reference analog — the
reference's closest construct is the enrichment join's last-state pairing).

One full-outer join on the key, classification row-local; at 100 TB both
snapshots hash-partition once on the key, or the base stays put under
bucketed layout (``operators.bucketing``) and only the delta shuffles —
the same cost model as MERGE, because a diff IS the read-only half of one.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def snapshot_diff(
    base: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare: Sequence[str] | None = None,
) -> DataFrame:
    """Classify every key across two snapshots: ``added`` (new only),
    ``removed`` (base only), ``changed`` (present in both, any compared
    column differs — null-safe), ``unchanged``.

    ``compare`` defaults to all shared non-key columns. Output: the key
    columns + ``change``. Row-level (not a summary) so downstream CDC
    consumers can act per key; aggregate it for the audit number.
    """
    keys = list(keys)
    if compare is None:
        shared = [c for c in base.columns if c in set(new.columns)]
        compare = [c for c in shared if c not in keys]
    b = base.select(*keys, *compare, F.lit(1).alias("__b")).alias("b")
    n = new.select(*keys, *compare, F.lit(1).alias("__n")).alias("n")
    cond = [b[k].eqNullSafe(n[k]) for k in keys]
    j = b.join(n, cond, "full_outer")

    differs: Column = F.lit(False)
    for c in compare:
        differs = differs | ~b[c].eqNullSafe(n[c])
    change = (
        F.when(b["__b"].isNull(), F.lit("added"))
        .when(n["__n"].isNull(), F.lit("removed"))
        .when(differs, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    key_cols = [F.coalesce(n[k], b[k]).alias(k) for k in keys]
    return j.select(*key_cols, change.alias("change"))


def psi_drift(
    base: DataFrame,
    new: DataFrame,
    col: str,
    buckets: int = 10,
) -> DataFrame:
    """Population Stability Index between two snapshots of a numeric column
    — the standard distribution-drift monitor for feature/data pipelines:
    PSI = Σ_i (p_i − q_i)·ln(p_i/q_i) over fixed buckets, q from the base,
    p from the new snapshot. PSI < 0.1 ≈ stable, > 0.25 ≈ population shift.

    Determinism by construction: bucket edges are fixed-width from the
    BASE min/max (one combinable aggregate, broadcast as one row); counts
    are exact int64 with add-one smoothing (so empty buckets need no ε
    hack and both engines see identical rationals); each bucket contributes
    one ln over an exact rational, summed over ≤ ``buckets`` terms and
    compared after round(·, 6) — the bm25 float discipline.

    Plan: two combinable bucket-count aggregates (one scan each side, the
    value domain never shuffles un-aggregated), one ``buckets``-row join.
    Output: one row per bucket (bucket, base_n, new_n, psi_contrib) —
    sum psi_contrib for the headline number; bucket rows localize WHERE
    the distribution moved.
    """
    stats = base.agg(
        F.min(col).cast("double").alias("__lo"), F.max(col).cast("double").alias("__hi")
    )

    def bucketize(df: DataFrame) -> DataFrame:
        b = df.select(F.col(col).cast("double").alias("__v")).where(
            F.col("__v").isNotNull()
        ).crossJoin(F.broadcast(stats))
        idx = F.when(
            F.col("__hi") == F.col("__lo"), F.lit(0)
        ).otherwise(
            F.least(
                F.lit(buckets - 1),
                F.greatest(
                    F.lit(0),
                    F.floor(
                        (F.col("__v") - F.col("__lo"))
                        * buckets
                        / (F.col("__hi") - F.col("__lo"))
                    ).cast("int"),
                ),
            )
        )
        return b.select(idx.alias("bucket")).groupBy("bucket").agg(
            F.count(F.lit(1)).alias("n")
        )

    qb = bucketize(base).select("bucket", F.col("n").alias("base_n"))
    pb = bucketize(new).select("bucket", F.col("n").alias("new_n"))
    all_buckets = base.sparkSession.range(buckets).select(
        F.col("id").cast("int").alias("bucket")
    )
    j = (
        all_buckets.join(qb, "bucket", "left")
        .join(pb, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("base_n", F.lit(0)).alias("base_n"),
            F.coalesce("new_n", F.lit(0)).alias("new_n"),
        )
        # persist: feeds both the totals aggregate and the contrib select;
        # without the barrier each consumer re-runs BOTH corpus scans
        .persist()
    )
    tot = j.agg(
        F.sum("base_n").alias("__qt"), F.sum("new_n").alias("__pt")
    )
    sm = j.crossJoin(F.broadcast(tot))
    p = (F.col("new_n") + 1).cast("double") / (F.col("__pt") + buckets).cast("double")
    q = (F.col("base_n") + 1).cast("double") / (F.col("__qt") + buckets).cast("double")
    return sm.select(
        "bucket",
        "base_n",
        "new_n",
        F.round((p - q) * F.log(p / q), 6).alias("psi_contrib"),
    )


def incremental_agg_refresh(
    partials: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
    *,
    sum_cols: Sequence[str] = (),
    count_col: str = "n",
    min_cols: Sequence[str] = (),
    max_cols: Sequence[str] = (),
) -> DataFrame:
    """Algebraic materialized-view maintenance for insert-only deltas:
    refresh a stored aggregate from its PARTIALS plus the delta's partials,
    never rescanning the base data — ``refresh(view, Δ) = merge(partials,
    partial(Δ))``, the identity every combinable aggregate satisfies.

    ``partials`` and ``delta`` both carry keys + the partial columns
    (``sum_cols`` exact sums, ``count_col`` row count, ``min_cols`` /
    ``max_cols`` monotone extrema — the insert-only-safe aggregate algebra;
    deletions would need the full CDC diff, :func:`snapshot_diff`). The
    merge is ONE map-side-combinable groupBy over O(groups + Δ-groups)
    rows — at 100 TB the base is never read, which is the entire point of
    maintaining a view.
    """
    key_list = list(keys)
    aggs = [F.sum(c).alias(c) for c in sum_cols]
    aggs.append(F.sum(count_col).alias(count_col))
    aggs += [F.min(c).alias(c) for c in min_cols]
    aggs += [F.max(c).alias(c) for c in max_cols]
    return partials.unionByName(delta).groupBy(*key_list).agg(*aggs)
