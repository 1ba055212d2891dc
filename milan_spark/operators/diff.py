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
