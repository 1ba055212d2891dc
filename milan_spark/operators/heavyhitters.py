"""Exact frequency-threshold heavy hitters with a Misra-Gries partition
prefilter — hot-key / frequent-item mining that never shuffles the full item
domain.

The 100 TB problem this solves: "which n-grams / keys / values appear in at
least a ``num/den`` share of all rows?" The naive plan is
``groupBy(item).count()`` — a full shuffle keyed on *every distinct item*
(billions of distinct n-grams at corpus scale) to find a handful of frequent
ones. This operator does it in two narrow scans and one *candidate-only*
shuffle:

1. **Candidate pass** (``misra_gries_summaries``): one ``mapInPandas`` over
   the item column. Each task keeps a Misra-Gries summary of at most
   ``capacity`` counters (batched decrement: when the table overflows,
   subtract the (capacity+1)-th largest counter from all and drop the
   non-positive ones — each decrement round removes ≥ delta·(capacity+1)
   mass, so total decrement Δ_p ≤ N_p/(capacity+1)). A sentinel row carries
   the partition's row count so the global total rides the same job.

   *Completeness guarantee*: if an item has global share ≥ num/den, then by
   averaging it has partition share ≥ num/den in at least one partition, and
   there its true count exceeds N_p/(capacity+1) whenever
   capacity+1 > den/num — so its counter survives that partition's summary.
   With the default ``capacity = 4·den/num`` the margin is 4×. No heavy
   hitter is ever missed; the summary may contain false positives, which is
   what pass 2 removes.

2. **Exact verify pass**: the union of per-partition candidates (≤ capacity
   × n_partitions rows — KBs to low MBs) broadcasts into a semi-join, and
   only candidate items enter the count aggregate. The final filter
   ``n · den ≥ num · N`` is integer-exact (no float share), so the result is
   *exactly* the brute-force answer, verifiable by plain SQL.

Scale properties: the item domain never shuffles (the groupBy after the
semi-join is map-side combinable over ≤ candidate-count keys); driver/
broadcast state is bounded by capacity × n_partitions, independent of both
row count and distinct-item count. Composes with
:mod:`milan_spark.operators.skew` — the output is precisely the hot-key set
one feeds to ``salted_join``.

Reference parity: Milan has no sketch/frequency operators (closest is
aggregation over ``GroupBy``, milan-lang Aggregation.scala); this is a
north-star addition for the LLM-pipeline tier, per the round-1 survey.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

_SUMMARY_SCHEMA = "item string, lb bigint, rows bigint"


def misra_gries_summaries(
    df: DataFrame, item: str | Column, capacity: int, weight: str | Column | None = None
) -> DataFrame:
    """Per-partition Misra-Gries summaries of ``item`` (cast to string).

    Output: one row per surviving counter (``item``, ``lb`` = stored lower
    bound) plus one sentinel row per partition (``item`` NULL, ``rows`` =
    partition mass, NULLs excluded). ``lb`` undercounts the partition
    mass by at most M_p/(capacity+1).

    ``weight`` generalizes from row counts to any non-negative integer mass
    (bytes, token counts, shuffle-size estimates): the summary then tracks
    weighted frequency, with the identical decrement argument — each
    overflow round removes ≥ delta·(capacity+1) mass, so total decrement
    stays ≤ M_p/(capacity+1) where M_p is the partition's weight sum.
    """
    if capacity < 1:
        raise ValueError("capacity must be >= 1")

    item_col = F.col(item) if isinstance(item, str) else item
    cols = [item_col.cast("string").alias("item")]
    if weight is not None:
        w_col = F.col(weight) if isinstance(weight, str) else weight
        cols.append(w_col.cast("long").alias("w"))
    items = df.select(*cols)

    def mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        mass = 0
        for pdf in batches:
            if weight is None:
                grp = pdf["item"].dropna().value_counts()
            else:
                keep = pdf["item"].notna()
                grp = pdf.loc[keep, "w"].fillna(0).groupby(pdf.loc[keep, "item"]).sum()
            mass += int(grp.sum())
            for v, c in grp.items():
                counters[v] = counters.get(v, 0) + int(c)
            if len(counters) > capacity:
                delta = sorted(counters.values(), reverse=True)[capacity]
                counters = {k: c - delta for k, c in counters.items() if c > delta}
        out = pd.DataFrame(
            {
                "item": list(counters.keys()) + [None],
                "lb": pd.array(list(counters.values()) + [None], dtype="Int64"),
                "rows": pd.array([None] * len(counters) + [mass], dtype="Int64"),
            }
        )
        yield out

    return items.mapInPandas(mg, _SUMMARY_SCHEMA)


def exact_heavy_hitters(
    df: DataFrame,
    item: str | Column,
    min_share: tuple[int, int],
    capacity: int | None = None,
    weight: str | Column | None = None,
) -> DataFrame:
    """All items whose share of the total mass is ≥ ``num/den``, with exact
    totals — equal to brute-force ``groupBy(item)`` + threshold, but with no
    full-domain shuffle (see module docstring for the plan). Mass is the row
    count, or the sum of ``weight`` (non-negative integers — bytes, tokens)
    when given; the completeness proof is identical with weighted mass.

    Returns columns ``item`` (string), ``n`` (exact mass, bigint),
    ``n_total`` (total mass over non-NULL items, bigint). The share test is
    the exact integer predicate ``n·den ≥ num·n_total``.

    Caching contract: the MG summaries are ``persist()``-ed (read by both
    the total and the candidate set) and stay cached after the returned
    plan materializes; long-lived sessions calling this repeatedly release
    them via ``milan_spark.session.release_cached(spark)``.
    """
    num, den = min_share
    if num <= 0 or den <= 0:
        raise ValueError("min_share must be a positive rational (num, den)")
    if capacity is None:
        capacity = max(1, (4 * den) // num)

    summaries = misra_gries_summaries(df, item, capacity, weight).persist()
    total = summaries.agg(F.sum("rows").cast("long").alias("n_total"))
    cands = summaries.where(F.col("item").isNotNull()).select("item").distinct()

    item_col = F.col(item) if isinstance(item, str) else item
    cols = [item_col.cast("string").alias("item")]
    if weight is not None:
        w_col = F.col(weight) if isinstance(weight, str) else weight
        cols.append(w_col.cast("long").alias("__w"))
    items = df.select(*cols).where(F.col("item").isNotNull())
    mass = F.count(F.lit(1)) if weight is None else F.sum(F.coalesce("__w", F.lit(0)))
    counts = (
        items.join(F.broadcast(cands), "item", "leftsemi")
        .groupBy("item")
        .agg(mass.cast("long").alias("n"))
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .where(F.col("n") * F.lit(den) >= F.lit(num) * F.col("n_total"))
        .select("item", "n", "n_total")
    )
