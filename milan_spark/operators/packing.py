"""Sequence packing & token-budget mixture sampling (beyond the reference —
training-data pipeline surface; SURVEY.md §7 phase 6).

The last mile of a pretraining pipeline: lay the curated corpus out as
fixed-token-budget training sequences, and compose the corpus from per-domain
token quotas. Both are *order-dependent* operators, which is exactly what
makes them hard at 100 TB: a naive ``SUM() OVER (ORDER BY ...)`` global
cumulative sum plans as a single-partition window — one task touches every
row. Here the global prefix sum is the classic two-phase scan, expressed
declaratively:

1. a deterministic hash order key partitions rows into ``n_range_buckets``
   *order-aligned* range buckets (the bucket is a monotone function of the
   order key — no sampling, no ``repartitionByRange``, so the layout is a
   property of the data, reproducible across engines);
2. within-bucket exclusive cumsums run as parallel window aggregates (one
   shuffle, each bucket an independent sort);
3. per-bucket totals (a map-side-combinable aggregate, ``n_range_buckets``
   rows) are turned into bucket offsets by a tiny single-partition window and
   broadcast back.

Wall-clock at scale is therefore one full-data shuffle plus O(buckets) of
driver-side work — the same cost as any keyed window operator. Everything is
integer-exact column algebra over the content hash of ``operators/sampling``
(no RNG, no Python), so every assignment is reproducible bit-for-bit and the
whole layout is expressible in ANSI SQL for oracle checking.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

from milan_spark.operators.sampling import hash_bucket

ORD_SPACE = 1 << 30  # hash-order key space; buckets divide it evenly


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def bucketed_prefix_sum(
    df: DataFrame,
    value: Column | str,
    order_cols: list,
    bucket: Column | str,
    alias: str = "__prefix",
) -> DataFrame:
    """EXCLUSIVE prefix sum of ``value`` in the total order (bucket, *order_cols).

    ``bucket`` must be an order-aligned coarse prefix of the order (every row
    of bucket b precedes every row of bucket b+1). Plans as: one exchange on
    the bucket + parallel within-bucket cumulative windows; per-bucket totals
    aggregate map-side to O(buckets) rows, get exclusive-cumsum'd by a tiny
    single-partition window (bounded by bucket count, never data), and
    broadcast-join back. No single task ever sees more than one bucket.
    """
    bucket = _c(bucket)
    value = _c(value)
    w = (
        W.partitionBy(bucket)
        .orderBy(*order_cols)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    local = df.withColumn("__bkt", bucket).withColumn(
        "__local", F.coalesce(F.sum(value).over(w), F.lit(0).cast("long"))
    )
    totals = df.groupBy(bucket.alias("__bkt")).agg(F.sum(value).alias("__tot"))
    off_w = W.orderBy("__bkt").rowsBetween(W.unboundedPreceding, -1)
    offsets = totals.select(
        "__bkt", F.coalesce(F.sum("__tot").over(off_w), F.lit(0).cast("long")).alias("__off")
    )
    return (
        local.join(F.broadcast(offsets), "__bkt")
        .withColumn(alias, F.col("__local") + F.col("__off"))
        .drop("__bkt", "__local", "__off")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: Column | str,
    budget: int,
    n_range_buckets: int = 256,
) -> DataFrame:
    """Concat-and-chunk sequence packing: documents are laid out in a
    deterministic hash order and the concatenated token stream is cut into
    ``budget``-token training sequences.

    Appends per document:

    - ``seq_id``          — index of the sequence its first token lands in;
    - ``seq_offset``      — token offset of the document within that sequence;
    - ``spans_boundary``  — true iff the document crosses a sequence cut (the
      tokenizer-side splitter uses this to emit both fragments).

    This is the standard pretraining layout (every sequence except the last
    is exactly full; fragmentation is pushed into document splits rather than
    padding). The hash order doubles as corpus shuffling — documents from the
    same source land in different sequences. Assignment is a pure function of
    (corpus, budget): stable under partitioning and retries.
    """
    ordk = hash_bucket(id_col, ORD_SPACE).cast("long").alias("__ord")
    step = ORD_SPACE // n_range_buckets
    out = df.withColumn("__ord", ordk).withColumn("__tok", _c(token_col).cast("long"))
    out = bucketed_prefix_sum(
        out,
        "__tok",
        [F.col("__ord"), F.col(id_col)],
        F.expr(f"__ord div {step}"),
        alias="__e",
    )
    e, tok = F.col("__e"), F.col("__tok")
    return (
        out.withColumn("seq_id", F.expr(f"__e div {budget}"))
        .withColumn("seq_offset", e % budget)
        .withColumn(
            "spans_boundary",
            (tok > 0) & (F.expr(f"(__e + __tok - 1) div {budget}") != F.col("seq_id")),
        )
        .drop("__ord", "__e")
        .withColumnRenamed("__tok", "n_tokens")
    )


def token_budget_mixture(
    df: DataFrame,
    domain_col: str,
    token_col: Column | str,
    budget: int | dict[str, int],
    key: str,
) -> DataFrame:
    """Compose a training mixture by per-domain token quotas: within each
    domain, documents are taken in deterministic hash order until the
    domain's token budget is reached (a document is kept iff it *starts*
    inside the budget, so each domain overshoots by at most one document).

    ``budget`` is either one quota for every domain or a per-domain dict
    (missing domains get quota 0 — dropped). The exclusive cumsum is a keyed
    window — one shuffle, domains sort in parallel; heavy domains are split
    by AQE skew handling like any other keyed window. Deterministic: the kept
    set is a pure function of the corpus, so mixture re-runs are auditable
    and incremental refreshes reproducible.
    """
    keyc = F.col(key)
    w = (
        W.partitionBy(domain_col)
        .orderBy(hash_bucket(keyc, ORD_SPACE), keyc)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    e = F.coalesce(F.sum(_c(token_col).cast("long")).over(w), F.lit(0).cast("long"))
    if isinstance(budget, dict):
        quota = F.lit(0).cast("long")
        for dom, b in sorted(budget.items()):
            quota = F.when(F.col(domain_col) == dom, F.lit(b).cast("long")).otherwise(quota)
    else:
        quota = F.lit(budget).cast("long")
    return df.withColumn("__e", e).filter(F.col("__e") < quota).drop("__e")
