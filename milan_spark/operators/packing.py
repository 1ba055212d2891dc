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
    group_cols: list | None = None,
) -> DataFrame:
    """EXCLUSIVE prefix sum of ``value`` in the total order (bucket, *order_cols),
    independently per group when ``group_cols`` is given.

    ``bucket`` must be an order-aligned coarse prefix of the order (every row
    of bucket b precedes every row of bucket b+1 within its group). Plans as:
    one exchange on (group, bucket) + parallel within-bucket cumulative
    windows; per-(group, bucket) totals aggregate map-side to
    O(groups × buckets) rows, get exclusive-cumsum'd by a per-group window
    over that tiny aggregate (bounded by bucket count, never data), and
    broadcast-join back. No single task ever sees more than one
    (group, bucket) slice — the composite key is what keeps a giant group
    from serializing on one task, which a plain per-group window would do
    (AQE skew handling splits join/agg partitions, NOT window exchanges).
    """
    groups = [g if isinstance(g, str) else g for g in (group_cols or [])]
    bucket = _c(bucket)
    value = _c(value)
    w = (
        W.partitionBy(*groups, bucket)
        .orderBy(*order_cols)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    local = df.withColumn("__bkt", bucket).withColumn(
        "__local", F.coalesce(F.sum(value).over(w), F.lit(0).cast("long"))
    )
    totals = df.groupBy(*groups, bucket.alias("__bkt")).agg(F.sum(value).alias("__tot"))
    off_w = (
        (W.partitionBy(*groups) if groups else W).orderBy("__bkt")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    offsets = totals.select(
        *groups, "__bkt", F.coalesce(F.sum("__tot").over(off_w), F.lit(0).cast("long")).alias("__off")
    )
    return (
        local.join(F.broadcast(offsets), [*groups, "__bkt"])
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
    (missing domains get quota 0 — dropped). The exclusive cumsum routes
    through :func:`bucketed_prefix_sum` with a composite
    (domain, order-range-bucket) partition key: a plain per-domain window
    would sort an ENTIRE domain in one task (AQE skew handling splits
    join/agg partitions, not window exchanges), whereas the composite key
    caps any task at one domain×bucket slice — ~1/``n_range_buckets`` of the
    heaviest domain. Deterministic: the kept set is a pure function of the
    corpus, so mixture re-runs are auditable and incremental refreshes
    reproducible.
    """
    keyc = F.col(key)
    ordk = hash_bucket(keyc, ORD_SPACE).cast("long")
    step = ORD_SPACE // 256
    out = df.withColumn("__ord", ordk)
    out = bucketed_prefix_sum(
        out,
        _c(token_col).cast("long"),
        [F.col("__ord"), keyc],
        F.expr(f"__ord div {step}"),
        alias="__e",
        group_cols=[domain_col],
    )
    if isinstance(budget, dict):
        quota = F.lit(0).cast("long")
        for dom, b in sorted(budget.items()):
            quota = F.when(F.col(domain_col) == dom, F.lit(b).cast("long")).otherwise(quota)
    else:
        quota = F.lit(budget).cast("long")
    return out.filter(F.col("__e") < quota).drop("__e", "__ord")
