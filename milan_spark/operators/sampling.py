"""Deterministic sampling & dataset-splitting operators (beyond the
reference — training-data pipeline surface; SURVEY.md §7 phase 6).

A 100 TB training pipeline needs reproducible train/val/test splits and
per-stratum samples that (a) never collect to the driver, (b) assign every
record independently of partitioning and row order, and (c) can be re-derived
bit-identically by any other engine for auditing. All three operators here
are pure column algebra over a content hash — no RNG, no ``rand()``, no
state — so the assignment is a *property of the record*, stable under
re-partitioning, retries, and re-runs (the reason `rand()`-based splits are
wrong at scale: task retries resample them).

Hash: the same base-31/base-131 polynomial fold used by the text
fingerprinting family (`operators/text.py`), applied to the record key cast
to string — expressible in ANSI SQL for oracle checking, JVM-evaluated (no
Python), and uniform enough for bucketing (the two-base combination breaks
the pure-31 lattice for short numeric keys).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

from milan_spark.operators.text import token_hash31


def hash_bucket(key: Column | str, n_buckets: int = 100) -> Column:
    """Deterministic bucket in [0, n_buckets) from a key column.

    Combines base-31 and base-131 folds (mod 2^31-1 each) of the key's string
    form with an XOR mix. The mix must be non-linear: for short numeric keys
    neither fold wraps, and any linear combination collapses mod n_buckets
    (131 ≡ 31 mod 100, so a·h31 + b·h131 hits only gcd-many residues — a
    measured 25/100 buckets before the XOR).
    """
    s = (F.col(key) if isinstance(key, str) else key).cast("string")
    h = token_hash31(s, 31).bitwiseXOR(token_hash31(s, 131) * F.lit(65537) % F.lit(2_147_483_647))
    return (h % n_buckets).cast("int")


def hash_split(
    df: DataFrame,
    key: Column | str,
    splits: dict[str, int] | None = None,
    n_buckets: int = 100,
    label_col: str = "split",
) -> DataFrame:
    """Label every record with a split name by deterministic hash bucket.

    ``splits`` maps label -> bucket count out of ``n_buckets`` (default
    80/10/10 train/val/test). Assignment is per-record and stable: adding or
    removing other records never moves a record between splits (unlike
    ``randomSplit``), which is what makes incremental corpus refreshes safe —
    yesterday's training shard stays a subset of today's.
    """
    if splits is None:
        splits = {"train": 80, "val": 10, "test": 10}
    if sum(splits.values()) != n_buckets:
        raise ValueError(f"splits must sum to n_buckets={n_buckets}: {splits}")
    bucket = hash_bucket(key, n_buckets)
    lo = 0
    expr = None
    for name, width in splits.items():
        cond = bucket < F.lit(lo + width)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo += width
    return df.withColumn(label_col, expr)


def stratified_sample(
    df: DataFrame,
    strata: list[str],
    n_per_stratum: int,
    key: Column | str,
    rank_col: str = "sample_rank",
) -> DataFrame:
    """Exactly ``n_per_stratum`` records per stratum, chosen by hash order.

    Ranking by (hash(key), key) is a deterministic pseudo-random permutation
    per stratum — a uniform sample without RNG, reproducible across engines
    and runs. One shuffle + one per-key sort (rank window); at scale the
    heavy strata sort in parallel across their hash partitions after AQE
    skew-split of the preceding exchange.
    """
    keyc = F.col(key) if isinstance(key, str) else key
    w = W.partitionBy(*strata).orderBy(hash_bucket(keyc, 1 << 30), keyc)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= n_per_stratum)
