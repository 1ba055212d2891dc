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

from typing import Sequence

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
    null_label: str | None = None,
) -> DataFrame:
    """Label every record with a split name by deterministic hash bucket.

    ``splits`` maps label -> bucket count out of ``n_buckets`` (default
    80/10/10 train/val/test). Assignment is per-record and stable: adding or
    removing other records never moves a record between splits (unlike
    ``randomSplit``), which is what makes incremental corpus refreshes safe —
    yesterday's training shard stays a subset of today's.

    A NULL split key has no hash bucket; silently labeling it NULL would make
    the record vanish from every per-split audit. By default the job FAILS on
    the first NULL key (``raise_error``); pass ``null_label`` to route NULL
    keys to an explicit, auditable split instead.
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
    # the when-chain is exhaustive over non-NULL buckets (widths sum to
    # n_buckets), so the otherwise branch is reached iff the key is NULL
    if null_label is None:
        expr = expr.otherwise(F.raise_error(F.lit("hash_split: NULL split key")))
    else:
        expr = expr.otherwise(F.lit(null_label))
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
    and runs. NOTE: a window partition is one task — AQE skew handling splits
    join/agg partitions, NOT window exchanges — so a single-window
    formulation would serialize a giant stratum on one task. Instead the
    top-n runs in two phases on a composite key: phase 1 ranks within
    (stratum, hash-slice) — ``n_slices`` deterministic slices of the hash
    order, so no task sorts more than ~1/n_slices of the heaviest stratum —
    and keeps each slice's top ``n_per_stratum``; phase 2 ranks the
    ≤ n_per_stratum × n_slices survivors per stratum (tiny). Any row in a
    stratum's true top-n is in its slice's top-n, so the result is exact and
    independent of ``n_slices``.
    """
    keyc = F.col(key) if isinstance(key, str) else key
    n_slices = 32
    out = df.withColumn("__ordh", hash_bucket(keyc, 1 << 30).cast("long"))
    slice_step = (1 << 30) // n_slices
    w1 = (
        W.partitionBy(*strata, F.expr(f"__ordh div {slice_step}"))
        .orderBy("__ordh", keyc)
    )
    pruned = (
        out.withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= n_per_stratum)
        .drop("__r1")
    )
    w = W.partitionBy(*strata).orderBy("__ordh", keyc)
    return (
        pruned.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= n_per_stratum)
        .drop("__ordh")
    )


def top_fraction_by_score(
    df: DataFrame,
    strata: list[str],
    score_col: str,
    *,
    frac: tuple[int, int] = (1, 5),
    key: str = "doc_id",
    buckets: int = 256,
) -> DataFrame:
    """Keep each stratum's top ``frac`` of rows by score — EXACTLY the rows a
    per-stratum ``ROW_NUMBER() OVER (ORDER BY score DESC, key)`` ≤
    ⌊n·frac⌋ would keep, computed by distributed selection instead of a
    single-task stratum sort (the per-source quality-percentile gate of a
    curation pipeline, where one source can be 90% of a 100 TB corpus).

    Algorithm (classic two-phase order-statistic selection):
    1. histogram: bucket scores (``⌊score·B⌋``, score in [0,1]) and count
       per (stratum, bucket) — a combinable aggregate, B·strata rows out;
    2. threshold: per stratum, the cumulative-from-top histogram locates
       the bucket holding the ⌊n·frac⌋-th largest score (a window over ≤ B
       rows per stratum — trivially small);
    3. boundary rank: only the threshold bucket's rows rank exactly (by
       score desc, key) — ~n/B rows per stratum, bounded unless scores
       pile into one bucket (documented bound; raise ``buckets`` for
       finer-grained scores);
    4. emit: every row above the threshold bucket + the boundary bucket's
       top remainder.

    ``frac`` is a rational (num, den); quota = (n·num) // den, integer-exact.
    """
    num, den = frac
    s = F.col(score_col)
    b = F.least(F.lit(buckets - 1), F.floor(s * buckets)).cast("int")
    d = df.withColumn("__b", b)
    quota = (
        d.groupBy(*strata)
        .agg(F.count(F.lit(1)).alias("__n"))
        .withColumn("__quota", F.expr(f"__n * {num} div {den}"))
        .filter(F.col("__quota") > 0)
        .drop("__n")
    )
    bcounts = d.groupBy(*strata, "__b").agg(F.count(F.lit(1)).alias("__cb"))
    wcum = (
        W.partitionBy(*strata)
        .orderBy(F.col("__b").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = bcounts.withColumn("__cum", F.sum("__cb").over(wcum))
    thr = (
        cum.join(quota, strata)
        .filter(F.col("__cum") >= F.col("__quota"))
        .groupBy(*strata)
        .agg(
            F.max("__b").alias("__tb"),
            F.max_by(F.col("__quota") - (F.col("__cum") - F.col("__cb")), "__b").alias(
                "__need"
            ),
        )
    )
    dd = d.join(F.broadcast(thr), strata)
    above = dd.filter(F.col("__b") > F.col("__tb"))
    wb = W.partitionBy(*strata).orderBy(s.desc(), F.col(key))
    boundary = (
        dd.filter(F.col("__b") == F.col("__tb"))
        .withColumn("__r", F.row_number().over(wb))
        .filter(F.col("__r") <= F.col("__need"))
        .drop("__r")
    )
    return above.unionByName(boundary).drop("__b", "__tb", "__need")


def exact_quantiles(
    df: DataFrame,
    strata: Sequence[str],
    value_col: str,
    code_col,
    probs: Sequence[tuple[str, int, int]],
    tiebreak: Sequence[str] = (),
    buckets: int = 1024,
) -> DataFrame:
    """Exact per-stratum discrete quantiles by DISTRIBUTED SELECTION — the
    value at rank ``ceil(p·n)`` under ``ORDER BY code, tiebreak``, identical
    to a per-stratum sort + pick, without ever sorting the stratum.

    The naive plan (one window sort per stratum, as a first-cut
    ``quantile_disc`` does) sorts EVERY row to pick a handful of order
    statistics — a single-task-per-key sort at 100 TB. This is the
    order-statistic generalization of :func:`top_fraction_by_score`:

    1. per-stratum (n, min, max) — one combinable aggregate;
    2. integer bucket code ``(c - min)·B div (range+1)`` (exact, monotone);
       per-(stratum, bucket) counts — one combinable aggregate;
    3. per target rank (one per prob), the cumulative histogram locates the
       target bucket (a window over ≤ B rows per stratum);
    4. ONLY the target buckets' rows rank exactly (~n·|probs|/B rows).

    ``code_col`` is an int64 expression whose ordering equals the intended
    value ordering (e.g. price cents); ``probs`` are (label, num, den)
    rationals so target ranks are integer-exact. Output:
    strata + (p, q_value). Ties break by ``tiebreak`` ascending.
    """
    key_list = list(strata)
    code = (F.col(code_col) if isinstance(code_col, str) else code_col).cast("long")
    d = df.select(*key_list, F.col(value_col), code.alias("__c"), *tiebreak)

    stats = d.groupBy(*key_list).agg(
        F.count(F.lit(1)).alias("__n"),
        F.min("__c").alias("__lo"),
        F.max("__c").alias("__hi"),
    )
    db = d.join(F.broadcast(stats), key_list).withColumn(
        "__b",
        F.expr(f"(__c - __lo) * {buckets} div (__hi - __lo + 1)").cast("int"),
    )
    bcounts = db.groupBy(*key_list, "__b").agg(F.count(F.lit(1)).alias("__cb"))
    wcum = (
        W.partitionBy(*key_list)
        .orderBy("__b")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = bcounts.withColumn("__cum", F.sum("__cb").over(wcum))
    targets = stats.select(
        *key_list,
        "__n",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(label).alias("p"),
                    F.expr(f"({num} * __n + {den} - 1) div {den}").alias("__t"),
                )
                for label, num, den in probs
            ])
        ).alias("__pt"),
    ).select(*key_list, F.col("__pt.p").alias("p"), F.col("__pt.__t").alias("__t"))
    # smallest bucket whose cumulative count reaches the target rank, and the
    # in-bucket rank offset — a join of two tiny per-stratum tables
    located = (
        cum.join(targets, key_list)
        .filter(F.col("__cum") >= F.col("__t"))
        .groupBy(*key_list, "p")
        .agg(
            F.min(F.struct("__b", "__cum", "__cb", "__t")).alias("__m"),
        )
        .select(
            *key_list,
            "p",
            F.col("__m.__b").alias("__tb"),
            (F.col("__m.__t") - (F.col("__m.__cum") - F.col("__m.__cb"))).alias("__need"),
        )
    )
    if key_list:
        hits = db.join(F.broadcast(located), key_list)
    else:
        hits = db.crossJoin(F.broadcast(located))
    hits = hits.filter(F.col("__b") == F.col("__tb"))
    wr = W.partitionBy(*key_list, "p").orderBy("__c", *tiebreak)
    return (
        hits.withColumn("__r", F.row_number().over(wr))
        .filter(F.col("__r") == F.col("__need"))
        .select(*key_list, "p", F.col(value_col).alias("q_value"))
    )


def weighted_sample(
    df: DataFrame,
    strata: list[str],
    n_per_stratum: int,
    key: Column | str,
    weight: Column | str,
    rank_col: str = "sample_rank",
    es_col: str = "es_key",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES,
    IPL 2006): per stratum keep the ``n_per_stratum`` records with the
    smallest exponential keys ``-ln(u)/w`` — each record's inclusion
    probability is proportional to its weight, exactly the reservoir
    algorithm's distribution, but expressed as pure column algebra.

    ``u`` is the record's deterministic content hash mapped into (0, 1] —
    no RNG (same rationale as the uniform samplers above: task retries
    resample ``rand()``; a hash is a property of the record). The same
    two-phase composite-key top-n as :func:`stratified_sample` caps any
    single task at ~1/32 of the heaviest stratum. Rows with weight <= 0 or
    NULL are excluded (zero mass).

    Determinism: the ES key is ranked ROUNDED to 9 decimals with a ``key``
    tie-break, so a last-ulp ``ln`` disagreement between engines cannot
    flip the ordering (the bm25 discipline).
    """
    keyc = F.col(key) if isinstance(key, str) else key
    wc = F.col(weight) if isinstance(weight, str) else weight
    p31 = 2_147_483_647
    h = hash_bucket(keyc, 1 << 30).cast("long")
    # (h*scramble mod P31 + 1)/(P31+1) in (0, 1] — u=0 impossible, ln finite
    u = ((h * F.lit(2_654_435_761) % F.lit(p31)) + F.lit(1)).cast("double") / F.lit(
        float(p31 + 1)
    )
    es = F.round(-F.log(u) / wc.cast("double"), 9)
    out = (
        df.filter(wc.isNotNull() & (wc > 0))
        .withColumn(es_col, es)
        .withColumn("__ordh", h)
    )
    n_slices = 32
    slice_step = (1 << 30) // n_slices
    w1 = (
        W.partitionBy(*strata, F.expr(f"__ordh div {slice_step}"))
        .orderBy(es_col, keyc)
    )
    pruned = (
        out.withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= n_per_stratum)
        .drop("__r1")
    )
    w2 = W.partitionBy(*strata).orderBy(es_col, keyc)
    return (
        pruned.withColumn(rank_col, F.row_number().over(w2))
        .filter(F.col(rank_col) <= n_per_stratum)
        .drop("__ordh")
    )


def aqp_uniform_estimates(
    df: DataFrame,
    key: Column | str,
    group_cols: Sequence[str],
    measure: Column | str,
    *,
    n_buckets: int = 10_007,
    keep_buckets: int = 111,
) -> DataFrame:
    """Approximate query processing over a deterministic uniform sample:
    keep the rows whose hash bucket < ``keep_buckets`` (inclusion
    probability p = keep/n, a property of the RECORD — reproducible by any
    engine, auditable in SQL), then per group emit Horvitz–Thompson
    estimates scaled by 1/p in EXACT integer arithmetic:

      n_sample                   rows sampled in the group
      est_rows                   (n_sample · n_buckets) DIV keep_buckets
      sum_measure                exact integer sum over the sample
      est_sum_measure            (sum_measure · n_buckets) DIV keep_buckets
      sum_sq_measure             Σ measure² over the sample — the variance
                                 ingredient: SE(est_sum) ≈ sqrt((1-p)/p ·
                                 (sum_sq − sum²/n)) · n/(n−1) · 1/p; kept
                                 as the exact integer so callers derive any
                                 CI without the engine committing to a
                                 float rounding

    ``measure`` must already be an integer-typed column (cents, counts —
    the caller picks the scale so Σx² stays in int64; dollars not cents for
    big tables). Scale: the sample predicate is a narrow projection — no
    shuffle until the groupBy of the ~p·N surviving rows, so a 1% estimate
    over 100 TB aggregates ~1 TB; with the sample materialized once, every
    follow-up estimate is sample-sized. Prime n_buckets breaks stride
    patterns in synthetic keys.
    """
    mc = F.col(measure) if isinstance(measure, str) else measure
    sampled = df.filter(hash_bucket(key, n_buckets) < keep_buckets)
    # integer DIV, not float /: the scaled sums must stay EXACT (and
    # oracle-reproducible) past 2^53, where double division starts rounding
    est_rows = F.expr(
        f"CAST((n_sample * {n_buckets}) DIV {keep_buckets} AS BIGINT)"
    )
    est_sum = F.expr(
        f"CAST((sum_measure * {n_buckets}) DIV {keep_buckets} AS BIGINT)"
    )
    return (
        sampled.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_sample"),
            F.sum(mc.cast("long")).alias("sum_measure"),
            F.sum((mc.cast("long") * mc.cast("long"))).alias("sum_sq_measure"),
        )
        .select(
            *group_cols,
            "n_sample",
            est_rows.alias("est_rows"),
            "sum_measure",
            est_sum.alias("est_sum_measure"),
            "sum_sq_measure",
        )
    )
