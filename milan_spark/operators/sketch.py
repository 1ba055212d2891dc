"""Sketches for cardinality at scale (beyond the reference's operator set —
the training-pipeline tier alongside dedup/similarity in SURVEY.md §7
phase 6).

KMV (k-minimum-values) distinct-count sketch: hash every value with a
uniform hash into [0, P); the k-th smallest distinct hash m_k estimates the
cardinality as (k-1)·P/m_k (Bar-Yossef et al. 2002; Beyer et al. SIGMOD'07
for the unbiased (k-1) form). Unlike HyperLogLog the whole computation is a
pure function of the input SET — no implementation-defined registers — so
with a portable hash the estimate is bit-for-bit reproducible in ANSI SQL
and oracle-checkable, while still shipping only k longs per group out of the
shuffle.

Scale shape: hash + per-group rank is one shuffle; only rows with rank ≤ k
survive the partial window (a k-row stream per group feeds the final
aggregate). For the global (ungrouped) variant Spark plans the k smallest
as TakeOrderedAndProject — per-partition top-k, merged on the driver, no
global sort shuffle.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window as W, functions as F

from milan_spark.operators.text import P31, char_fold_hash

# Fibonacci-style multiplicative scrambler: the base-31 fold of a short
# string is small (a 4-char value folds below 2^21), so its k smallest
# values are nowhere near uniform in [0,P). Multiplying by a large odd
# constant mod P equidistributes them; product < 2^63, exact in int64 in
# both Spark and DuckDB.
_SCRAMBLE = 2_654_435_761


def _kmv_hash(col):
    return (char_fold_hash(col, 31, P31) * F.lit(_SCRAMBLE)) % F.lit(P31) + 1


def kmv_distinct(
    df: DataFrame,
    value_col: str,
    *,
    k: int = 256,
    keys=(),
) -> DataFrame:
    """Per-group KMV distinct-count estimate of ``value_col``.

    Output: keys + (n_hashes, kth_min_hash, distinct_est) where
    ``distinct_est = (k-1)·P/m_k`` when the group holds ≥ k distinct hashes,
    else the exact distinct count (the sketch is lossless below k — standard
    KMV small-range behavior). Estimate is a correctly-rounded double of two
    exact integers, so it is engine-independent.
    """
    key_list = list(keys)
    h = _kmv_hash(F.col(value_col).cast("string"))
    # NULL is not a value (COUNT DISTINCT convention) — and Spark's ascending
    # window sort is NULLS FIRST while SQL engines default NULLS LAST, so an
    # unfiltered null hash would also poison the top-k disagreement-free
    hashed = (
        df.filter(F.col(value_col).isNotNull()).select(*key_list, h.alias("__h")).distinct()
    )
    if key_list:
        ranked = hashed.withColumn(
            "__rk", F.row_number().over(W.partitionBy(*key_list).orderBy("__h"))
        )
        topk = ranked.filter(F.col("__rk") <= k)
        grouped = topk.groupBy(*key_list)
    else:
        # TakeOrderedAndProject: per-partition top-k merged at the driver —
        # no single-partition window over every distinct hash
        topk = hashed.orderBy("__h").limit(k)
        grouped = topk.groupBy()
    agg = grouped.agg(
        F.count(F.lit(1)).alias("n_hashes"),
        F.max("__h").alias("kth_min_hash"),
    )
    est = F.when(
        F.col("n_hashes") < k,
        F.col("n_hashes").cast("double"),
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(float(P31)) / F.col("kth_min_hash")
    )
    return agg.withColumn("distinct_est", F.round(est, 4))


def kmv_sketch(
    df: DataFrame,
    value_col: str,
    *,
    k: int = 256,
    keys=(),
) -> DataFrame:
    """Per-group MERGEABLE sketch representation: keys + ``sketch`` — the
    sorted array of the group's (up to) k smallest distinct hashes.

    This is the form sketches ship between stages/datasets: k longs per
    group regardless of group size. Same pipeline as :func:`kmv_distinct`
    but keeps the hash set instead of collapsing to the k-th min.
    """
    key_list = list(keys)
    h = _kmv_hash(F.col(value_col).cast("string"))
    hashed = (
        df.filter(F.col(value_col).isNotNull()).select(*key_list, h.alias("__h")).distinct()
    )
    if key_list:
        ranked = hashed.withColumn(
            "__rk", F.row_number().over(W.partitionBy(*key_list).orderBy("__h"))
        )
        topk = ranked.filter(F.col("__rk") <= k).drop("__rk")
    else:
        topk = hashed.orderBy("__h").limit(k)
    return topk.groupBy(*key_list).agg(F.sort_array(F.collect_list("__h")).alias("sketch"))


def kmv_merge(df: DataFrame, *, k: int, keys=()) -> DataFrame:
    """Merge KMV sketches: union the hash sets, keep the k smallest, apply
    the same estimator. KMV's merge is EXACT: the k smallest of a union are
    a subset of the union of each side's k smallest, so
    ``merge(sketch(A), sketch(B)) == sketch(A ∪ B)`` — the estimate from
    merged sketches is bit-identical to re-scanning the union (the property
    the oracle checks). ``df`` holds (keys..., sketch) rows; sketches of the
    same output key group merge together. Each sketch is ≤ k longs, so the
    explode+rank runs over O(groups × k) rows, never the raw data.
    """
    key_list = list(keys)
    ex = df.select(*key_list, F.explode("sketch").alias("__h")).distinct()
    if key_list:
        ranked = ex.withColumn(
            "__rk", F.row_number().over(W.partitionBy(*key_list).orderBy("__h"))
        )
        topk = ranked.filter(F.col("__rk") <= k)
        grouped = topk.groupBy(*key_list)
    else:
        topk = ex.orderBy("__h").limit(k)
        grouped = topk.groupBy()
    agg = grouped.agg(
        F.count(F.lit(1)).alias("n_hashes"),
        F.max("__h").alias("kth_min_hash"),
    )
    est = F.when(
        F.col("n_hashes") < k,
        F.col("n_hashes").cast("double"),
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(float(P31)) / F.col("kth_min_hash")
    )
    return agg.withColumn("distinct_est", F.round(est, 4))


# second independent scrambler for the bloom's numeric fast path
# (xxhash PRIME32_2 — odd, large; products stay < 2^63 after the % P31)
_SCRAMBLE2 = 2_246_822_519


def _bloom_idx(col, base: int, m_bits: int, *, numeric: bool = False):
    if numeric:
        # integral keys skip the per-character fold entirely: one modular
        # multiply is the whole hash — pure whole-stage-codegen arithmetic
        # (the interpreted char fold measured 0.7 s alone on a 150k-row
        # probe at sf0.1; this path is free). pmod keeps both engines on
        # the non-negative branch; base picks the scrambler.
        c = _SCRAMBLE if base == 31 else _SCRAMBLE2
        return (F.pmod(col.cast("long"), F.lit(P31)) * F.lit(c)) % F.lit(P31) % F.lit(m_bits)
    # scrambled polynomial fold (see _kmv_hash: short-key folds are tiny and
    # non-uniform; the multiplicative scramble equidistributes before % m)
    return ((char_fold_hash(col, base, P31) * F.lit(_SCRAMBLE)) % F.lit(P31)) % F.lit(m_bits)


def bloom_build(df: DataFrame, key_col: str, *, m_bits: int = 65536) -> DataFrame:
    """Aggregate an m-bit Bloom filter over ``key_col`` into ONE row holding
    a map<word_idx, word> of 32-bit words (stored in longs so every bit op
    stays in non-negative int64 — portable to any SQL engine, no sign-bit
    hazards).

    Two portable polynomial hash functions (base-31/base-131 scrambled
    folds) set 2 bits per key; the per-word ``bit_or`` aggregate is
    map-side combinable, so the build is one narrow scan + an exchange of
    at most m/32 rows regardless of input size. The result is a pure
    function of the key SET — bit-for-bit reproducible across engines and
    partitionings, unlike engine-native bloom aggregates whose layout is
    implementation-defined.
    """
    k = F.col(key_col)
    numeric = dict(df.dtypes).get(key_col) in ("tinyint", "smallint", "int", "bigint")
    if not numeric:
        k = k.cast("string")
    idxs = df.select(
        F.explode(
            F.array(
                _bloom_idx(k, 31, m_bits, numeric=numeric),
                _bloom_idx(k, 131, m_bits, numeric=numeric),
            )
        ).alias("__idx")
    )
    # shift amounts are columns, so go through call_function (the Python
    # shiftleft/shiftright wrappers only accept int literals)
    bit = F.call_function("shiftleft", F.lit(1).cast("long"), (F.col("__idx") % 32).cast("int"))
    words = idxs.groupBy(F.shiftright("__idx", 5).cast("int").alias("w")).agg(
        F.bit_or(bit).alias("bw")
    )
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "bw"))).alias("bloom")
    )


def bloom_member(key, bloom_col, *, m_bits: int = 65536, numeric: bool = False):
    """Membership test column for ``key`` against a :func:`bloom_build` map
    (both hash bits set). Deterministic false positives at the standard
    (1-e^(-2n/m))^2 rate; never a false negative. ``numeric`` must match
    the build side's key dtype (integral build keys hash numerically)."""
    k = F.col(key) if isinstance(key, str) else key
    if not numeric:
        k = k.cast("string")
    checks = []
    for base in (31, 131):
        i = _bloom_idx(k, base, m_bits, numeric=numeric)
        word = F.coalesce(
            F.element_at(bloom_col, F.call_function("shiftright", i, F.lit(5)).cast("int")),
            F.lit(0),
        )
        bit = F.call_function("shiftleft", F.lit(1).cast("long"), (i % 32).cast("int"))
        checks.append(word.bitwiseAND(bit) != 0)
    return checks[0] & checks[1]


def _cms_fold(col):
    """Scrambled char-fold in [0, P31) — the row-hash input for the CMS."""
    return (char_fold_hash(col, 31, P31) * F.lit(_SCRAMBLE)) % F.lit(P31)


def _cms_row_idx(fold_col, r: int, width: int):
    """Affine row hash h_r(x) = ((2r+1)·s(x) + r² + 17) mod P mod width —
    the pairwise-independent family the minhash kernel also uses; every
    intermediate < 2^35, exact in int64 on any engine."""
    return (((2 * r + 1) * fold_col + F.lit(r * r + 17)) % F.lit(P31) % F.lit(width)).cast("int")


def cms_build(
    df: DataFrame,
    value_col: str,
    *,
    weight: str | None = None,
    depth: int = 4,
    width: int = 512,
    keys=(),
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan, J. Algorithms 2005) as a
    mergeable fixed-size aggregate: ``depth`` hash rows × ``width`` counters;
    every occurrence of x adds its weight to cell (r, h_r(x)) for each row r.

    Output: keys + (r, i, c) — only the nonzero cells, ≤ depth·width rows
    per group regardless of input size or value cardinality. Merging two
    sketches (same depth/width) is a union + re-sum on (keys, r, i). The
    shuffle carries map-side-combined partial cell sums — the value domain
    itself NEVER shuffles (the same contract as the Misra-Gries heavy
    hitters, but answering point queries instead of top-k): at 100 TB the
    reduce side sees ≤ partitions·depth·width rows.

    Deterministic: the scrambled char-fold row hashes are exact int64, so
    the sketch is a pure function of the input multiset and the whole
    construction is expressible in ANSI SQL for oracle checking (unlike
    implementation-defined HLL/CMS registers in engine built-ins).
    """
    key_list = list(keys)
    w_col = F.lit(1).cast("long") if weight is None else F.col(weight).cast("long")
    base = (
        df.filter(F.col(value_col).isNotNull())
        .select(*key_list, _cms_fold(F.col(value_col).cast("string")).alias("__s"), w_col.alias("__w"))
    )
    cells = base.select(
        *key_list,
        "__w",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(r).alias("r"), _cms_row_idx(F.col("__s"), r, width).alias("i")
                )
                for r in range(depth)
            ])
        ).alias("__cell"),
    )
    return cells.groupBy(
        *key_list, F.col("__cell.r").alias("r"), F.col("__cell.i").alias("i")
    ).agg(F.sum("__w").alias("c"))


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    value_col: str,
    *,
    depth: int = 4,
    width: int = 512,
    keys=(),
) -> DataFrame:
    """Point queries against a :func:`cms_build` sketch: for each probe value
    x, ``est = min_r c[r, h_r(x)]`` (missing cell = 0) — an upper bound on
    the true count, within ε·N with probability 1 − (1/e)^depth at
    width = ⌈e/ε⌉. Probe cells join the ≤ depth·width-row sketch, which
    broadcasts; the probe side never shuffles.
    """
    key_list = list(keys)
    pcells = probes.select(
        *key_list,
        F.col(value_col),
        _cms_fold(F.col(value_col).cast("string")).alias("__s"),
    ).select(
        *key_list,
        value_col,
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(r).alias("r"), _cms_row_idx(F.col("__s"), r, width).alias("i")
                )
                for r in range(depth)
            ])
        ).alias("__cell"),
    ).select(*key_list, value_col, F.col("__cell.r").alias("r"), F.col("__cell.i").alias("i"))
    joined = pcells.join(F.broadcast(sketch), [*key_list, "r", "i"], "left")
    return joined.groupBy(*key_list, value_col).agg(
        F.min(F.coalesce("c", F.lit(0))).cast("long").alias("est")
    )


# ---------------------------------------------------------------------------
# HyperLogLog (Flajolet et al. 2007) with a PORTABLE register construction.
# Canonical HLL is "implementation-defined" only through its hash; with the
# same scrambled char-fold the KMV/CMS/Bloom sketches use, every register is
# a pure function of the value set and the whole estimator is bit-for-bit
# reproducible in ANSI SQL. m = 2^HLL_P registers; the 31-bit hash splits
# into a register index (low HLL_P bits) and a (31-HLL_P)-bit suffix whose
# leading-zero rank feeds the register max.
#
# Scale shape: ONE map-side-combinable groupBy(keys, register) max — the
# value domain never shuffles (each mapper emits at most m partial maxima
# per group), then an m-row-per-group final fold. The indicator sum
# Σ 2^(-M_j) is kept SCALED as Σ 2^(W_MAX-M_j) — an exact int64 — so the
# only floating-point steps are one division and (in the small range) one
# log, rounded to 4 decimals for comparison.
# ---------------------------------------------------------------------------

HLL_P = 6  # 64 registers
_HLL_M = 1 << HLL_P
_HLL_WBITS = 31 - HLL_P  # suffix width
_HLL_RHO_MAX = _HLL_WBITS + 1  # rho when the suffix is all zeros
# alpha_m for m=64 (Flajolet et al., Fig. 3): 0.7213 / (1 + 1.079/m)
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / _HLL_M)


def _hll_rho(w):
    """Leading-zero rank of the _HLL_WBITS-bit suffix ``w`` (1-based position
    of the highest set bit from the left, _HLL_RHO_MAX when w = 0).

    bit_length(w) = length(bin(w)) for w >= 1 — exact in both engines,
    no float log2 at any power-of-two boundary.
    """
    return F.when(w == 0, F.lit(_HLL_RHO_MAX)).otherwise(
        F.lit(_HLL_RHO_MAX) - F.length(F.conv(w.cast("string"), 10, 2))
    )


def hll_registers(df: DataFrame, value_col: str, *, keys=()) -> DataFrame:
    """Per-group HLL register table: keys + (reg, m) with m = max rho.

    Mergeable by construction: max over unioned register tables == register
    table of the union (hll_merge)."""
    key_list = list(keys)
    h = _kmv_hash(F.col(value_col).cast("string")) - 1  # [0, P31)
    hashed = df.filter(F.col(value_col).isNotNull()).select(
        *key_list,
        (h % _HLL_M).alias("reg"),
        _hll_rho(F.floor(h / _HLL_M).cast("long")).alias("rho"),
    )
    return hashed.groupBy(*key_list, "reg").agg(F.max("rho").alias("m"))


def hll_estimate(registers: DataFrame, *, keys=()) -> DataFrame:
    """Fold a register table into the HLL cardinality estimate.

    Output: keys + (n_regs, v_zero, sum_scaled, distinct_est) where
    sum_scaled = Σ_j 2^(W+1-M_j) over all m registers (absent ⇒ M_j = 0 ⇒
    2^(W+1)) — an exact int64; distinct_est applies the small-range linear
    counting correction (E ≤ 2.5m, V > 0 ⇒ m·ln(m/V)).
    """
    key_list = list(keys)
    scaled = F.lit(1 << _HLL_RHO_MAX) / F.pow(F.lit(2.0), F.col("m"))
    agg = registers.groupBy(*key_list).agg(
        F.count(F.lit(1)).alias("n_regs"),
        F.sum(scaled.cast("long")).alias("present_scaled"),
    )
    v_zero = F.lit(_HLL_M) - F.col("n_regs")
    sum_scaled = (
        F.col("present_scaled") + v_zero * F.lit(1 << _HLL_RHO_MAX)
    ).alias("sum_scaled")
    raw = (
        F.lit(_HLL_ALPHA * _HLL_M * _HLL_M * (1 << _HLL_RHO_MAX))
        / F.col("sum_scaled").cast("double")
    )
    est = F.when(
        (raw <= F.lit(2.5 * _HLL_M)) & (v_zero > 0),
        F.lit(float(_HLL_M)) * F.log(F.lit(float(_HLL_M)) / v_zero.cast("double")),
    ).otherwise(raw)
    return agg.select(
        *key_list,
        "n_regs",
        v_zero.alias("v_zero"),
        sum_scaled,
    ).withColumn("distinct_est", F.round(est, 4))


def hll_distinct(df: DataFrame, value_col: str, *, keys=()) -> DataFrame:
    """HLL distinct-count estimate of ``value_col`` per group — the
    register build composed with the estimator fold."""
    return hll_estimate(hll_registers(df, value_col, keys=keys), keys=keys)


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    *,
    keys=(),
    bins: int = 64,
    percents: Sequence[int] = (50, 95),
) -> DataFrame:
    """Mergeable QUANTILE summary — the two-pass equi-width histogram
    sketch, completing the sketch family (KMV/HLL distinct, CMS/heavy
    hitters frequency, Bloom membership): pass 1 takes per-group integer
    min/max, pass 2 bins every value into ``bins`` equal-width buckets of
    [min, max+1) with pure int arithmetic, and quantiles interpolate
    linearly inside the hit bucket. Bucket counts are map-side-combinable
    sums — histograms for the same group/range merge by ADDITION, the
    property that lets per-partition/per-day summaries roll up without
    touching data again (the KMV-merge argument, for quantiles).

    Determinism: ``value_col`` must be integer-exact (cast/scale floats
    first — the cents discipline); bucket index ``(x-mn)·bins div span``
    and target rank ``ceil(p·n/100)`` are exact ints, so the only doubles
    are the final interpolation — one fixed expression over exact ints,
    identical in ANSI SQL. Estimation error is bounded by the bucket
    width (span/bins), the standard equi-width trade.

    Output: keys + (n, mn, mx) + one ``p{P}_est`` per requested percent.
    """
    key_list = list(keys)
    v = F.col(value_col)
    stats = df.groupBy(*key_list).agg(
        F.count(F.lit(1)).alias("n"),
        F.min(v).alias("mn"),
        F.max(v).alias("mx"),
    )
    span = F.col("mx") - F.col("mn") + F.lit(1)
    binned = (
        df.join(F.broadcast(stats), key_list or None, "inner")
        if key_list
        else df.crossJoin(F.broadcast(stats))
    )
    # floor(double ratio) == exact int division here: products stay well
    # under 2^53 and true quotients sit >= 1/span from any wrong integer,
    # so the correctly-rounded double cannot cross a floor boundary —
    # identical in ANSI SQL via floor(a*b/s)
    bin_idx = F.least(
        F.lit(bins - 1),
        F.floor((v - F.col("mn")) * bins / span).cast("long"),
    )
    counts = binned.select(
        *key_list, F.col("n"), F.col("mn"), F.col("mx"), bin_idx.alias("bin")
    ).groupBy(*key_list, "n", "mn", "mx", "bin").agg(
        F.count(F.lit(1)).alias("c")
    )
    wcum = W.partitionBy(*(key_list or [F.lit(1)])).orderBy("bin")
    cum = counts.withColumn("cum", F.sum("c").over(wcum)).withColumn(
        "cum_before", F.col("cum") - F.col("c")
    )
    out = None
    span_d = (F.col("mx") - F.col("mn") + F.lit(1)).cast("double")
    for p in percents:
        # target rank ceil(p*n/100) as exact ints
        t = F.floor((F.col("n") * p + F.lit(99)) / 100).cast("long")
        hit = cum.filter(F.col("cum") >= t).groupBy(*key_list, "n", "mn", "mx").agg(
            F.min(F.struct("bin", "c", "cum_before")).alias("h")
        )
        est = (
            F.col("mn").cast("double")
            + F.col("h.bin").cast("double") * span_d / F.lit(float(bins))
            + span_d
            / F.lit(float(bins))
            * (t - F.col("h.cum_before")).cast("double")
            / F.col("h.c").cast("double")
        )
        part = hit.select(
            *key_list, "n", "mn", "mx", F.round(est, 4).alias(f"p{p}_est")
        )
        join_keys = key_list + ["n", "mn", "mx"]
        out = part if out is None else out.join(part, join_keys)
    return out


def join_size_estimate(
    a: DataFrame,
    a_key: str,
    b: DataFrame | None = None,
    b_key: str | None = None,
    *,
    sample_den: int = 16,
) -> DataFrame:
    """Join-cardinality estimation by COORDINATED key sampling (the
    end-biased-sampling estimator, Estan & Naughton ICDE'06 family): keep
    only rows whose KEY hashes into the lowest 1/sample_den of the hash
    space — the same hash on both sides, so any key is sampled on both or
    neither — then |A ⋈ B| = Σ_k f_A(k)·f_B(k) over the sampled keys,
    scaled back by ``sample_den``. ``b=None`` estimates the SELF-join size
    Σ_k f(k)² — the skew diagnostic that prices a groupBy/distinct/join
    before running it (it is exactly the second frequency moment F₂).

    Plan: the key-hash filter evaluates row-local BEFORE any exchange, so
    shuffle volume drops by the sampling factor; per-key counts are
    combinable; the sampled-key join is 1/sample_den of the key domain.
    Deterministic hash → the estimate is a pure function of the input
    (engine-reproducible, retry-stable), unlike rand()-sampled estimators.

    Returns one row: (n_sampled_keys, sampled_pairs, est_pairs).
    """
    from milan_spark.operators.sampling import hash_bucket

    n_space = 1 << 30
    thr = n_space // sample_den
    fa = (
        a.filter(hash_bucket(F.col(a_key), n_space) < thr)
        .groupBy(F.col(a_key).alias("key"))
        .agg(F.count(F.lit(1)).alias("fa"))
    )
    if b is None:
        pairs = fa.select("key", (F.col("fa") * F.col("fa")).alias("p"))
    else:
        fb = (
            b.filter(hash_bucket(F.col(b_key or a_key), n_space) < thr)
            .groupBy(F.col(b_key or a_key).alias("key"))
            .agg(F.count(F.lit(1)).alias("fb"))
        )
        pairs = fa.join(fb, "key").select("key", (F.col("fa") * F.col("fb")).alias("p"))
    return pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_sampled_keys"),
        F.coalesce(F.sum("p"), F.lit(0)).cast("long").alias("sampled_pairs"),
        (F.coalesce(F.sum("p"), F.lit(0)) * sample_den).cast("long").alias("est_pairs"),
    )
