"""Deduplication operators for LLM data pipelines (SURVEY.md §7 phase 6).

Four families, all shuffle-scalable DataFrame plans (no Python UDFs, no
driver-side loops):

- exact       — hash group-by on content, earliest id survives;
- n-gram Jaccard — exact pairwise similarity via an inverted shingle index
  (explode → self-join on shingle → count shared / union);
- MinHash+LSH — signature = min over shingle hashes under k affine
  permutations; banding buckets candidates (join on a single band-hash long),
  candidates are verified with the exact Jaccard so the output contains no
  false positives, and banding (32 bands × 2 rows) keeps the false-negative
  probability at the 0.8 threshold below 1e-14;
- SimHash     — 62-bit majority-vote fingerprint over token hashes; banded
  into 4 × 16-bit chunks for candidate generation (Hamming ≤ 3 ⇒ at least one
  chunk matches exactly), verified with bit_count(xor).

All hash arithmetic is integer-exact (see operators.text) so every pipeline
is reproducible bit-for-bit and oracle-checkable in ANSI SQL.

At 100 TB these are the standard distributed formulations: the shingle
inverted index and LSH band buckets shuffle on content-derived keys (uniform
by construction), and frequency caps (``max_shingle_freq``) bound the
worst-case join fan-out on stop-shingles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

from milan_spark.operators.text import P31, token_hash62, tokenize


def exact_dedup(df: DataFrame, content_cols, id_col: str) -> DataFrame:
    """Exact dedup: group identical content, earliest id survives.

    Output: content group survivors with duplicate counts. Map-side partial
    aggregation applies; survivors join back by id if full rows are needed.
    """
    if isinstance(content_cols, str):
        content_cols = [content_cols]
    return df.groupBy(*content_cols).agg(
        F.min(id_col).alias("survivor_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


def shingles(tokens: Column, n: int) -> Column:
    """Distinct word n-grams of a token array (empty when < n tokens)."""
    grams = F.transform(
        F.sequence(F.lit(1), F.array_size(tokens) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(tokens, i, n)),
    )
    return F.when(F.array_size(tokens) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def _shingle_sets(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    return df.select(
        F.col(id_col).alias("__id"), shingles(tokenize(text_col), n).alias("__sh")
    ).filter(F.array_size("__sh") > 0)


def _verify_jaccard(cands: DataFrame, sets: DataFrame, threshold: float) -> DataFrame:
    """Exact Jaccard on candidate pairs via array_intersect on the shingle sets."""
    a = sets.select(F.col("__id").alias("id_a"), F.col("__sh").alias("__sh_a"))
    b = sets.select(F.col("__id").alias("id_b"), F.col("__sh").alias("__sh_b"))
    shared = F.array_size(F.array_intersect("__sh_a", "__sh_b"))
    union = F.array_size("__sh_a") + F.array_size("__sh_b") - shared
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("jaccard", shared.cast("double") / union)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 2,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact near-duplicate pairs: Jaccard over distinct word n-grams ≥
    threshold, via a **prefix-filtered** inverted index (SSJoin/PPJoin
    family): each document indexes only its ⌈(1-τ)·|s|⌉+1 globally-rarest
    shingles — any pair with J ≥ τ must collide on at least one prefix
    shingle (pigeonhole on the canonical rarest-first order), so candidate
    generation is exact while stop-shingles never fan out. Candidates are
    then verified with the exact Jaccard.

    This is the 100 TB formulation: the naive inverted index explodes
    quadratically on frequent shingles; the prefix filter bounds fan-out by
    document length, not corpus frequency.
    """
    sets = _shingle_sets(df, id_col, text_col, n)
    ex = sets.select("__id", F.array_size("__sh").alias("__n"), F.explode("__sh").alias("__s"))
    freq = ex.groupBy("__s").agg(F.count(F.lit(1)).alias("__f"))
    # canonical order: rarest shingle first, shingle text as tiebreak
    w = W.partitionBy("__id").orderBy("__f", "__s")
    prefix_len = F.ceil(F.lit(1.0 - threshold) * F.col("__n")).cast("int") + 1
    prefix = (
        ex.join(freq, "__s")
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= prefix_len)
        .select("__id", "__s")
    )
    a = prefix.select(F.col("__id").alias("id_a"), "__s")
    b = prefix.select(F.col("__id").alias("id_b"), "__s")
    cands = a.join(b, "__s").filter(F.col("id_a") < F.col("id_b")).select("id_a", "id_b").distinct()
    return _verify_jaccard(cands, sets, threshold)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 2,
    num_hashes: int = 64,
    bands: int = 32,
    threshold: float = 0.8,
) -> DataFrame:
    """MinHash+LSH near-duplicate pairs, exact-verified.

    Permutations are affine maps h_i(x) = ((2i+1)·x + i²+17) mod 2^31-1 over
    base shingle hashes; band signature folds its rows into one long join key.
    With 32 bands × 2 rows, P[miss] at jaccard τ is (1-τ²)^32 — 4e-15 at
    τ=0.8 — and every candidate is verified exactly, so output = exact pairs.
    """
    rows_per_band = num_hashes // bands
    sets = _shingle_sets(df, id_col, text_col, n)
    base = sets.select(
        "__id",
        F.explode(
            F.transform(
                F.col("__sh"),
                lambda s: F.aggregate(
                    F.regexp_extract_all(s, F.lit("."), 0),
                    F.lit(0).cast("long"),
                    lambda acc, ch: (acc * 31 + F.ascii(ch)) % P31,
                ),
            )
        ).alias("__h"),
    )
    # minhash per (doc, permutation i): explode the permutation index
    perms = base.select(
        "__id",
        "__h",
        F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("__i"),
    )
    mh = (
        perms.withColumn(
            "__mh",
            ((F.lit(2) * F.col("__i") + 1) * F.col("__h") + F.col("__i") * F.col("__i") + 17) % P31,
        )
        .groupBy("__id", "__i")
        .agg(F.min("__mh").alias("__mh"))
    )
    # fold each band's rows into a single long signature (order by i); the
    # fold stays below 2^37 (acc < 2^31, ×37) so it never overflows int64.
    # Fold collisions only add candidates — exact verification removes them.
    band_sig = (
        mh.withColumn("__band", (F.col("__i") / rows_per_band).cast("int"))
        .groupBy("__id", "__band")
        .agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("__i", "__mh"))),
                F.lit(0).cast("long"),
                lambda acc, s: (acc * 37 + s["__mh"]) % P31,
            ).alias("__sig")
        )
    )
    a = band_sig.select(F.col("__id").alias("id_a"), "__band", "__sig")
    b = band_sig.select(F.col("__id").alias("id_b"), "__band", "__sig")
    cands = (
        a.join(b, ["__band", "__sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    return _verify_jaccard(cands, sets, threshold)


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """62-bit SimHash fingerprint per document: for each bit, majority vote of
    token-hash bits (with multiplicity); bit set iff strictly more ones."""
    toks = df.select(F.col(id_col).alias("__id"), F.explode(tokenize(text_col)).alias("__t"))
    hashed = toks.select("__id", token_hash62(F.col("__t")).alias("__h"))
    bits = hashed.select(
        "__id",
        "__h",
        F.explode(F.sequence(F.lit(0), F.lit(61))).alias("__b"),
    ).withColumn(
        # shift amount is a column, so go through SQL (F.shiftright needs a literal)
        "__vote",
        F.expr("CASE WHEN (shiftright(__h, __b) & 1) = 1 THEN 1 ELSE -1 END"),
    )
    return (
        bits.groupBy("__id", "__b")
        .agg(F.sum("__vote").alias("__v"))
        .withColumn("__bit", F.when(F.col("__v") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long")))
        .groupBy("__id")
        .agg(F.sum(F.expr("shiftleft(__bit, __b)")).alias("simhash"))
        .select(F.col("__id").alias(id_col), "simhash")
    )


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-duplicate pairs: Hamming distance ≤ max_hamming.

    Candidates via 4 × 16-bit chunk equality (pigeonhole: ≤3 differing bits
    leave ≥1 of 4 chunks identical), then exact bit_count(xor) verification.
    """
    sh = simhash(df, id_col, text_col)
    chunks = sh.select(
        F.col(id_col).alias("__id"),
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("__c"),
    ).withColumn("__chunk", F.expr("shiftright(simhash, __c * 16) & 65535"))
    a = chunks.select(F.col("__id").alias("id_a"), F.col("simhash").alias("__sh_a"), "__c", "__chunk")
    b = chunks.select(F.col("__id").alias("id_b"), F.col("simhash").alias("__sh_b"), "__c", "__chunk")
    return (
        a.join(b, ["__c", "__chunk"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "__sh_a", "__sh_b")
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("__sh_a").bitwiseXOR(F.col("__sh_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
