"""Text-analysis operators for LLM data pipelines (beyond the reference —
SURVEY.md §7 phase 6; the reference has no scalar string library at all,
§2.2 'String/date/math scalar functions: none exist in the IR').

Design rules:
- everything is JVM-side Spark SQL (regexp/array/higher-order functions) —
  no Python UDFs in these hot paths;
- all numeric derivations are integer-exact (counts, polynomial hashes with
  moduli small enough that no int64 overflow occurs), so results are
  reproducible across engines and partitionings bit-for-bit;
- ratios are double divisions of exact integers — deterministic.

Hash parameters: token hashes are base-31/base-131 polynomial folds over
character codes mod p31 = 2^31-1 (products stay < 2^36); document-level
fingerprints fold mod p53 (prime < 2^53, products < 2^58).
"""

from __future__ import annotations

import pandas as pd  # module-level so pandas_udf annotations resolve under PEP 563

from pyspark.sql import Column, DataFrame, functions as F

TOKEN_RE = "[a-z0-9]+"
PUNCT_RE = "[.,;:!?]"
P31 = 2_147_483_647  # 2^31 - 1
P53 = 9_007_199_254_740_881  # largest prime < 2^53

# tiny per-language marker vocabularies for the n-gram/stopword language
# heuristic; scores are deterministic token-membership counts
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in", "is"],
    "es": ["el", "la", "de", "que", "y", "los"],
    "fr": ["le", "la", "de", "et", "les", "des"],
    "de": ["der", "die", "und", "das", "ist", "ein"],
}
STOPWORDS = sorted({w for ws in LANG_MARKERS.values() for w in ws})


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokenize(col) -> Column:
    """Lowercased ``[a-z0-9]+`` tokens (whitespace+punctuation splitting)."""
    return F.regexp_extract_all(F.lower(_c(col)), F.lit(TOKEN_RE), 0)


def token_count(col) -> Column:
    return F.array_size(tokenize(col))


# GPT-2-style pre-tokenizer split, simplified to a lookahead-free form (RE2 —
# the SQL-oracle engine — has no lookahead): contraction suffixes, then
# space-prefixed letter runs, digit runs, and symbol runs. Ordered alternation
# behaves identically in Java regex and RE2's default leftmost-first mode.
BPE_SPLIT_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s']+"


def bpe_like_tokens(col) -> Column:
    """BPE-ish pre-tokenization over lowercased text: the segmentation a
    byte-pair tokenizer starts from (token-budget estimates, packing inputs).
    Unlike :func:`tokenize` it keeps punctuation/symbol runs and contraction
    suffixes as their own tokens, so counts track real tokenizer inputs far
    more closely than whitespace words."""
    return F.regexp_extract_all(F.lower(_c(col)), F.lit(BPE_SPLIT_RE), 0)


def bpe_token_count(col) -> Column:
    return F.array_size(bpe_like_tokens(col))


def punct_count(col) -> Column:
    return F.array_size(F.regexp_extract_all(_c(col), F.lit(PUNCT_RE), 0))


def stopword_count(tokens: Column, words=STOPWORDS) -> Column:
    """Token-membership count with multiplicity (not distinct)."""
    return F.array_size(F.filter(tokens, lambda t: t.isin(*words)))


def char_fold_hash(col, base: int = 31, mod: int = P53) -> Column:
    """Polynomial rolling hash of a string: fold (acc*base + ascii(ch)) % mod.

    The document-fingerprint primitive; char list via regexp so the identical
    fold is expressible in ANSI SQL (list_reduce) for oracle checking.
    """
    chars = F.regexp_extract_all(_c(col), F.lit("."), 0)
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * base + F.ascii(ch)) % mod,
    )


def token_hash31(token: Column, base: int = 31) -> Column:
    """base-31 polynomial hash of one token mod 2^31-1."""
    chars = F.regexp_extract_all(token, F.lit("."), 0)
    return F.aggregate(chars, F.lit(0).cast("long"), lambda acc, ch: (acc * base + F.ascii(ch)) % P31)


def token_hash62(token: Column) -> Column:
    """62-bit token hash: base-31 and base-131 folds combined (h1 + h2<<31)."""
    return token_hash31(token, 31) + token_hash31(token, 131) * F.lit(2_147_483_648).cast("long")


def rolling_min_hash(col, window: int = 8) -> Column:
    """Winnowing-style fingerprint: minimum of the rolling ``window``-char
    polynomial hashes across the document.

    Executed as an Arrow-vectorized Pandas UDF: per document the W rolling
    hashes are W numpy passes over the code-point array (``h = (h*31 +
    codes[j:j+n]) % p31``), exact in int64. This is the documented UDF
    exception in a JVM-first module: the expression formulation (a
    higher-order ``transform`` over positions) is evaluated interpreted,
    per-position, per-window-char — orders of magnitude more dispatch than
    the same arithmetic vectorized. Values are identical: the same
    ``(acc*31 + code) % p31`` fold over the same code points
    (``utf-32-le`` decode ≡ per-char ``ascii``).
    """
    import numpy as np

    @F.pandas_udf("long")
    def roll(texts: pd.Series) -> pd.Series:
        out = np.zeros(len(texts), np.int64)
        for k, t in enumerate(texts):
            if not t:
                continue
            codes = np.frombuffer(t.encode("utf-32-le"), np.uint32).astype(np.int64)
            n = len(codes) - (window - 1)
            if n < 1:
                h = 0
                for c in codes:
                    h = (h * 31 + int(c)) % P31
                out[k] = h
                continue
            h = np.zeros(n, np.int64)
            for j in range(window):
                h = (h * 31 + codes[j : j + n]) % P31
            out[k] = h.min()
        return pd.Series(out)

    return roll(_c(col))


def lang_scores(tokens: Column) -> dict[str, Column]:
    return {lang: stopword_count(tokens, words) for lang, words in LANG_MARKERS.items()}


def lang_id(tokens: Column) -> Column:
    """Deterministic argmax over marker-token counts; fixed tie order
    en > es > fr > de > und ('und' = undetermined when all scores are 0)."""
    s = lang_scores(tokens)
    best = F.greatest(*s.values())
    return (
        F.when(best == 0, F.lit("und"))
        .when(s["en"] == best, F.lit("en"))
        .when(s["es"] == best, F.lit("es"))
        .when(s["fr"] == best, F.lit("fr"))
        .otherwise(F.lit("de"))
    )


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append deterministic quality-signal columns used for corpus filtering:
    token/char counts, mean token length, punctuation & stopword ratios, and
    a combined [0,1] score (all ratios are divisions of exact integers)."""
    toks = tokenize(text_col)
    n_tok = F.array_size(toks)
    tok_chars = F.aggregate(toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t))
    n_chars = F.length(_c(text_col))
    n_punct = punct_count(text_col)
    n_stop = stopword_count(toks)
    safe_tok = F.greatest(n_tok, F.lit(1))
    mean_tok_len = tok_chars.cast("double") / safe_tok
    stop_ratio = n_stop.cast("double") / safe_tok
    punct_ratio = n_punct.cast("double") / F.greatest(n_chars, F.lit(1))
    length_factor = F.least(n_tok, F.lit(64)).cast("double") / F.lit(64.0)
    score = stop_ratio * 0.4 + (F.lit(1.0) - punct_ratio) * 0.2 + length_factor * 0.4
    return (
        df.withColumn("n_tokens", n_tok)
        .withColumn("mean_token_len", mean_tok_len)
        .withColumn("punct_ratio", punct_ratio)
        .withColumn("stopword_ratio", stop_ratio)
        .withColumn("quality_score", score)
    )


def word_ngrams(col, n: int) -> Column:
    """Array of space-joined word ``n``-grams over :func:`tokenize` tokens.

    Guarded for short docs: fewer than ``n`` tokens yields an empty array.
    String grams (not hashes) so a DuckDB oracle can rebuild them verbatim
    with ``list_transform(range(...)) + list slicing``; hash-shingle paths
    for joins at corpus scale live in ``operators.dedup``.

    Built by zip_with over ``n`` shifted slices (the ``_shingle_sets``
    layout), NOT ``transform(sequence, i -> slice(toks, i, n))``: the
    per-position slice is O(len), making that shape O(len²) per doc in
    interpreted higher-order expressions — measured 4× slower on the
    repetition queries at sf0.1.
    """
    toks = tokenize(col)
    m = F.array_size(toks) - (n - 1)
    acc = F.slice(toks, 1, m)
    for j in range(1, n):
        nxt = F.slice(toks, j + 1, m)
        acc = F.zip_with(acc, nxt, lambda a, b: F.concat_ws(" ", a, b))
    return F.when(m >= 1, acc).otherwise(F.array().cast("array<string>"))


def repetition_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document repetition signals (the Gopher/MassiveText rule family:
    Rae et al. 2021, §A.1.1 'repetition removal'): the fraction of all word
    bigrams / trigrams taken up by the single most frequent one.

    ONE distributed pipeline for both gram sizes: grams of both orders tag
    and explode together, one (doc, n, gram) count aggregate (map-side
    combinable), then a conditional per-doc rollup — two shuffles total,
    both on uniform keys; no per-doc Python anywhere. Returns
    (id, n_bigrams, top_bigram_cnt, n_trigrams, top_trigram_cnt).
    """
    tagged = df.select(
        F.col(id_col).alias("__id"),
        F.explode(
            F.array(
                F.struct(F.lit(2).alias("n"), word_ngrams(text_col, 2).alias("g")),
                F.struct(F.lit(3).alias("n"), word_ngrams(text_col, 3).alias("g")),
            )
        ).alias("t"),
    ).select("__id", F.col("t.n").alias("__n"), F.explode("t.g").alias("__gram"))
    counts = tagged.groupBy("__id", "__n", "__gram").agg(F.count(F.lit(1)).alias("__c"))
    two = F.col("__n") == 2
    return counts.groupBy("__id").agg(
        F.sum(F.when(two, F.col("__c")).otherwise(F.lit(0))).alias("n_bigrams"),
        F.max(F.when(two, F.col("__c")).otherwise(F.lit(0))).alias("top_bigram_cnt"),
        F.sum(F.when(~two, F.col("__c")).otherwise(F.lit(0))).alias("n_trigrams"),
        F.max(F.when(~two, F.col("__c")).otherwise(F.lit(0))).alias("top_trigram_cnt"),
    )


# PII patterns kept in the RE2-compatible subset (no lookahead/backrefs) so
# the same pattern string runs identically under Java regex (Spark) and RE2
# (DuckDB oracle). Pipelines scrub BEFORE tokenization so addresses/numbers
# never reach the training corpus.
EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"


def pii_counts(col) -> tuple[Column, Column]:
    """(n_emails, n_phones) found in a text column — JVM-side regexp."""
    c = _c(col)
    return (
        F.array_size(F.regexp_extract_all(c, F.lit(EMAIL_RE), F.lit(0))),
        F.array_size(F.regexp_extract_all(c, F.lit(PHONE_RE), F.lit(0))),
    )


def scrub_pii(col) -> Column:
    """Replace emails/phones with typed placeholder tags. Order matters:
    emails first (an email never contains a phone pattern, but scrubbing
    phones first could split a numeric local-part mid-match)."""
    c = _c(col)
    return F.regexp_replace(
        F.regexp_replace(c, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )


def collocations(
    df: DataFrame,
    text_col: str = "text",
    *,
    min_count: int = 5,
    min_lift: tuple[int, int] = (5, 4),
) -> DataFrame:
    """Corpus-level collocation mining: bigrams whose observed frequency
    beats independence by ``min_lift`` (lift = PMI without the log:
    n_ab·N / (n_a·n_b) — same ranking, no transcendental function, so the
    score is a single correctly-rounded IEEE division reproducible across
    engines).

    Scale shape: unigram and bigram counts are two map-side-combinable
    aggregates; component counts attach to the (min_count-pruned) bigram
    table by two joins keyed on a WORD — the key's join fan-out is the
    number of distinct bigrams containing it (vocabulary-bounded, not
    corpus-bounded), so stopword skew is capped and no broadcast of a
    possibly-huge vocabulary is assumed. The independence test multiplies
    through in DECIMAL(38,0) — exact for corpora up to ~10^19 tokens, far
    past int64. ``min_lift`` is a rational (num, den) so the threshold
    itself stays integer-exact.

    Returns (gram, n_ab, n_a, n_b, lift) for surviving bigrams.
    """
    d38 = "decimal(38,0)"
    toks = df.select(F.explode(tokenize(text_col)).alias("w"))
    uni = toks.groupBy("w").agg(F.count(F.lit(1)).alias("n_w"))
    total = toks.agg(F.count(F.lit(1)).alias("n_total"))
    big = (
        df.select(F.explode(word_ngrams(text_col, 2)).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= min_count)
        .withColumn("w1", F.split_part(F.col("gram"), F.lit(" "), F.lit(1)))
        .withColumn("w2", F.split_part(F.col("gram"), F.lit(" "), F.lit(2)))
    )
    a = uni.select(F.col("w").alias("w1"), F.col("n_w").alias("n_a"))
    b = uni.select(F.col("w").alias("w2"), F.col("n_w").alias("n_b"))
    joined = big.join(a, "w1").join(b, "w2").crossJoin(F.broadcast(total))
    lift_num = F.col("n_ab").cast(d38) * F.col("n_total").cast(d38)
    lift_den = F.col("n_a").cast(d38) * F.col("n_b").cast(d38)
    lift = (F.col("n_ab").cast("double") * F.col("n_total").cast("double")) / (
        F.col("n_a").cast("double") * F.col("n_b").cast("double")
    )
    num, den = min_lift
    return (
        joined.filter(F.lit(den).cast(d38) * lift_num > F.lit(num).cast(d38) * lift_den)
        .select("gram", "n_ab", "n_a", "n_b", lift.alias("lift"))
    )


def bigram_fluency(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document fluency score from corpus bigram statistics — the
    transcendental-free analog of a CCNet-style LM perplexity filter: a
    document whose bigrams are common across the corpus is fluent; one full
    of never-seen-elsewhere bigrams is gibberish/boilerplate-mangled. Two
    integer statistics per document (both engine-reproducible, no log):

    - ``mean_bigram_freq``: Σ corpus-count(bigram) / n_bigrams, counts taken
      over the whole corpus INCLUDING the document (leave-one-in, stated
      contract — exact and one pass, where leave-one-out would need a second
      self-subtracting aggregate for a score ranking it barely changes);
    - ``rare_rate``: fraction of the doc's bigram occurrences whose corpus
      count is ≤ 1 (i.e. occur nowhere else) — the direct gibberish signal.

    Plan: one map-side-combinable bigram-count aggregate over the corpus,
    then the doc's bigram occurrences join the count table keyed on the
    BIGRAM (fan-out = occurrences of that bigram — vocabulary-bounded skew,
    same argument as :func:`collocations`) and one per-doc combine. No
    Python, no broadcast of the bigram table assumed.

    Returns (id, n_bigrams, sum_freq, n_rare, mean_bigram_freq, rare_rate).
    """
    occ = df.select(
        F.col(id_col).alias("__id"), F.explode(word_ngrams(text_col, 2)).alias("gram")
    )
    counts = occ.groupBy("gram").agg(F.count(F.lit(1)).alias("__n"))
    j = occ.join(counts, "gram")
    return (
        j.groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("__n").alias("sum_freq"),
            F.sum(F.when(F.col("__n") <= 1, 1).otherwise(0)).alias("n_rare"),
        )
        .select(
            F.col("__id").alias(id_col),
            "n_bigrams",
            "sum_freq",
            "n_rare",
            F.round(F.col("sum_freq").cast("double") / F.col("n_bigrams"), 6).alias("mean_bigram_freq"),
            F.round(F.col("n_rare").cast("double") / F.col("n_bigrams"), 6).alias("rare_rate"),
        )
    )


def unigram_lm_nll(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: int = 1,
) -> DataFrame:
    """Per-document cross-entropy under an add-``alpha`` unigram LM trained
    on the corpus itself — the CCNet-style perplexity quality signal
    (Wenzek et al., LREC'20 §3.3), with the LM fit and the scoring fused
    into one distributed plan instead of a separate KenLM artifact.

    ``avg_nll`` = −(1/|d|) Σ_t tf_d(t) · ln((tf(t)+α)/(T+αV)) in nats; low
    = fluent/common (head), high = rare/gibberish (tail). Complements
    :func:`bigram_fluency` (integer-only) with the standard log-space
    score; like ``bm25_topk``, cross-engine float safety comes from
    comparing AFTER ``round(·, 4)`` — a last-ulp ``ln`` disagreement
    cannot survive the rounding.

    Plan shape (the 100 TB argument):
    - per-(doc, token) counts FIRST — a map-side-combinable aggregate that
      collapses token repetition before anything shuffles;
    - corpus term frequencies are a second combinable aggregate over that
      (O(V) output, never the raw token stream);
    - the score join is dtf ⋈ tf keyed on the TOKEN (vocabulary-bounded
      skew on stopword keys — AQE skew-join territory, same argument as
      :func:`collocations`); the (T, V) totals ride a one-row broadcast
      crossJoin, never a driver action;
    - one final per-doc combine. No Python, no corpus-sized broadcast.
    """
    toks = df.select(
        F.col(id_col).alias("__id"), F.explode(tokenize(text_col)).alias("tok")
    )
    # persist: dtf feeds BOTH the tf re-aggregate and the score join, and
    # exchange reuse does not fire across that split (verified AQE-on in
    # this repo) — without the barrier the corpus explode runs twice
    dtf = toks.groupBy("__id", "tok").agg(F.count(F.lit(1)).alias("dtf")).persist()
    tf = dtf.groupBy("tok").agg(F.sum("dtf").alias("tf"))
    totals = tf.agg(
        F.sum("tf").alias("__T"), F.count(F.lit(1)).alias("__V")
    )
    logp = F.log(
        (F.col("tf") + F.lit(float(alpha)))
        / (F.col("__T") + F.lit(alpha) * F.col("__V")).cast("double")
    )
    scored = dtf.join(tf, "tok").crossJoin(F.broadcast(totals))
    return (
        scored.groupBy("__id")
        .agg(
            F.sum("dtf").alias("n_tokens"),
            F.round(
                -F.sum(F.col("dtf") * logp) / F.sum("dtf"), 4
            ).alias("avg_nll"),
        )
        .select(F.col("__id").alias(id_col), "n_tokens", "avg_nll")
    )


def bigram_lm_nll(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lam: float = 0.7,
) -> DataFrame:
    """Per-document cross-entropy under a Jelinek-Mercer interpolated BIGRAM
    LM fit on the corpus itself — the order-2 upgrade of
    :func:`unigram_lm_nll` (Chen & Goodman '99 eq. 4 with fixed lambda):

        p(w2 | w1) = lam * c(w1,w2)/c(w1.) + (1-lam) * c(w2)/T

    ``avg_nll`` = −(1/B_d) Σ over the document's bigrams of ln p, in nats.
    The unigram term is MLE (not smoothed): the model is scored on its own
    training corpus, so every scored token has c(w2) ≥ 1 and p > 0 by
    construction. Word-order sensitivity is the point — shuffled or
    boilerplate-repetitive text separates from fluent text here in a way no
    unigram score can see.

    Plan shape (the 100 TB argument):
    - bigrams are built ROW-LOCALLY from the token array (two slices +
      arrays_zip + one explode) — no positional self-join, no corpus-wide
      window over (doc, pos);
    - per-(doc, w1, w2) counts FIRST (map-side combinable, collapses
      repetition before the shuffle), persisted once because the bigram-tf
      and left-context aggregates AND the score join all read it and
      exchange reuse does not fire across that split (same measured
      rationale as unigram_lm_nll);
    - corpus bigram counts c12 and context counts c1 are vocabulary-bounded
      re-aggregates of that frame (never the raw bigram stream);
    - the score join is keyed on (w1, w2) / w1 / w2 — vocabulary-bounded
      skew on stopword keys, AQE skew-join territory; the one-row total T
      rides a broadcast crossJoin, never a driver action;
    - unigram counts take a second scan of the text column only (columnar
      prune; cheaper at scale than persisting a corpus-sized token stream).
    Float safety: compared after round(·, 4); both engines evaluate the
    literal-identical expression `lam*c12/c1 + (1-lam)*cu/T` left-to-right.
    Docs with < 2 tokens have no bigrams and are absent from the output on
    both engines by construction.
    """
    toks = df.select(F.col(id_col).alias("__id"), tokenize(text_col).alias("__t"))
    n1 = F.greatest(F.size("__t") - F.lit(1), F.lit(0))
    bg = toks.select(
        "__id",
        F.explode(
            F.arrays_zip(
                F.slice("__t", 1, n1).alias("w1"), F.slice("__t", 2, n1).alias("w2")
            )
        ).alias("__bg"),
    ).select("__id", "__bg.w1", "__bg.w2")
    dbf = (
        bg.groupBy("__id", "w1", "w2").agg(F.count(F.lit(1)).alias("dbf")).persist()
    )
    btf = dbf.groupBy("w1", "w2").agg(F.sum("dbf").alias("c12"))
    c1 = dbf.groupBy("w1").agg(F.sum("dbf").alias("c1"))
    uni = (
        df.select(F.explode(tokenize(text_col)).alias("w2"))
        .groupBy("w2")
        .agg(F.count(F.lit(1)).alias("cu"))
    )
    tot = uni.agg(F.sum("cu").alias("__T"))
    p = F.lit(lam) * F.col("c12") / F.col("c1") + F.lit(1.0 - lam) * F.col(
        "cu"
    ) / F.col("__T").cast("double")
    scored = (
        dbf.join(btf, ["w1", "w2"])
        .join(c1, "w1")
        .join(uni, "w2")
        .crossJoin(F.broadcast(tot))
    )
    return (
        scored.groupBy("__id")
        .agg(
            F.sum("dbf").alias("n_bigrams"),
            F.round(-F.sum(F.col("dbf") * F.log(p)) / F.sum("dbf"), 4).alias(
                "avg_nll"
            ),
        )
        .select(F.col("__id").alias(id_col), "n_bigrams", "avg_nll")
    )


def feature_hash_bow(
    docs: DataFrame,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Hashing-trick bag-of-words vectorizer (Weinberger et al. ICML'09):
    every token maps to ``bucket = mix(h31, h131) % n_buckets`` with a
    ±1 sign from the second hash's parity; the document's feature vector
    is the per-bucket SIGNED count. The signed variant keeps collision
    noise zero-mean — the property that lets a fixed tiny bucket space
    stand in for an unbounded vocabulary at 100 TB (no vocabulary build,
    no dictionary broadcast, no OOV path).

    Scale shape: one narrow explode + one map-side-combinable
    (doc, bucket) sum — nothing vocabulary-sized ever exists. All integer
    arithmetic on the portable char folds, so bucket, sign, and weight are
    engine-exact. Output: (id_col, bucket, weight) sparse rows (absent
    bucket = 0; colliding signs may cancel to an explicit 0 row).
    """
    toks = docs.select(F.col(id_col), F.explode(tokenize(text_col)).alias("token"))
    h31 = token_hash31(F.col("token"), 31)
    h131 = token_hash31(F.col("token"), 131)
    bucket = (h31.bitwiseXOR(h131 * F.lit(65537) % F.lit(P31)) % n_buckets).cast("int")
    sign = F.when(h131 % 2 == 0, F.lit(1)).otherwise(F.lit(-1)).cast("long")
    return (
        toks.select(F.col(id_col), bucket.alias("bucket"), sign.alias("sign"))
        .groupBy(id_col, "bucket")
        .agg(F.sum("sign").alias("weight"))
    )
