"""BPE vocabulary induction (Sennrich et al., ACL'16) as a distributed
Spark job — tokenizer training, the step before token counting in an LLM
data pipeline (SURVEY.md §7 phase 6; no reference analog).

Algorithm: fold the corpus once into a (word, freq) vocabulary table, then
for each of M rounds count adjacent symbol pairs (weighted by word freq),
merge the most frequent pair corpus-wide, repeat. The corpus is touched
exactly once; every round runs on the DISTINCT-WORD table — Sennrich's own
word-freq-dict formulation, which is what makes BPE tractable at 100 TB
(vocabulary grows like corpus^~0.7, and the round cost is independent of
corpus row count).

Representation: a word's symbol sequence is a single string with every
symbol PREFIXED by a marker char: "abc" → "~a~b~c"; after merging (a,b)
→ "~ab~c". Merging pair (x,y) is then the plain string replace of
"~x~y" with "~xy" — the marker anchors matches to symbol starts (no
false hit inside a longer symbol: "~xa~b" does not contain "~a~b"), and
left-to-right non-overlapping replace IS the greedy BPE merge order, with
identical semantics in Spark and ANSI SQL. Tokens are [a-z0-9]+ so the
marker cannot collide.

Determinism: pair counts are exact int64; the per-round argmax breaks
ties lexicographically on (left, right) — the whole merge trajectory is
engine- and partition-independent. The driver holds the O(M) merge list
(the model being trained), nothing data-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from milan_spark.operators.text import tokenize

MARK = "~"


def word_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One corpus pass → (word, freq) vocabulary, words in marked-symbol
    form (one char per symbol initially)."""
    words = docs.select(F.explode(tokenize(text_col)).alias("w"))
    vocab = words.groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
    marked = F.regexp_replace(F.col("w"), "(.)", MARK + "$1")
    return vocab.select(marked.alias("sym"), "freq")


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Adjacent-symbol pair counts weighted by word frequency."""
    arr = F.filter(F.split(F.col("sym"), MARK), lambda s: s != "")
    pairs = F.transform(
        F.sequence(F.lit(0), F.array_size(arr) - 2),
        lambda i: F.struct(
            F.element_at(arr, i + 1).alias("l"),
            F.element_at(arr, i + 2).alias("r"),
        ),
    )
    return (
        vocab.filter(F.array_size(arr) >= 2)
        .select(F.explode(pairs).alias("p"), "freq")
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("freq").alias("cnt"))
    )


def bpe_train(
    docs: DataFrame,
    *,
    text_col: str = "text",
    merges: int = 6,
    checkpoint_every: int = 16,
) -> DataFrame:
    """Learn ``merges`` BPE merges over the corpus.

    Output: (merge_rank, left_sym, right_sym, merged, pair_count) — the
    trained merge table in order. Each round is one combinable pair-count
    aggregate over the vocabulary + a 1-row argmax; the merge rewrite is a
    row-local string replace on the vocabulary (no shuffle).

    Plan depth is bounded: the rewrite chain stays lazy between
    checkpoints (round r re-evaluates at most ``checkpoint_every``
    replaces — measured cheaper than materializing every round), and every
    ``checkpoint_every`` merges the vocabulary is ``localCheckpoint``-ed so
    the analyzer never sees more than K stacked projections. Without this,
    a production merge count (32k) builds a quadratic-depth plan.
    """
    spark = docs.sparkSession
    vocab = word_vocab(docs, text_col).persist()
    learned: list[tuple] = []
    for r in range(1, merges + 1):
        best = (
            _pair_counts(vocab)
            .orderBy(F.col("cnt").desc(), F.col("l"), F.col("r"))
            .limit(1)
            .first()
        )
        if best is None:
            break
        l, rr, cnt = best["l"], best["r"], best["cnt"]
        learned.append((r, l, rr, l + rr, cnt))
        vocab = vocab.select(
            F.replace(
                F.col("sym"), F.lit(MARK + l + MARK + rr), F.lit(MARK + l + rr)
            ).alias("sym"),
            "freq",
        )
        if checkpoint_every and r % checkpoint_every == 0:
            # truncate lineage: materialized by the NEXT round's argmax job
            vocab = vocab.localCheckpoint(eager=False)
    out = spark.createDataFrame(
        learned,
        "merge_rank int, left_sym string, right_sym string, "
        "merged string, pair_count long",
    )
    return out.select(
        F.col("merge_rank").cast("int"),
        "left_sym",
        "right_sym",
        "merged",
        F.col("pair_count").cast("long"),
    ).orderBy("merge_rank")


def bpe_encode_counts(
    docs: DataFrame,
    merge_rules: list[tuple[str, str]],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply a learned merge list to the corpus — the tokenizer-APPLICATION
    half of the BPE pipeline (Sennrich ACL'16 applies merges in rank order;
    replaying the training rewrite chain on the marker representation
    reproduces the training-time segmentation exactly).

    Output: (id, n_words, n_bpe_tokens) per document — the numbers a token
    budget is planned with.

    Plan shape (the 100 TB argument): the corpus is folded ONCE into a
    (doc, word, count) table (map-side combinable); the DISTINCT-WORD
    vocabulary is derived from that and encoded through the O(M) replace
    chain row-locally (model-sized work, no shuffle); the per-word symbol
    count then joins back keyed on the WORD and one combinable per-doc
    aggregate finishes. ``merge_rules`` is the driver-held model (O(M)),
    never data-sized.
    """
    dwc = (
        docs.select(
            F.col(id_col).alias("__id"), F.explode(tokenize(text_col)).alias("w")
        )
        .groupBy("__id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
        # feeds both the vocabulary branch and the count join; exchange
        # reuse does not fire across that split in this engine version
        .persist()
    )
    sym = F.regexp_replace(F.col("w"), "(.)", MARK + "$1")
    for l, r in merge_rules:
        sym = F.replace(sym, F.lit(MARK + l + MARK + r), F.lit(MARK + l + r))
    n_sym = F.array_size(F.filter(F.split(sym, MARK), lambda s: s != ""))
    enc = dwc.select("w").distinct().select("w", n_sym.alias("n_sym"))
    return (
        dwc.join(enc, "w")
        .groupBy("__id")
        .agg(
            F.sum("c").alias("n_words"),
            F.sum(F.col("c") * F.col("n_sym")).alias("n_bpe_tokens"),
        )
        .select(F.col("__id").alias(id_col), "n_words", "n_bpe_tokens")
    )
