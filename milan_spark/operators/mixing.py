"""Data-mixture selection for LLM training corpora: DSIR importance
resampling and a linear quality classifier — the "which documents do we
train on" tier that sits after dedup/curation (SURVEY.md §7 phase 6;
no reference analog — Milan stops at generic keyed aggregation).

Both operators follow the catalog's determinism discipline: every
data-dependent quantity that feeds an ORDERING or a THRESHOLD is an exact
integer (hashed-bucket counts, micro-nat scaled weights, cleared-denominator
scores), so ranks and labels cannot flip on a last-ulp disagreement between
engines. Doubles appear only in reported columns, rounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from milan_spark.operators.text import tokenize

# same multiplicative scrambler the sketch family uses
_SCRAMBLE = 2_654_435_761
P31 = 2_147_483_647


def _bucket(col, n_buckets: int):
    """Portable hashed-unigram feature bucket in [0, n_buckets)."""
    chars = F.regexp_extract_all(col, F.lit("."), 0)
    fold = F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * 31 + F.ascii(ch)) % P31,
    )
    return (fold * _SCRAMBLE) % P31 % n_buckets


def dsir_scores(
    docs: DataFrame,
    target: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 256,
    weight_scale: int = 1_000_000,
) -> DataFrame:
    """DSIR importance scores (Xie et al. 2023): rank raw documents by how
    much more likely their hashed-unigram features are under the TARGET
    domain's distribution than under the RAW corpus distribution.

    Per bucket b (add-one smoothing):  w_b = ln((t_b+1)/(T+B)) −
    ln((r_b+1)/(R+B)), quantized to integer micro-nats with floor() —
    after which every per-document score is an exact int64 sum and the
    resampling rank is ulp-proof.

    Scale shape: the two distribution fits are map-side-combinable
    aggregates onto B buckets (the token domain never shuffles); the fitted
    weight table is B rows, broadcast into the scoring join; per-document
    scoring is one groupBy(doc). Nothing corpus-sized is shuffled twice.

    Output: (id_col, n_tokens, score_micronat) — one row per raw document.
    """
    raw_toks = docs.select(
        F.col(id_col), F.explode(tokenize(text_col)).alias("__tok")
    ).select(F.col(id_col), _bucket(F.col("__tok"), n_buckets).alias("b"))
    tgt_toks = target.select(
        F.explode(tokenize(text_col)).alias("__tok")
    ).select(_bucket(F.col("__tok"), n_buckets).alias("b"))
    raw_counts = raw_toks.groupBy("b").agg(F.count(F.lit(1)).alias("r"))
    tgt_counts = tgt_toks.groupBy("b").agg(F.count(F.lit(1)).alias("t"))
    # Spark resolves identifiers case-insensitively: totals must not reuse
    # the per-bucket column names r/t
    totals = raw_counts.agg(F.sum("r").alias("r_tot")).crossJoin(
        tgt_counts.agg(F.sum("t").alias("t_tot"))
    )
    weights = (
        raw_counts.join(tgt_counts, "b", "full")
        .crossJoin(F.broadcast(totals))
        .select(
            "b",
            F.floor(
                F.lit(float(weight_scale))
                * (
                    F.log(
                        (F.coalesce(F.col("t"), F.lit(0)) + F.lit(1)).cast("double")
                        / (F.col("t_tot") + F.lit(n_buckets)).cast("double")
                    )
                    - F.log(
                        (F.coalesce(F.col("r"), F.lit(0)) + F.lit(1)).cast("double")
                        / (F.col("r_tot") + F.lit(n_buckets)).cast("double")
                    )
                )
            )
            .cast("long")
            .alias("w"),
        )
    )
    return (
        raw_toks.join(F.broadcast(weights), "b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("w").alias("score_micronat"),
        )
    )


def dsir_select(
    scores: DataFrame,
    *,
    id_col: str = "doc_id",
    top_n: int = 100,
) -> DataFrame:
    """Deterministic DSIR resampling: keep the ``top_n`` documents by
    integer importance score (ties on id). TakeOrderedAndProject — no
    global sort shuffle."""
    topk = scores.orderBy(
        F.col("score_micronat").desc(), F.col(id_col)
    ).limit(top_n)
    w = W.orderBy(F.col("score_micronat").desc(), F.col(id_col))
    return topk.withColumn("rank", F.row_number().over(w)).orderBy("rank")


# ---------------------------------------------------------------------------
# Linear quality classifier with cleared-denominator exact decisions.
#
# z(d) = a·meanlen(d) + b·stopratio(d) + c·distinctratio(d) + e·n(d)/N0 + f
# with meanlen = L/n, stopratio = s/n, distinctratio = u/n. Multiplying by
# the (positive) denominator n·N0 gives
#   Z(d) = N0·(a·L + b·s + c·u) + e·n² + f·N0·n   — an exact int64 —
# and label = [z > θ] = [Z > θ·N0·n] exactly, no float in the decision.
# Weights are integer per-mille so θ·N0·n is integral too.
# ---------------------------------------------------------------------------

# integer per-mille weights: favor longer tokens, stopword presence, and
# vocabulary diversity; length prior capped through N0
QC_A = 180  # mean token length
QC_B = 950  # stopword ratio
QC_C = 620  # distinct-token ratio
QC_E = 14  # tokens / N0 length prior
QC_F = -1140  # bias (set to split the synthetic corpus near its median)
QC_N0 = 64
QC_THETA = 0  # decision threshold on the per-mille z scale


def quality_classifier(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Score every document with the linear model above.

    Output: (id_col, n_tokens, z_num, keep, z_millis) where z_num is the
    cleared-denominator integer decision value, keep the exact boolean
    label, and z_millis = round(Z/(N0·n), 4) the reported per-mille score.
    Empty documents (n = 0) are labeled keep = false with z_num = NULL.
    One stage, no shuffle at all — a pure row-local classifier, the shape a
    fasttext-style quality gate has at 100 TB.
    """
    toks = tokenize(text_col)
    # every factor is widened to int64 BEFORE any product: 14*n*n in 32-bit
    # wraps at n ≈ 12,404 tokens under non-ANSI Spark, silently flipping the
    # keep label away from the int64 oracle
    n = F.array_size(toks).cast("long")
    L = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    from milan_spark.operators.text import STOPWORDS

    s = F.size(
        F.filter(toks, lambda t: t.isin(*STOPWORDS))
    ).cast("long")
    u = F.array_size(F.array_distinct(toks)).cast("long")
    z_num = (
        F.lit(QC_N0)
        * (F.lit(QC_A) * L + F.lit(QC_B) * s + F.lit(QC_C) * u)
        + F.lit(QC_E) * n * n
        + F.lit(QC_F) * F.lit(QC_N0) * n
    ).cast("long")
    thresh = (F.lit(QC_THETA) * F.lit(QC_N0) * n).cast("long")
    return docs.select(
        F.col(id_col),
        n.alias("n_tokens"),
        F.when(n > 0, z_num).alias("z_num"),
        F.when(n > 0, z_num > thresh).otherwise(F.lit(False)).alias("keep"),
        F.when(
            n > 0,
            F.round(
                z_num.cast("double") / (F.lit(float(QC_N0)) * n.cast("double")), 4
            ),
        ).alias("z_millis"),
    )
