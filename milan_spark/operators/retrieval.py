"""Full-text retrieval scoring over the documents corpus — the search tier
of the training-data pipeline (alongside dedup/similarity, SURVEY.md §7
phase 6; the reference has no text-retrieval operator at all — its closest
construct is the generic keyed aggregation, lang/StreamExpressions.scala).

BM25 (Robertson/Spärck Jones, TREC-3) over the corpus:

    score(d, Q) = Σ_{t∈Q} idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1−b+b·|d|/avgdl))
    idf(t)      = ln( (N − df(t) + 0.5) / (df(t) + 0.5) + 1 )

Scale shape: the ONLY per-token work is a filter to the query vocabulary —
applied BEFORE any shuffle, so the exploded token stream collapses to
O(docs·|Q|) rows at the scan. Document length is computed row-local before
the explode and rides each matched token row through the filter — there is
no N-row dl relation and therefore no corpus-sized join. Corpus stats
(N, avgdl) are one map-side-combinable aggregate broadcast into the scored
rows; df(t) is a |Q|-row broadcast. Nothing the size of the corpus is ever
shuffled — the one `groupBy(doc)` runs over query-matched rows only.

Determinism contract: tf, df, N, dl are exact integers; avgdl and each
per-term score are doubles computed by the identical expression tree in
Spark and the SQL oracle; the per-document sum folds ≤|Q| such doubles.
Results are compared after round(·, 4) and ranked on the ROUNDED score
(ties broken by doc_id), so a last-ulp disagreement in `ln` cannot flip
the ordering across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from milan_spark.operators.text import tokenize


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    top_n: int = 20,
) -> DataFrame:
    """Top-``top_n`` documents by BM25 score for a bag-of-words query.

    Output: (id_col, n_terms_hit, bm25, rank) ordered by the ROUNDED score
    desc then id — deterministic across engines and partitionings.
    """
    # dl is computed row-local BEFORE the explode and rides each token row
    # through the query filter — the per-document length table never exists
    # as a separate N-row relation, so there is no corpus-sized join anywhere
    toks = docs.select(
        F.col(id_col),
        F.array_size(tokenize(text_col)).alias("dl"),
        F.explode(tokenize(text_col)).alias("token"),
    )
    # corpus scalars: one combinable aggregate, broadcast into every row
    stats = docs.select(
        F.array_size(tokenize(text_col)).alias("__dl")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__dl").alias("sum_dl"),
    )

    q = F.array(*[F.lit(t) for t in query_terms])
    # the query-vocabulary filter runs at the scan — the corpus-sized token
    # stream never reaches a shuffle
    tf = (
        toks.filter(F.array_contains(q, F.col("token")))
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("tf"), F.min("dl").alias("dl"))
    )
    df_t = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))

    scored = tf.join(F.broadcast(df_t), "token").join(
        F.broadcast(stats), how="cross"
    )
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    idf = F.log(
        (F.col("n_docs").cast("double") - F.col("df") + F.lit(0.5))
        / (F.col("df").cast("double") + F.lit(0.5))
        + F.lit(1.0)
    )
    tfd = F.col("tf").cast("double")
    denom = tfd + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl").cast("double") / avgdl
    )
    term_score = idf * tfd * F.lit(k1 + 1.0) / denom

    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_terms_hit"),
        F.round(F.sum(term_score), 4).alias("bm25"),
    )
    # TakeOrderedAndProject: per-partition top-k merged at the driver — no
    # global sort shuffle over the matched-document set. The rank window then
    # runs over top_n rows only.
    topk = per_doc.orderBy(F.col("bm25").desc(), F.col(id_col)).limit(top_n)
    w = W.orderBy(F.col("bm25").desc(), F.col(id_col))
    return topk.withColumn("rank", F.row_number().over(w)).orderBy("rank")
