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


def jaccard_topk(
    docs: DataFrame,
    query_ids,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 20,
) -> DataFrame:
    """Per-query top-``top_n`` documents by distinct-token Jaccard similarity
    to each query document (self excluded) — the sparse leg of hybrid
    retrieval.

    Scale shape mirrors :func:`bm25_topk`: each document's distinct-token
    count is computed row-local BEFORE the explode and rides every token row,
    so no corpus-sized length relation or join exists; the query side is
    O(|Q|·tokens) and broadcast, so the corpus token stream meets it in one
    broadcast-hash join and only query-vocabulary matches ever reach the
    (query, doc) shuffle.

    Determinism: intersection/union sizes are exact ints (both sides explode
    DISTINCT token arrays, so join multiplicity is 1×1); the Jaccard ratio is
    one correctly-rounded double division, ranked with an ``id_col``
    tie-break — engine- and partition-exact.

    Output: (query_id, item_id, jaccard, rank) with rank ≤ top_n per query.
    """
    base = docs.select(
        F.col(id_col), F.array_distinct(tokenize(text_col)).alias("__ts")
    )
    q = base.filter(F.col(id_col).isin(list(query_ids))).select(
        F.col(id_col).alias("query_id"),
        F.array_size("__ts").alias("q_sz"),
        F.explode("__ts").alias("token"),
    )
    c = base.select(
        F.col(id_col).alias("item_id"),
        F.array_size("__ts").alias("c_sz"),
        F.explode("__ts").alias("token"),
    )
    inter = (
        c.join(F.broadcast(q), "token")
        .filter(F.col("item_id") != F.col("query_id"))
        .groupBy("query_id", "item_id")
        .agg(
            F.count(F.lit(1)).alias("inter"),
            F.min("q_sz").alias("q_sz"),
            F.min("c_sz").alias("c_sz"),
        )
    )
    jac = F.col("inter").cast("double") / (
        F.col("q_sz") + F.col("c_sz") - F.col("inter")
    ).cast("double")
    ranked = inter.withColumn("jaccard", F.round(jac, 6)).withColumn(
        "rank",
        F.row_number().over(
            W.partitionBy("query_id").orderBy(jac.desc(), F.col("item_id"))
        ),
    )
    return ranked.filter(F.col("rank") <= top_n).select(
        "query_id", "item_id", "jaccard", "rank"
    )


def rrf_fuse(
    ranked: dict[str, DataFrame],
    *,
    k: int = 60,
    top_n: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack/Clarke/Büttcher SIGIR'09) of named
    ranked lists: ``score(q, d) = Σ_lists 1/(k + rank_list(q, d))``, missing
    membership contributing 0.

    Each input frame must carry (query_id, item_id, rank). The fusion is a
    chain of full-outer joins on the (query, item) key — every list is
    already truncated to its own top-k, so the joined relation is
    O(queries · Σ top-k) however large the corpus: fusion cost is a function
    of the rank budget, not the data. Each 1/(k+rank) term is a correctly-
    rounded double of exact ints and the sum folds len(ranked) such terms in
    a fixed written order, so scores and the (score desc, item_id) ranking
    are engine-exact.

    Output: (query_id, item_id, <name>_rank per list, rrf_score, fused_rank)
    with fused_rank ≤ top_n per query.
    """
    names = list(ranked)
    fused: DataFrame | None = None
    for name in names:
        part = ranked[name].select(
            "query_id", "item_id", F.col("rank").alias(f"{name}_rank")
        )
        fused = part if fused is None else fused.join(
            part, ["query_id", "item_id"], "full_outer"
        )
    assert fused is not None, "rrf_fuse needs at least one ranked list"
    score = None
    for name in names:
        term = F.coalesce(
            F.lit(1.0) / (F.lit(k).cast("double") + F.col(f"{name}_rank")),
            F.lit(0.0),
        )
        score = term if score is None else score + term
    scored = fused.withColumn("__rrf", score)
    w = W.partitionBy("query_id").orderBy(F.col("__rrf").desc(), F.col("item_id"))
    return (
        scored.withColumn("fused_rank", F.row_number().over(w))
        .filter(F.col("fused_rank") <= top_n)
        .select(
            "query_id",
            "item_id",
            *[f"{name}_rank" for name in names],
            F.round("__rrf", 6).alias("rrf_score"),
            "fused_rank",
        )
    )
