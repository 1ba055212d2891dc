"""LLM-data-pipeline queries: dedup, similarity search, text analysis,
multimodal plumbing (SURVEY.md §7 phase 6) — each with an exact DuckDB oracle.

Oracle-compatibility is by construction: every number is either an integer
count, an integer-polynomial hash (no int64 overflow anywhere), or a double
derived from exact integers by the same expression tree on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from milan_spark.catalog import REGISTRY, register
from milan_spark.operators import dedup as D
from milan_spark.operators import multimodal as M
from milan_spark.operators import similarity as S
from milan_spark.operators import text as T
from milan_spark.sources import table

# shared oracle fragments -----------------------------------------------------

_SQL_TOKENS = "regexp_extract_all(lower(text), '[a-z0-9]+')"
_SQL_H31 = (
    "list_reduce(list_transform(regexp_extract_all({s}, '.'), c -> CAST(ascii(c) AS BIGINT)),"
    " (a, c) -> (a * 31 + c) % 2147483647)"
)
_SQL_H131 = (
    "list_reduce(list_transform(regexp_extract_all({s}, '.'), c -> CAST(ascii(c) AS BIGINT)),"
    " (a, c) -> (a * 131 + c) % 2147483647)"
)

_SQL_SHINGLES = f"""
WITH toks AS (
  SELECT doc_id, {_SQL_TOKENS} AS tokens FROM documents
), sh AS (
  SELECT doc_id,
         list_distinct([array_to_string(tokens[i:i+1], ' ') FOR i IN range(1, len(tokens))]) AS shingles
  FROM toks WHERE len(tokens) >= 2
)
"""

_SQL_EXACT_JACCARD_PAIRS = (
    _SQL_SHINGLES
    + """
, ex AS (
  SELECT doc_id, unnest(shingles) AS s FROM sh
), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), sizes AS (SELECT doc_id, len(shingles) AS n FROM sh)
SELECT id_a, id_b,
       round(shared * 1.0 / (sa.n + sb.n - shared), 6) AS jaccard
FROM pairs JOIN sizes sa ON id_a = sa.doc_id JOIN sizes sb ON id_b = sb.doc_id
WHERE shared * 1.0 / (sa.n + sb.n - shared) >= 0.8
"""
)

# --- text analysis -----------------------------------------------------------


@register(
    "text_quality_features",
    doc="Quality scoring for corpus filtering: token counts (regex + "
    "whitespace), mean token length, punctuation/stopword ratios, combined "
    "[0,1] score — all JVM-side regexp/array exprs, integer-exact.",
    oracle=f"""
WITH t AS (
  SELECT doc_id, text, {_SQL_TOKENS} AS tokens,
         len(string_split_regex(trim(text), '\\s+')) AS ws_tokens
  FROM documents
)
SELECT doc_id,
       len(tokens) AS n_tokens,
       ws_tokens,
       CAST(list_sum(list_transform(tokens, x -> length(x))) AS DOUBLE)
         / greatest(len(tokens), 1) AS mean_token_len,
       CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE)
         / greatest(length(text), 1) AS punct_ratio,
       CAST(len(list_filter(tokens, x -> x IN ({', '.join("'" + w + "'" for w in T.STOPWORDS)}))) AS DOUBLE)
         / greatest(len(tokens), 1) AS stopword_ratio,
       CAST(len(list_filter(tokens, x -> x IN ({', '.join("'" + w + "'" for w in T.STOPWORDS)}))) AS DOUBLE)
         / greatest(len(tokens), 1) * 0.4
         + (1.0 - CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) / greatest(length(text), 1)) * 0.2
         + CAST(least(len(tokens), 64) AS DOUBLE) / 64.0 * 0.4 AS quality_score
FROM t
""",
)
def text_quality_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    out = T.quality_features(docs, "text")
    ws = F.array_size(F.split(F.trim(F.col("text")), r"\s+"))
    return out.withColumn("ws_tokens", ws).select(
        "doc_id", "n_tokens", "ws_tokens", "mean_token_len", "punct_ratio", "stopword_ratio", "quality_score"
    )


@register(
    "text_lang_id",
    doc="Language-ID heuristic: marker-token counts per language, "
    "deterministic argmax (tie order en>es>fr>de, all-zero -> 'und').",
    oracle=f"""
WITH t AS (
  SELECT doc_id, {_SQL_TOKENS} AS tokens FROM documents
), s AS (
  SELECT doc_id,
    len(list_filter(tokens, x -> x IN ({', '.join("'" + w + "'" for w in T.LANG_MARKERS['en'])}))) AS s_en,
    len(list_filter(tokens, x -> x IN ({', '.join("'" + w + "'" for w in T.LANG_MARKERS['es'])}))) AS s_es,
    len(list_filter(tokens, x -> x IN ({', '.join("'" + w + "'" for w in T.LANG_MARKERS['fr'])}))) AS s_fr,
    len(list_filter(tokens, x -> x IN ({', '.join("'" + w + "'" for w in T.LANG_MARKERS['de'])}))) AS s_de
  FROM t
)
SELECT doc_id, s_en, s_es, s_fr, s_de,
       CASE WHEN greatest(s_en, s_es, s_fr, s_de) = 0 THEN 'und'
            WHEN s_en = greatest(s_en, s_es, s_fr, s_de) THEN 'en'
            WHEN s_es = greatest(s_en, s_es, s_fr, s_de) THEN 'es'
            WHEN s_fr = greatest(s_en, s_es, s_fr, s_de) THEN 'fr'
            ELSE 'de' END AS lang_pred
FROM s
""",
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    toks = T.tokenize("text")
    scores = T.lang_scores(toks)
    return docs.select(
        "doc_id",
        scores["en"].alias("s_en"),
        scores["es"].alias("s_es"),
        scores["fr"].alias("s_fr"),
        scores["de"].alias("s_de"),
        T.lang_id(toks).alias("lang_pred"),
    )


@register(
    "doc_fingerprint",
    doc="Document fingerprinting: base-31 polynomial hash of the full text "
    "(mod prime<2^53) + winnowing-style minimum rolling 8-char hash "
    "(mod 2^31-1).",
    oracle=f"""
SELECT doc_id,
       {_SQL_H31.format(s='text').replace('% 2147483647', '% 9007199254740881')} AS full_hash,
       list_min([
         list_reduce(list_transform(regexp_extract_all(substring(text, i, 8), '.'),
                                    c -> CAST(ascii(c) AS BIGINT)),
                     (a, c) -> (a * 31 + c) % 2147483647)
         FOR i IN range(1, greatest(length(text) - 7, 1) + 1)
       ]) AS min_rolling_hash
FROM documents
""",
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        T.char_fold_hash("text").alias("full_hash"),
        T.rolling_min_hash("text", 8).alias("min_rolling_hash"),
    )


# --- dedup -------------------------------------------------------------------


@register(
    "exact_dedup",
    doc="Exact dedup: hash group-by on content, earliest doc_id survives.",
    oracle="""
SELECT text, MIN(doc_id) AS survivor_id, COUNT(*) AS n_copies
FROM documents GROUP BY text
""",
)
def exact_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return D.exact_dedup(docs, "text", "doc_id")


@register(
    "ngram_jaccard_dedup",
    doc="Exact near-dup pairs: Jaccard over distinct word bigrams >= 0.8, "
    "corpus-adaptive between the prefix-filtered inverted index (natural "
    "corpora) and the broadcast dense matmul (templated corpora).",
    oracle=_SQL_EXACT_JACCARD_PAIRS,
)
def ngram_jaccard_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return D.ngram_jaccard_pairs(docs, "doc_id", "text", n=2, threshold=0.8)


@register(
    "minhash_lsh_dedup",
    doc="MinHash+LSH near-dup pairs (128 hashes, derive_banding -> 32 bands "
    "x 4 rows), candidates exact-verified: output equals the exact Jaccard "
    "pairs (P[band miss] ~ 4.6e-8 per true pair at tau=0.8), so the exact "
    "oracle applies. r=4 (not r=2) matters on template-heavy corpora: a "
    "j=0.3 pair collides in some band with ~95% probability at r=2 but ~23% "
    "at r=4 — 3x fewer flood candidates through the distinct+verify joins "
    "(measured 4.8s -> 1.7s at sf0.1).",
    oracle=_SQL_EXACT_JACCARD_PAIRS,
)
def minhash_lsh_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return D.minhash_lsh_pairs(docs, "doc_id", "text", n=2, num_hashes=128, threshold=0.8)


@register(
    "bigram_fluency_gate",
    doc="Per-document fluency from corpus bigram statistics "
    "(operators.text.bigram_fluency) — the transcendental-free analog of a "
    "CCNet-style LM filter: mean corpus-frequency of the doc's bigrams "
    "(leave-one-in) and the rate of bigrams occurring nowhere else. One "
    "combinable bigram-count aggregate + a join keyed on the bigram "
    "(vocabulary-bounded skew) + one per-doc combine; scores are single "
    "correctly-rounded divisions of exact integers.",
    oracle="""
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents
),
occ AS (
  SELECT doc_id, array_to_string(toks[p.i:p.i+1], ' ') AS gram
  FROM (SELECT doc_id, toks, unnest(range(1, len(toks), 1)) AS i FROM t) p
),
c AS (SELECT gram, COUNT(*) AS n FROM occ GROUP BY gram)
SELECT o.doc_id,
       COUNT(*) AS n_bigrams,
       CAST(SUM(c.n) AS BIGINT) AS sum_freq,
       CAST(SUM(CASE WHEN c.n <= 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
       round(CAST(SUM(c.n) AS DOUBLE) / COUNT(*), 6) AS mean_bigram_freq,
       round(CAST(SUM(CASE WHEN c.n <= 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS rare_rate
FROM occ o JOIN c ON o.gram = c.gram
GROUP BY o.doc_id
""",
)
def bigram_fluency_gate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return T.bigram_fluency(docs, "doc_id", "text")


@register(
    "incremental_dedup_delta",
    doc="Incremental near-dup dedup (operators.dedup.incremental_near_dups) "
    "— the production daily-delta shape: docs with doc_id % 5 == 0 play "
    "the incoming DELTA, the rest the existing CORPUS. The corpus is "
    "signed once into an LSH band index (persistable to parquet in a real "
    "pipeline) and only delta bands probe it, plus delta-vs-smaller-delta "
    "pairs for within-batch dups; the corpus is never self-joined. Output "
    "equals the exact J >= 0.8 pairs (same banding completeness + exact "
    "verification as minhash_lsh_dedup).",
    oracle=_SQL_SHINGLES
    + """
, ex AS (
  SELECT doc_id, unnest(shingles) AS s FROM sh
), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
  FROM ex a JOIN ex b ON a.s = b.s AND b.doc_id % 5 = 0
   AND (a.doc_id % 5 != 0 OR a.doc_id < b.doc_id) AND a.doc_id != b.doc_id
  GROUP BY 1, 2
), sizes AS (SELECT doc_id, len(shingles) AS n FROM sh)
SELECT id_b AS delta_id, id_a AS dup_of,
       round(shared * 1.0 / (sa.n + sb.n - shared), 6) AS jaccard
FROM pairs JOIN sizes sa ON id_a = sa.doc_id JOIN sizes sb ON id_b = sb.doc_id
WHERE shared * 1.0 / (sa.n + sb.n - shared) >= 0.8
""",
)
def incremental_dedup_delta_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 5 != 0)
    delta = docs.where(F.col("doc_id") % 5 == 0)
    return D.incremental_near_dups(corpus, delta, "doc_id", "text", n=2, threshold=0.8)


@register(
    "simhash_dedup",
    doc="SimHash near-dup pairs: 62-bit majority fingerprint over token "
    "hashes, 4x16-bit chunk candidates, exact Hamming <= 3 verification.",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest({_SQL_TOKENS}) AS t FROM documents
), h AS (
  SELECT doc_id,
         {_SQL_H31.format(s='t')} + {_SQL_H131.format(s='t')} * 2147483648 AS hv
  FROM toks
), bits AS (
  SELECT doc_id, r.b AS b,
         SUM(CASE WHEN (hv >> CAST(r.b AS INTEGER)) & 1 = 1 THEN 1 ELSE -1 END) AS v
  FROM h, range(62) r(b)
  GROUP BY 1, 2
), sh AS (
  SELECT doc_id,
         SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << CAST(b AS INTEGER)) ELSE 0 END) AS simhash
  FROM bits GROUP BY 1
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
""",
)
def simhash_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return D.simhash_pairs(docs, "doc_id", "text", max_hamming=3)


# --- similarity search -------------------------------------------------------

_SQL_QUANT = "[CAST(floor(CAST(x AS DOUBLE) * 1048576 + 0.5) AS BIGINT) FOR x IN embedding]"

_SQL_VEC_EX = f"""
WITH q AS (
  SELECT vec_id, {_SQL_QUANT} AS v FROM embeddings
), ex AS (
  SELECT vec_id, unnest(v) AS x, generate_subscripts(v, 1) AS i FROM q
), norms AS (
  SELECT vec_id, SUM(x * x) AS nn FROM ex GROUP BY 1
)
"""


@register(
    "embedding_near_dup",
    doc="Embedding-cosine near-dup pairs (cosine >= 0.45) on 2^20-quantized "
    "integer vectors: exact integer dot/norms -> deterministic doubles.",
    oracle=_SQL_VEC_EX
    + """
, dots AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b, SUM(a.x * b.x) AS dot
  FROM ex a JOIN ex b ON a.i = b.i AND a.vec_id < b.vec_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       round(dot / (sqrt(CAST(na.nn AS DOUBLE)) * sqrt(CAST(nb.nn AS DOUBLE))), 6) AS cosine
FROM dots JOIN norms na ON id_a = na.vec_id JOIN norms nb ON id_b = nb.vec_id
WHERE dot / (sqrt(CAST(na.nn AS DOUBLE)) * sqrt(CAST(nb.nn AS DOUBLE))) >= 0.45
""",
)
def embedding_near_dup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    return S.embedding_near_dup_pairs(emb, "vec_id", "embedding", threshold=0.45)


@register(
    "ann_brute_force",
    doc="Exact top-5 cosine neighbors for query vectors vec_id<10: broadcast "
    "queries x corpus, integer dot products, per-query window rank (no "
    "global sort).",
    oracle=_SQL_VEC_EX
    + """
, pairs AS (
  SELECT qa.vec_id AS query_id, ca.vec_id AS neighbor_id, SUM(qa.x * ca.x) AS dot
  FROM ex qa JOIN ex ca ON qa.i = ca.i AND qa.vec_id < 10 AND ca.vec_id != qa.vec_id
  GROUP BY 1, 2
), scored AS (
  SELECT query_id, neighbor_id,
         dot / (sqrt(CAST(nq.nn AS DOUBLE)) * sqrt(CAST(nc.nn AS DOUBLE))) AS cosine
  FROM pairs JOIN norms nq ON query_id = nq.vec_id JOIN norms nc ON neighbor_id = nc.vec_id
)
SELECT query_id, neighbor_id, rank, round(cosine, 6) AS cosine
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
)
WHERE rank <= 5
""",
)
def ann_brute_force_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    return S.ann_brute_force(emb, "vec_id", "embedding", query_ids=range(10), k=5)


@register(
    "ann_lsh",
    doc="LSH-bucketed approximate top-5 (8 deterministic hyperplanes -> 256 "
    "buckets; queries score only their own bucket). Fully deterministic, so "
    "the oracle replicates the bucketing exactly.",
    oracle=_SQL_VEC_EX
    + """
, planes AS (
  SELECT p.p AS p, d.d AS d,
         CAST(((p.p + 1) * 73856093 + (d.d + 1) * 19349663) % 2000003 - 1000001 AS BIGINT) AS w
  FROM range(8) p(p), range(64) d(d)
), bucket_bits AS (
  SELECT e.vec_id, pl.p,
         CASE WHEN SUM(e.x * pl.w) >= 0 THEN CAST(1 AS BIGINT) ELSE 0 END AS bit
  FROM ex e JOIN planes pl ON e.i = pl.d + 1
  GROUP BY 1, 2
), buckets AS (
  SELECT vec_id, SUM(bit << CAST(p AS INTEGER)) AS bucket FROM bucket_bits GROUP BY 1
), pairs AS (
  SELECT qa.vec_id AS query_id, ca.vec_id AS neighbor_id, SUM(qa.x * ca.x) AS dot
  FROM ex qa
  JOIN buckets bq ON qa.vec_id = bq.vec_id
  JOIN buckets bc ON bq.bucket = bc.bucket
  JOIN ex ca ON ca.vec_id = bc.vec_id AND qa.i = ca.i
  WHERE qa.vec_id < 10 AND ca.vec_id != qa.vec_id
  GROUP BY 1, 2
), scored AS (
  SELECT query_id, neighbor_id,
         dot / (sqrt(CAST(nq.nn AS DOUBLE)) * sqrt(CAST(nc.nn AS DOUBLE))) AS cosine
  FROM pairs JOIN norms nq ON query_id = nq.vec_id JOIN norms nc ON neighbor_id = nc.vec_id
)
SELECT query_id, neighbor_id, rank, round(cosine, 6) AS cosine
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
)
WHERE rank <= 5
""",
)
def ann_lsh_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    return S.ann_lsh(emb, "vec_id", "embedding", query_ids=range(10), k=5, planes=8)


# --- multimodal --------------------------------------------------------------


@register(
    "multimodal_metadata",
    doc="Multimodal payload+meta layout: binary payload from content, typed "
    "metadata struct, content hash — metadata-only query never touches "
    "payload pages (column pruning).",
    oracle="""
SELECT doc_id,
       length(text) AS byte_len,
       'text' AS modality,
       'text/plain' AS mime,
       md5(text) AS content_hash,
       ascii(text) AS first_byte
FROM documents
""",
)
def multimodal_metadata_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    packed = M.attach_binary_payload(docs, "text")
    return packed.select(
        "doc_id",
        F.col("meta.byte_len").alias("byte_len"),
        F.col("meta.modality").alias("modality"),
        F.col("meta.mime").alias("mime"),
        F.md5("payload").alias("content_hash"),
        F.ascii("text").alias("first_byte"),
    )


@register(
    "multimodal_features",
    doc="mapInPandas feature extraction over binary payloads (Arrow batch "
    "path; codec stubbed with deterministic byte stats — ASCII corpus makes "
    "byte stats == char stats, so the SQL oracle applies).",
    oracle="""
SELECT doc_id,
       length(text) AS byte_len,
       CAST(list_sum(list_transform(regexp_extract_all(text, '.'), c -> CAST(ascii(c) AS BIGINT))) % 997 AS BIGINT) AS checksum
FROM documents
""",
)
def multimodal_features_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    packed = M.attach_binary_payload(docs, "text")
    return M.extract_features(packed, "doc_id").select("doc_id", "byte_len", "checksum")


def _kmeans_ctes(n_cells: int, iters: int) -> list[str]:
    """The unrolled deterministic-Lloyd CTE chain shared by every oracle that
    mirrors operators.similarity.kmeans_cells: integer squared-L2 assignment
    with (d, cell) tie-break, floor(sum/count) centroid updates, seeds
    vec_id < n_cells; ends at ``assign{iters}``/``dist{iters}``."""
    parts = [
        _SQL_VEC_EX.rstrip(),
        f""", cent0 AS (
  SELECT vec_id AS c, i, x AS w FROM ex WHERE vec_id < {n_cells}
)""",
    ]
    for t in range(iters + 1):
        parts.append(f""", dist{t} AS (
  SELECT e.vec_id, ct.c, SUM((e.x - ct.w) * (e.x - ct.w)) AS d
  FROM ex e JOIN cent{t} ct ON e.i = ct.i GROUP BY 1, 2
), assign{t} AS (
  SELECT vec_id, c FROM (
    SELECT vec_id, c, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn FROM dist{t}
  ) WHERE rn = 1
)""")
        if t < iters:
            parts.append(f""", cent{t + 1} AS (
  SELECT a.c, e.i, CAST(floor(CAST(SUM(e.x) AS DOUBLE) / COUNT(*)) AS BIGINT) AS w
  FROM assign{t} a JOIN ex e ON a.vec_id = e.vec_id GROUP BY 1, 2
)""")
    return parts


def _ivf_oracle(n_cells: int = 8, n_probe: int = 2, iters: int = 2, k: int = 5, n_queries: int = 10) -> str:
    """Unrolled deterministic k-means + IVF probe as one DuckDB query.

    Mirrors operators.similarity.ann_ivf exactly (see :func:`_kmeans_ctes`);
    the iteration is unrolled because the loop count is a compile-time
    constant of the operator."""
    parts = _kmeans_ctes(n_cells, iters)
    parts.append(f""", probe AS (
  SELECT vec_id AS query_id, c FROM (
    SELECT vec_id, c, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn
    FROM dist{iters} WHERE vec_id < {n_queries}
  ) WHERE rn <= {n_probe}
), cand AS (
  SELECT p.query_id, a.vec_id AS neighbor_id
  FROM probe p JOIN assign{iters} a ON p.c = a.c
  WHERE a.vec_id != p.query_id
), pairs AS (
  SELECT c.query_id, c.neighbor_id, SUM(qe.x * ne.x) AS dot
  FROM cand c
  JOIN ex qe ON qe.vec_id = c.query_id
  JOIN ex ne ON ne.vec_id = c.neighbor_id AND ne.i = qe.i
  GROUP BY 1, 2
), scored AS (
  SELECT query_id, neighbor_id,
         dot / (sqrt(CAST(nq.nn AS DOUBLE)) * sqrt(CAST(nc.nn AS DOUBLE))) AS cosine
  FROM pairs JOIN norms nq ON query_id = nq.vec_id JOIN norms nc ON neighbor_id = nc.vec_id
)
SELECT query_id, neighbor_id, rank, round(cosine, 6) AS cosine
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
)
WHERE rank <= {k}""")
    return "".join(parts)


def _pq_oracle(m: int = 4, n_cells: int = 8, iters: int = 1, k: int = 5, n_queries: int = 10, dim: int = 64) -> str:
    """operators.similarity.ann_pq, restated: per-subspace unrolled
    deterministic Lloyd (the component-sliced twin of :func:`_kmeans_ctes`),
    codes = final assignment, per-query LUT of exact subspace distances,
    estimate = LUT sum over a vector's codes."""
    d_sub = dim // m
    parts = [_SQL_VEC_EX.rstrip()]
    for sub in range(m):
        # ex's generate_subscripts index is 1-based: subspace `sub` spans
        # components lo+1 .. hi inclusive
        lo, hi = sub * d_sub, (sub + 1) * d_sub
        parts.append(f""", cent0_{sub} AS (
  SELECT vec_id AS c, i, x AS w FROM ex WHERE vec_id < {n_cells} AND i > {lo} AND i <= {hi}
)""")
        for t in range(iters + 1):
            parts.append(f""", dist{t}_{sub} AS (
  SELECT e.vec_id, ct.c, SUM((e.x - ct.w) * (e.x - ct.w)) AS d
  FROM ex e JOIN cent{t}_{sub} ct ON e.i = ct.i GROUP BY 1, 2
), assign{t}_{sub} AS (
  SELECT vec_id, c FROM (
    SELECT vec_id, c, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn FROM dist{t}_{sub}
  ) WHERE rn = 1
)""")
            if t < iters:
                parts.append(f""", cent{t + 1}_{sub} AS (
  SELECT a.c, e.i, CAST(floor(CAST(SUM(e.x) AS DOUBLE) / COUNT(*)) AS BIGINT) AS w
  FROM assign{t}_{sub} a JOIN ex e ON a.vec_id = e.vec_id
  WHERE e.i > {lo} AND e.i <= {hi} GROUP BY 1, 2
)""")
    codes = " UNION ALL ".join(
        f"SELECT vec_id, {sub} AS sub, c AS code FROM assign{iters}_{sub}" for sub in range(m)
    )
    lut = " UNION ALL ".join(
        f"""SELECT q.vec_id AS query_id, {sub} AS sub, ct.c AS code,
       SUM((q.x - ct.w) * (q.x - ct.w)) AS d
  FROM ex q JOIN cent{iters}_{sub} ct ON q.i = ct.i
  WHERE q.vec_id < {n_queries} GROUP BY 1, 3""" for sub in range(m)
    )
    parts.append(f""", codes AS ({codes}), lut AS ({lut}), est AS (
  SELECT l.query_id, c.vec_id AS neighbor_id, CAST(SUM(l.d) AS BIGINT) AS approx_d2
  FROM codes c JOIN lut l ON l.sub = c.sub AND l.code = c.code
  WHERE c.vec_id != l.query_id GROUP BY 1, 2
)
SELECT query_id, neighbor_id, rank, approx_d2 FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY approx_d2, neighbor_id) AS rank
  FROM est
) WHERE rank <= {k}""")
    return "".join(parts)


@register(
    "ann_pq",
    doc="Product-quantization ANN (Jegou et al. TPAMI'11): 4 independent "
    "per-subspace Lloyd codebooks (8 cells, 1 iteration, exact-integer) "
    "compress every 64-dim vector to 4 small ints; queries score the "
    "CODE table against a broadcast per-query lookup table of exact "
    "subspace distances (asymmetric distance computation) — raw corpus "
    "vectors are read once at encode time and never at query time, the "
    "8-64x memory reduction that makes billion-vector ANN fit a cluster. "
    "Composes with ann_ivf's cells for candidate pruning.",
    oracle=_pq_oracle(),
)
def ann_pq_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    return S.ann_pq(emb, "vec_id", "embedding", query_ids=range(10), k=5, dim=64)


def _ivfpq_oracle(
    n_cells: int = 8, n_probe: int = 2, coarse_iters: int = 2,
    m: int = 4, pq_iters: int = 1, k: int = 5, n_queries: int = 10, dim: int = 64,
) -> str:
    """operators.similarity.ann_ivfpq: the coarse-quantizer chain
    (:func:`_kmeans_ctes`, cent{t}/assign{t}) + the per-subspace PQ chains
    (cent{t}_{s}, distinct names — no CTE collision) + candidates from the
    probed cells + ADC estimate restricted to candidates."""
    d_sub = dim // m
    parts = _kmeans_ctes(n_cells, coarse_iters)
    for sub in range(m):
        lo, hi = sub * d_sub, (sub + 1) * d_sub  # ex's i is 1-based
        parts.append(f""", pqc0_{sub} AS (
  SELECT vec_id AS c, i, x AS w FROM ex WHERE vec_id < {n_cells} AND i > {lo} AND i <= {hi}
)""")
        for t in range(pq_iters + 1):
            parts.append(f""", pqd{t}_{sub} AS (
  SELECT e.vec_id, ct.c, SUM((e.x - ct.w) * (e.x - ct.w)) AS d
  FROM ex e JOIN pqc{t}_{sub} ct ON e.i = ct.i GROUP BY 1, 2
), pqa{t}_{sub} AS (
  SELECT vec_id, c FROM (
    SELECT vec_id, c, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn FROM pqd{t}_{sub}
  ) WHERE rn = 1
)""")
            if t < pq_iters:
                parts.append(f""", pqc{t + 1}_{sub} AS (
  SELECT a.c, e.i, CAST(floor(CAST(SUM(e.x) AS DOUBLE) / COUNT(*)) AS BIGINT) AS w
  FROM pqa{t}_{sub} a JOIN ex e ON a.vec_id = e.vec_id
  WHERE e.i > {lo} AND e.i <= {hi} GROUP BY 1, 2
)""")
    codes = " UNION ALL ".join(
        f"SELECT vec_id, {sub} AS sub, c AS code FROM pqa{pq_iters}_{sub}" for sub in range(m)
    )
    lut = " UNION ALL ".join(
        f"""SELECT q.vec_id AS query_id, {sub} AS sub, ct.c AS code,
       SUM((q.x - ct.w) * (q.x - ct.w)) AS d
  FROM ex q JOIN pqc{pq_iters}_{sub} ct ON q.i = ct.i
  WHERE q.vec_id < {n_queries} GROUP BY 1, 3""" for sub in range(m)
    )
    parts.append(f""", probe AS (
  SELECT vec_id AS query_id, c FROM (
    SELECT vec_id, c, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn
    FROM dist{coarse_iters} WHERE vec_id < {n_queries}
  ) WHERE rn <= {n_probe}
), cand AS (
  SELECT p.query_id, a.vec_id AS neighbor_id
  FROM probe p JOIN assign{coarse_iters} a ON p.c = a.c
  WHERE a.vec_id != p.query_id
), codes AS ({codes}), lut AS ({lut}), est AS (
  SELECT cd.query_id, cd.neighbor_id, CAST(SUM(l.d) AS BIGINT) AS approx_d2
  FROM cand cd
  JOIN codes c ON c.vec_id = cd.neighbor_id
  JOIN lut l ON l.query_id = cd.query_id AND l.sub = c.sub AND l.code = c.code
  GROUP BY 1, 2
)
SELECT query_id, neighbor_id, rank, approx_d2 FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY approx_d2, neighbor_id) AS rank
  FROM est
) WHERE rank <= {k}""")
    return "".join(parts)


@register(
    "ann_ivfpq",
    doc="IVF+PQ — the standard billion-vector ANN composition: the IVF "
    "coarse quantizer prunes to each query's 2 nearest cells, and only "
    "those members are scored by asymmetric distance computation over "
    "their 4-int PQ codes (flat-PQ variant; residual PQ documented as the "
    "recall-upgrade path). Query-time cost is O(probed members) rows of "
    "4 small ints — neither the full code table nor any raw corpus "
    "vector. Exact-int64 throughout; oracle composes the coarse Lloyd "
    "chain with the per-subspace PQ chains.",
    oracle=_ivfpq_oracle(),
)
def ann_ivfpq_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    return S.ann_ivfpq(emb, "vec_id", "embedding", query_ids=range(10), k=5, dim=64)


def _ivfpq_residual_oracle(
    n_cells: int = 8, n_probe: int = 2, coarse_iters: int = 2,
    m: int = 4, pq_iters: int = 1, k: int = 5, n_queries: int = 10, dim: int = 64,
) -> str:
    """operators.similarity.ann_ivfpq_residual: the coarse Lloyd chain, then
    PER-CELL residual components (x − own cell's centroid), per-cell
    per-subspace codebooks (grouped Lloyd — cell rides every CTE as a
    grouping column, so the chains don't unroll over cells), per-probed-cell
    residual queries, and ADC against each probed cell's own codebook.
    MATERIALIZED on every CTE reused across rounds/subspaces (DuckDB inlines
    single-reference CTEs transitively — exponential re-evaluation without
    the hint)."""
    d_sub = dim // m
    T = coarse_iters
    parts = _kmeans_ctes(n_cells, T)
    parts.append(f""", res AS MATERIALIZED (
  SELECT e.vec_id, a.c AS cell, e.i, e.x - ct.w AS x
  FROM ex e JOIN assign{T} a ON e.vec_id = a.vec_id
  JOIN cent{T} ct ON ct.c = a.c AND ct.i = e.i
), rseed AS MATERIALIZED (
  SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY cell ORDER BY vec_id) - 1 AS code
  FROM (SELECT DISTINCT vec_id, cell FROM res)
)""")
    for s in range(m):
        lo, hi = s * d_sub, (s + 1) * d_sub  # ex's i is 1-based
        parts.append(f""", rcent0_{s} AS MATERIALIZED (
  SELECT r.cell, sd.code, r.i, r.x AS w
  FROM rseed sd JOIN res r ON r.vec_id = sd.vec_id AND r.cell = sd.cell
  WHERE sd.code < {n_cells} AND r.i > {lo} AND r.i <= {hi}
)""")
        for t in range(pq_iters + 1):
            parts.append(f""", rd{t}_{s} AS MATERIALIZED (
  SELECT r.vec_id, r.cell, ct.code, SUM((r.x - ct.w) * (r.x - ct.w)) AS d
  FROM res r JOIN rcent{t}_{s} ct ON ct.cell = r.cell AND ct.i = r.i
  WHERE r.i > {lo} AND r.i <= {hi} GROUP BY 1, 2, 3
), ra{t}_{s} AS MATERIALIZED (
  SELECT vec_id, cell, code FROM (
    SELECT vec_id, cell, code, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, code) AS rn
    FROM rd{t}_{s}
  ) WHERE rn = 1
)""")
            if t < pq_iters:
                parts.append(f""", rcent{t + 1}_{s} AS MATERIALIZED (
  SELECT a.cell, a.code, r.i, CAST(floor(CAST(SUM(r.x) AS DOUBLE) / COUNT(*)) AS BIGINT) AS w
  FROM ra{t}_{s} a JOIN res r ON r.vec_id = a.vec_id
  WHERE r.i > {lo} AND r.i <= {hi} GROUP BY 1, 2, 3
)""")
    codes = " UNION ALL ".join(
        f"SELECT vec_id, cell, {s} AS sub, code FROM ra{pq_iters}_{s}" for s in range(m)
    )
    lut = " UNION ALL ".join(
        f"""SELECT rq.query_id, rq.cell, {s} AS sub, ct.code,
       SUM((rq.x - ct.w) * (rq.x - ct.w)) AS d
  FROM rquery rq JOIN rcent{pq_iters}_{s} ct ON ct.cell = rq.cell AND ct.i = rq.i
  WHERE rq.i > {s * d_sub} AND rq.i <= {(s + 1) * d_sub} GROUP BY 1, 2, 4""" for s in range(m)
    )
    parts.append(f""", probe AS MATERIALIZED (
  SELECT vec_id AS query_id, c AS cell FROM (
    SELECT vec_id, c, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn
    FROM dist{T} WHERE vec_id < {n_queries}
  ) WHERE rn <= {n_probe}
), rquery AS MATERIALIZED (
  SELECT p.query_id, p.cell, e.i, e.x - ct.w AS x
  FROM probe p JOIN ex e ON e.vec_id = p.query_id
  JOIN cent{T} ct ON ct.c = p.cell AND ct.i = e.i
), codes AS MATERIALIZED ({codes}), lut AS MATERIALIZED ({lut}), est AS (
  SELECT l.query_id, c.vec_id AS neighbor_id, CAST(SUM(l.d) AS BIGINT) AS approx_d2
  FROM codes c JOIN lut l ON l.cell = c.cell AND l.sub = c.sub AND l.code = c.code
  WHERE c.vec_id != l.query_id GROUP BY 1, 2
)
SELECT query_id, neighbor_id, rank, approx_d2 FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY approx_d2, neighbor_id) AS rank
  FROM est
) WHERE rank <= {k}""")
    return "".join(parts)


@register(
    "ann_ivfpq_residual",
    doc="IVF + RESIDUAL PQ (Jegou et al. TPAMI'11 III.C, the standard "
    "recall upgrade over flat ann_ivfpq): PQ codebooks trained PER COARSE "
    "CELL on the residuals v - centroid(cell) via one grouped Lloyd "
    "(all n_cells x m_subs codebooks in O(iters) jobs), queries "
    "residualized against each probed cell's centroid and scored by ADC "
    "against that cell's own codebook. No materialized candidate frame at "
    "all - probed membership IS the codes-to-probes equi-join, probes/LUT "
    "size-gated broadcasts (maybe_broadcast). Exact-int64 end to end. "
    "Shipped at n_probe=4: SCALE.md's round-7 A/B showed n_probe=2 loses "
    "more recall to IVF pruning than residual codebooks gain; doubling the "
    "probe count recovers it (cost is linear in n_probe, still corpus-"
    "sublinear).",
    oracle=_ivfpq_residual_oracle(n_probe=4),
)
def ann_ivfpq_residual_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    return S.ann_ivfpq_residual(
        emb, "vec_id", "embedding", query_ids=range(10), k=5, dim=64, n_probe=4
    )


def _semantic_dedup_oracle(threshold: float = 0.4, n_cells: int = 8, iters: int = 2) -> str:
    """operators.similarity.semantic_dedup, restated in SQL: the shared
    deterministic-Lloyd chain, then within-cluster pairs (a < b) whose
    cosine clears the threshold mark the larger id as a duplicate; survivors
    are everything else, with their cluster."""
    parts = _kmeans_ctes(n_cells, iters)
    parts.append(f""", cand AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM assign{iters} a JOIN assign{iters} b ON a.c = b.c AND a.vec_id < b.vec_id
), dots AS (
  SELECT c.id_a, c.id_b, SUM(ae.x * be.x) AS dot
  FROM cand c
  JOIN ex ae ON ae.vec_id = c.id_a
  JOIN ex be ON be.vec_id = c.id_b AND be.i = ae.i
  GROUP BY 1, 2
), dups AS (
  SELECT DISTINCT id_b
  FROM dots JOIN norms na ON id_a = na.vec_id JOIN norms nb ON id_b = nb.vec_id
  WHERE dot / (sqrt(CAST(na.nn AS DOUBLE)) * sqrt(CAST(nb.nn AS DOUBLE))) >= {threshold}
)
SELECT a.vec_id, a.c AS cell
FROM assign{iters} a
WHERE a.vec_id NOT IN (SELECT id_b FROM dups)""")
    return "".join(parts)


@register(
    "semantic_dedup",
    doc="SemDeDup-style semantic deduplication (Abbas et al. 2303.09540): "
    "deterministic-Lloyd k-means clusters the embeddings (8 cells, 2 "
    "iterations, exact-integer distances), then near-duplicates are pruned "
    "WITHIN clusters only (cosine >= 0.4, greedy keep-lowest-id) — the "
    "clustering turns the quadratic all-pairs problem into per-cluster "
    "blocks, the production regime for corpus-scale semantic dedup. "
    "Survivors returned with their cluster.",
    oracle=_semantic_dedup_oracle(),
)
def semantic_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    return S.semantic_dedup(emb, "vec_id", "embedding", threshold=0.4, dim=64)


@register(
    "ann_ivf",
    doc="IVF approximate top-5: deterministic Lloyd k-means coarse quantizer "
    "(8 cells, 2 iterations, exact-integer distances and floor-mean "
    "centroids) trained via the Cycle operator (Stream.iterate), corpus "
    "inverted by nearest cell, queries scoring only their 2 nearest cells. "
    "The data-adaptive scale path beside ann_lsh's fixed hyperplanes.",
    oracle=_ivf_oracle(),
)
def ann_ivf_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    # dim=64 is a property of the embeddings table; passing it skips the
    # per-invocation _dim_of probe job
    return S.ann_ivf(emb, "vec_id", "embedding", query_ids=range(10), k=5, n_cells=8, n_probe=2, iters=2, dim=64)


# --- end-to-end curation ----------------------------------------------------

_STOP_IN = ", ".join("'" + w + "'" for w in T.STOPWORDS)


@register(
    "corpus_curation_pipeline",
    doc="Flagship composite: the full training-corpus curation flow in ONE "
    "declarative plan — quality scoring + language ID (narrow projections), "
    "quality/lang gate, exact dedup (earliest survivor), deterministic "
    "train/val/test split, per-split audit stats. At 100 TB this is scan → "
    "one dedup shuffle → one 3-row aggregate; every filter runs before the "
    "shuffle, and the split label adds zero shuffles (operators/sampling.py).",
    oracle=f"""
WITH t AS (
  SELECT doc_id, text, {_SQL_TOKENS} AS tokens FROM documents
), f AS (
  SELECT doc_id, text,
         len(tokens) AS n_tokens,
         CAST(len(list_filter(tokens, x -> x IN ({_STOP_IN}))) AS DOUBLE)
           / greatest(len(tokens), 1) * 0.4
           + (1.0 - CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) / greatest(length(text), 1)) * 0.2
           + CAST(least(len(tokens), 64) AS DOUBLE) / 64.0 * 0.4 AS quality_score,
         len(list_filter(tokens, x -> x IN ({', '.join("'" + w + "'" for w in T.LANG_MARKERS['en'])}))) AS s_en,
         len(list_filter(tokens, x -> x IN ({', '.join("'" + w + "'" for w in T.LANG_MARKERS['es'])}))) AS s_es,
         len(list_filter(tokens, x -> x IN ({', '.join("'" + w + "'" for w in T.LANG_MARKERS['fr'])}))) AS s_fr,
         len(list_filter(tokens, x -> x IN ({', '.join("'" + w + "'" for w in T.LANG_MARKERS['de'])}))) AS s_de
  FROM t
), kept AS (
  SELECT * FROM f
  WHERE quality_score >= 0.55 AND n_tokens >= 8
    AND greatest(s_en, s_es, s_fr, s_de) > 0 AND s_en = greatest(s_en, s_es, s_fr, s_de)
), surv AS (
  SELECT arg_min(doc_id, doc_id) AS doc_id,
         arg_min(n_tokens, doc_id) AS n_tokens,
         arg_min(quality_score, doc_id) AS quality_score
  FROM kept GROUP BY text
), labeled AS (
  SELECT *, CASE WHEN {{b}} < 80 THEN 'train' WHEN {{b}} < 90 THEN 'val' ELSE 'test' END AS split
  FROM surv
)
SELECT split, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       MIN(quality_score) AS min_quality, MAX(quality_score) AS max_quality
FROM labeled GROUP BY split
""".replace(
        "{b}",
        "(xor(" + _SQL_H31.format(s="CAST(doc_id AS VARCHAR)")
        + ", (" + _SQL_H131.format(s="CAST(doc_id AS VARCHAR)") + " * 65537) % 2147483647) % 100)",
    ),
)
def corpus_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from milan_spark.operators.sampling import hash_split

    docs = table(spark, sf_dir, "documents")
    toks = T.tokenize("text")
    enriched = T.quality_features(docs, "text").withColumn("lang_pred", T.lang_id(toks))
    kept = enriched.filter(
        (F.col("quality_score") >= 0.55) & (F.col("n_tokens") >= 8) & (F.col("lang_pred") == "en")
    )
    surv = (
        kept.groupBy("text")
        .agg(F.min_by(F.struct("doc_id", "n_tokens", "quality_score"), F.col("doc_id")).alias("r"))
        .select("r.doc_id", "r.n_tokens", "r.quality_score")
    )
    return (
        hash_split(surv, "doc_id")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.min("quality_score").alias("min_quality"),
            F.max("quality_score").alias("max_quality"),
        )
    )


# --- sequence packing & mixture composition ---------------------------------

_SQL_DOC_ORD = (
    "(xor(" + _SQL_H31.format(s="CAST(doc_id AS VARCHAR)")
    + ", (" + _SQL_H131.format(s="CAST(doc_id AS VARCHAR)") + " * 65537) % 2147483647) % 1073741824)"
)


@register(
    "pack_sequences_512",
    doc="Concat-and-chunk sequence packing (operators/packing.py): the corpus "
    "laid out in deterministic hash order and cut into 512-token training "
    "sequences. The global exclusive prefix sum is the two-phase scan — "
    "order-aligned range buckets, parallel within-bucket windows, O(buckets) "
    "offsets broadcast back — so no task ever scans the whole corpus, unlike "
    "the naive single-partition SUM() OVER (ORDER BY …).",
    oracle=f"""
WITH t AS (
  SELECT doc_id, len({_SQL_TOKENS}) AS n_tokens, {_SQL_DOC_ORD} AS ord
  FROM documents
), p AS (
  SELECT doc_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (ORDER BY ord, doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS e
  FROM t
)
SELECT doc_id, n_tokens, CAST(e // 512 AS BIGINT) AS seq_id, CAST(e % 512 AS BIGINT) AS seq_offset,
       (n_tokens > 0 AND (e + n_tokens - 1) // 512 <> e // 512) AS spans_boundary
FROM p
""",
)
def pack_sequences_512(spark: SparkSession, sf_dir: str) -> DataFrame:
    from milan_spark.operators.packing import pack_sequences

    docs = table(spark, sf_dir, "documents")
    return pack_sequences(docs, "doc_id", T.token_count("text"), budget=512).select(
        "doc_id", "n_tokens", "seq_id", "seq_offset", "spans_boundary"
    )


@register(
    "token_budget_mixture_sources",
    doc="Token-quota mixture composition (operators/packing.py): per source, "
    "take documents in deterministic hash order until an 800-token quota is "
    "reached (kept iff the document STARTS inside the quota). One keyed "
    "window shuffle; the kept set is a pure function of the corpus, so "
    "mixture re-runs and incremental refreshes are auditable.",
    oracle=f"""
WITH t AS (
  SELECT doc_id, source, len({_SQL_TOKENS}) AS n_tokens, {_SQL_DOC_ORD} AS ord
  FROM documents
), p AS (
  SELECT *, COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY ord, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS e
  FROM t
)
SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
FROM p WHERE e < 800 GROUP BY source
""",
)
def token_budget_mixture_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    from milan_spark.operators.packing import token_budget_mixture

    docs = table(spark, sf_dir, "documents").withColumn("n_tokens", T.token_count("text"))
    kept = token_budget_mixture(docs, "source", "n_tokens", 800, key="doc_id")
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_tokens").alias("total_tokens")
    )


@register(
    "token_counts",
    doc="Token counting for budget estimation: whitespace-word count vs "
    "BPE-ish pre-tokenization count (GPT-2-style split simplified to a "
    "lookahead-free ordered alternation — identical in Java regex and RE2). "
    "All JVM-side regexp; the BPE-ish count is what token-budget operators "
    "(pack_sequences, token_budget_mixture) should feed on real corpora.",
    oracle=r"""
SELECT doc_id,
       len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_ws_tokens,
       len(regexp_extract_all(lower(text), '''(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s'']+')) AS n_bpe_tokens
FROM documents
""",
)
def token_counts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        T.token_count("text").alias("n_ws_tokens"),
        T.bpe_token_count("text").alias("n_bpe_tokens"),
    )


@register(
    "audio_wav_features",
    doc="REAL audio codec path: deterministic 16-bit PCM WAV payloads are "
    "synthesized per document (encode_wav_pcm16), then round-tripped through "
    "the stdlib RIFF/WAVE parser (decode_audio) inside mapInPandas to "
    "extract sample count, rate, peak, and exact int64 energy. The oracle "
    "recomputes the features from the same deterministic sample formula — "
    "so a header-parse or frame-decode bug breaks the hash match.",
    oracle="""
WITH d AS (SELECT doc_id, (doc_id % 50) + 10 AS n FROM documents),
s AS (
  SELECT doc_id, n, ((doc_id * 31 + r.i * 7) % 65536) - 32768 AS v
  FROM d, range(60) r(i) WHERE r.i < n
)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_samples,
       CAST(8000 AS BIGINT) AS sample_rate,
       CAST(MAX(ABS(v)) AS BIGINT) AS peak,
       CAST(SUM(v * v) AS BIGINT) AS energy
FROM s GROUP BY doc_id, n
""",
)
def audio_wav_features_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from milan_spark.operators.multimodal import audio_features, encode_wav_pcm16

    docs = table(spark, sf_dir, "documents").select("doc_id")

    def synth(batches):
        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                n = int(did) % 50 + 10
                i = np.arange(n, dtype=np.int64)
                v = (int(did) * 31 + i * 7) % 65536 - 32768
                payloads.append(encode_wav_pcm16(v, rate=8000))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    wav = docs.mapInPandas(synth, "doc_id long, payload binary")
    return audio_features(wav)


@register(
    "image_bmp_features",
    doc="REAL image codec path: deterministic 24-bit BMP payloads (varying "
    "width/height, so row padding and bottom-up order are exercised) are "
    "synthesized per document (encode_bmp), nearest-neighbor resized to 4x4 "
    "through decode->resize->re-encode (resize_images), then decoded again "
    "for exact int64 pixel stats (image_features). The oracle recomputes "
    "the stats from the same pixel formula INCLUDING the floor-division "
    "resize index math; wsum weights channels 1/2/3 so a BGR<->RGB swap "
    "anywhere in the codec breaks the hash.",
    oracle="""
WITH d AS (SELECT doc_id, (doc_id % 7) + 2 AS w, (doc_id % 5) + 2 AS h FROM documents),
px AS (
  SELECT doc_id, c.i AS c,
         (doc_id * 7 + ((yo.i * h) // 4) * 31 + ((xo.i * w) // 4) * 5 + c.i * 3) % 256 AS v
  FROM d, range(4) yo(i), range(4) xo(i), range(3) c(i)
)
SELECT doc_id,
       CAST(4 AS BIGINT) AS width,
       CAST(4 AS BIGINT) AS height,
       CAST(SUM(v) AS BIGINT) AS px_sum,
       CAST(MAX(v) AS BIGINT) AS px_max,
       CAST(SUM(v * (c + 1)) AS BIGINT) AS wsum
FROM px GROUP BY doc_id
""",
)
def image_bmp_features_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from milan_spark.operators.multimodal import (
        encode_bmp,
        image_features,
        resize_images,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id")

    def synth(batches):
        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = did % 7 + 2, did % 5 + 2
                y = np.arange(h).reshape(h, 1, 1)
                x = np.arange(w).reshape(1, w, 1)
                c = np.arange(3).reshape(1, 1, 3)
                px = ((did * 7 + y * 31 + x * 5 + c * 3) % 256).astype(np.uint8)
                payloads.append(encode_bmp(px))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    bmp = docs.mapInPandas(synth, "doc_id long, payload binary")
    return image_features(resize_images(bmp, 4, 4))


from milan_spark.operators.multimodal import pil_available as _pil_available  # noqa: E402

if _pil_available():
    # Optional-dependency tier (same pattern as catalog._ensure_loaded):
    # registers only when Pillow is importable, so the container suite is
    # unaffected while environments with the lib get a compressed-format
    # codec query with a REAL value oracle — PNG is lossless, so the decoded
    # pixel stats match the synthesis formula exactly, bit for bit.
    @register(
        "image_png_features",
        doc="Compressed image codec path (optional Pillow tier): the same "
        "deterministic per-document pixels as image_bmp_features are "
        "PNG-encoded (lossless), decoded through the Pillow branch of "
        "decode_image, and reduced to exact int64 pixel stats. Registered "
        "only when Pillow is importable.",
        oracle="""
WITH d AS (SELECT doc_id, (doc_id % 7) + 2 AS w, (doc_id % 5) + 2 AS h FROM documents),
px AS (
  SELECT doc_id, w, h, c.i AS c,
         (doc_id * 7 + yo.i * 31 + xo.i * 5 + c.i * 3) % 256 AS v
  FROM d, range(8) yo(i), range(8) xo(i), range(3) c(i)
  WHERE yo.i < h AND xo.i < w
)
SELECT doc_id,
       CAST(MAX(w) AS BIGINT) AS width,
       CAST(MAX(h) AS BIGINT) AS height,
       CAST(SUM(v) AS BIGINT) AS px_sum,
       CAST(MAX(v) AS BIGINT) AS px_max,
       CAST(SUM(v * (c + 1)) AS BIGINT) AS wsum
FROM px GROUP BY doc_id
""",
    )
    def image_png_features_q(spark: SparkSession, sf_dir: str) -> DataFrame:
        import numpy as np
        import pandas as pd

        from milan_spark.operators.multimodal import encode_png, image_features

        docs = table(spark, sf_dir, "documents").select("doc_id")

        def synth(batches):
            for pdf in batches:
                payloads = []
                for did in pdf["doc_id"]:
                    did = int(did)
                    w, h = did % 7 + 2, did % 5 + 2
                    y = np.arange(h).reshape(h, 1, 1)
                    x = np.arange(w).reshape(1, w, 1)
                    c = np.arange(3).reshape(1, 1, 3)
                    px = ((did * 7 + y * 31 + x * 5 + c * 3) % 256).astype(np.uint8)
                    payloads.append(encode_png(px))
                yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

        png = docs.mapInPandas(synth, "doc_id long, payload binary")
        return image_features(png)


@register(
    "video_avi_features",
    doc="REAL video codec path: deterministic multi-frame AVI payloads "
    "(varying width/height/frame-count, so row padding, word alignment, and "
    "the RIFF LIST tree are all exercised) are synthesized per document "
    "(encode_avi), then every-2nd frame is sampled through the stdlib "
    "RIFF/AVI parser (sample_frames via video_frame_features) for exact "
    "int64 per-frame pixel stats — one row per sampled frame, the exploding "
    "shape a real video pipeline has. The oracle recomputes the stats from "
    "the same pixel formula restricted to even frame numbers; wsum weights "
    "channels 1/2/3 so a BGR<->RGB swap or bottom-up row flip anywhere in "
    "the container round-trip breaks the hash.",
    oracle="""
WITH d AS (
  SELECT doc_id, (doc_id % 6) + 2 AS w, (doc_id % 4) + 2 AS h,
         (doc_id % 5) + 2 AS nf
  FROM documents
),
fr AS (
  SELECT doc_id, w, h, f.i AS frame_no
  FROM d, range(6) f(i) WHERE f.i < nf AND f.i % 2 = 0
),
px AS (
  SELECT doc_id, frame_no, w, h, c.i AS c,
         (doc_id * 7 + frame_no * 11 + y.i * 31 + x.i * 5 + c.i * 3) % 256 AS v
  FROM fr, range(5) y(i), range(7) x(i), range(3) c(i)
  WHERE y.i < h AND x.i < w
)
SELECT doc_id, frame_no,
       CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
       CAST(SUM(v) AS BIGINT) AS px_sum,
       CAST(SUM(v * (c + 1)) AS BIGINT) AS wsum
FROM px GROUP BY doc_id, frame_no, w, h
""",
)
def video_avi_features_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from milan_spark.operators.multimodal import encode_avi, video_frame_features

    docs = table(spark, sf_dir, "documents").select("doc_id")

    def synth(batches):
        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h, nf = did % 6 + 2, did % 4 + 2, did % 5 + 2
                f = np.arange(nf).reshape(nf, 1, 1, 1)
                y = np.arange(h).reshape(1, h, 1, 1)
                x = np.arange(w).reshape(1, 1, w, 1)
                c = np.arange(3).reshape(1, 1, 1, 3)
                px = ((did * 7 + f * 11 + y * 31 + x * 5 + c * 3) % 256).astype(np.uint8)
                payloads.append(encode_avi(list(px)))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    avi = docs.mapInPandas(synth, "doc_id long, payload binary")
    return video_frame_features(avi, every_n=2)


@register(
    "gopher_repetition_gate",
    doc="Gopher/MassiveText-style repetition filtering (Rae et al. 2021 "
    "§A.1.1): per-document fraction of all word bigrams/trigrams taken by "
    "the single most frequent one, with a keep/drop gate. One distributed "
    "pipeline computes both gram orders (operators.text.repetition_stats): "
    "tag+explode, ONE (doc, n, gram) count aggregate, ONE conditional "
    "per-doc rollup — two map-side-combinable shuffles, no Python. "
    "Fractions are double divisions of exact integers (identical IEEE both "
    "engines); the gate uses strict < so both engines cut identically.",
    oracle="""
WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents),
g2 AS (SELECT doc_id, array_to_string(toks[r.i:r.i+1], ' ') AS gram
       FROM t, range(512) r(i) WHERE r.i >= 1 AND r.i <= len(toks) - 1),
g3 AS (SELECT doc_id, array_to_string(toks[r.i:r.i+2], ' ') AS gram
       FROM t, range(512) r(i) WHERE r.i >= 1 AND r.i <= len(toks) - 2),
c2 AS (SELECT doc_id, gram, COUNT(*) AS c FROM g2 GROUP BY doc_id, gram),
c3 AS (SELECT doc_id, gram, COUNT(*) AS c FROM g3 GROUP BY doc_id, gram),
s2 AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams, MAX(c) AS top_bigram_cnt
       FROM c2 GROUP BY doc_id),
s3 AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_trigrams, MAX(c) AS top_trigram_cnt
       FROM c3 GROUP BY doc_id)
SELECT s2.doc_id, s2.n_bigrams, s2.top_bigram_cnt,
       COALESCE(s3.n_trigrams, 0) AS n_trigrams,
       COALESCE(s3.top_trigram_cnt, 0) AS top_trigram_cnt,
       CAST(s2.top_bigram_cnt AS DOUBLE) / CAST(s2.n_bigrams AS DOUBLE) AS top_bigram_frac,
       (CAST(s2.top_bigram_cnt AS DOUBLE) / CAST(s2.n_bigrams AS DOUBLE) < 0.05
        AND (s3.doc_id IS NULL OR
             CAST(s3.top_trigram_cnt AS DOUBLE) / CAST(s3.n_trigrams AS DOUBLE) < 0.04)) AS keep
FROM s2 LEFT JOIN s3 ON s2.doc_id = s3.doc_id
""",
)
def gopher_repetition_gate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from milan_spark.operators.text import repetition_stats

    docs = table(spark, sf_dir, "documents")
    st = repetition_stats(docs, "doc_id", "text")
    bi_frac = F.col("top_bigram_cnt").cast("double") / F.col("n_bigrams").cast("double")
    tri_frac = F.col("top_trigram_cnt").cast("double") / F.col("n_trigrams").cast("double")
    return st.select(
        F.col("__id").alias("doc_id"),
        "n_bigrams",
        "top_bigram_cnt",
        "n_trigrams",
        "top_trigram_cnt",
        bi_frac.alias("top_bigram_frac"),
        (
            (bi_frac < 0.05)
            & ((F.col("n_trigrams") == 0) | (tri_frac < 0.04))
        ).alias("keep"),
    )


@register(
    "decontaminate_ngram_overlap",
    doc="Benchmark decontamination (the GPT-3/Gopher eval-overlap rule): "
    "flag corpus documents sharing any word n-gram with a held-out "
    "benchmark set (docs with doc_id % 97 == 0 stand in for the eval set; "
    "n=3 plays the role 8-13-grams play on real corpora — this synthetic "
    "corpus has ~50-token docs). Plan: the benchmark side is DISTINCT "
    "grams of a tiny fixed set, so it BROADCASTS into a semi-join against "
    "the exploded corpus grams — the corpus never shuffles for the match; "
    "the per-doc distinct-overlap count is the only exchange. At 100 TB "
    "the same topology holds because eval sets stay KBs while the corpus "
    "grows; string grams here for oracle parity, hashed shingles "
    "(operators.dedup) when the benchmark set itself is large.",
    oracle="""
WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents),
g AS (SELECT doc_id, array_to_string(toks[r.i:r.i+2], ' ') AS gram
      FROM t, range(512) r(i) WHERE r.i >= 1 AND r.i <= len(toks) - 2),
bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0)
SELECT doc_id, CAST(COUNT(DISTINCT gram) AS BIGINT) AS n_shared_grams
FROM g
WHERE doc_id % 97 <> 0 AND gram IN (SELECT gram FROM bench)
GROUP BY doc_id
""",
)
def decontaminate_ngram_overlap_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from milan_spark.operators.text import word_ngrams

    docs = table(spark, sf_dir, "documents")
    grams = docs.select(
        "doc_id", F.explode(word_ngrams("text", 3)).alias("gram")
    )
    is_bench = F.col("doc_id") % 97 == 0
    bench = grams.filter(is_bench).select("gram").distinct()
    return (
        grams.filter(~is_bench)
        .join(F.broadcast(bench), "gram", "left_semi")
        .groupBy("doc_id")
        .agg(F.count_distinct("gram").alias("n_shared_grams"))
    )


@register(
    "pii_scrub_audit",
    doc="PII detection + scrubbing audit (the Common-Crawl-pipeline scrub "
    "step): count emails/phone numbers per document and verify the "
    "scrubbed text. The synthetic corpus has no PII, so deterministic PII "
    "is injected first (docs % 3 get an email derived from doc_id, docs % "
    "5 a phone number) — both engines derive the identical augmented text, "
    "so the regex counts and the scrubbed lengths are exact. Patterns stay "
    "in the RE2-compatible subset (no lookahead) so Java regex and RE2 "
    "agree; everything is JVM-side regexp — a narrow pipeline with zero "
    "shuffles (the scan feeds the project feeds the result).",
    oracle=r"""
WITH aug AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 3 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END
         || CASE WHEN doc_id % 5 = 0 THEN ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-0199' ELSE '' END
         AS t
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS INT) AS n_emails,
       CAST(len(regexp_extract_all(t, '\b\d{3}-\d{3}-\d{4}\b')) AS INT) AS n_phones,
       length(regexp_replace(regexp_replace(t, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'), '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g')) AS scrubbed_len
FROM aug
""",
)
def pii_scrub_audit_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from milan_spark.operators.text import pii_counts, scrub_pii

    docs = table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    email = F.when(
        did % 3 == 0,
        F.concat(F.lit(" contact user"), did.cast("string"), F.lit("@example.com")),
    ).otherwise(F.lit(""))
    phone = F.when(
        did % 5 == 0,
        F.concat(F.lit(" call 555-"), F.lpad((did % 1000).cast("string"), 3, "0"), F.lit("-0199")),
    ).otherwise(F.lit(""))
    aug = docs.select("doc_id", F.concat("text", email, phone).alias("t"))
    n_em, n_ph = pii_counts("t")
    return aug.select(
        "doc_id",
        n_em.alias("n_emails"),
        n_ph.alias("n_phones"),
        F.length(scrub_pii("t")).alias("scrubbed_len"),
    )


@register(
    "web_curation_pipeline",
    doc="FineWeb-style end-to-end curation flagship composing this round's "
    "operators in the order a production web-corpus pipeline runs them: "
    "(1) Gopher repetition gate (top-bigram frac < 0.05, top-trigram < "
    "0.04; docs too short to have bigrams drop), (2) PII scrub of the "
    "survivors, (3) benchmark decontamination (drop any doc sharing a "
    "trigram with the doc_id%97 eval set, which is itself excluded), "
    "(4) exact dedup on the SCRUBBED text (min-doc_id survivor), "
    "(5) per-language audit of what remains. Plan: the gate is the "
    "two-shuffle repetition aggregate joined back on doc_id; "
    "decontamination is a broadcast semi-join (corpus never shuffles for "
    "the match); dedup is one map-side-combinable groupBy on the scrubbed "
    "text; the audit is one more tiny aggregate. The oracle re-derives "
    "the ENTIRE pipeline as chained CTEs, so a break in any stage or in "
    "stage ORDER breaks the hash match.",
    oracle="""
WITH t AS (
  SELECT doc_id, lang, text, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
  FROM documents WHERE doc_id % 97 <> 0
),
g2 AS (SELECT doc_id, array_to_string(toks[r.i:r.i+1], ' ') AS gram
       FROM t, range(512) r(i) WHERE r.i >= 1 AND r.i <= len(toks) - 1),
g3 AS (SELECT doc_id, array_to_string(toks[r.i:r.i+2], ' ') AS gram
       FROM t, range(512) r(i) WHERE r.i >= 1 AND r.i <= len(toks) - 2),
c2 AS (SELECT doc_id, gram, COUNT(*) AS c FROM g2 GROUP BY doc_id, gram),
c3 AS (SELECT doc_id, gram, COUNT(*) AS c FROM g3 GROUP BY doc_id, gram),
s2 AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS nb, MAX(c) AS tb FROM c2 GROUP BY doc_id),
s3 AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS nt, MAX(c) AS tt FROM c3 GROUP BY doc_id),
gated AS (
  SELECT t.doc_id, t.lang, t.text, t.toks
  FROM t JOIN s2 ON t.doc_id = s2.doc_id LEFT JOIN s3 ON t.doc_id = s3.doc_id
  WHERE CAST(s2.tb AS DOUBLE) / CAST(s2.nb AS DOUBLE) < 0.05
    AND (s3.doc_id IS NULL OR CAST(s3.tt AS DOUBLE) / CAST(s3.nt AS DOUBLE) < 0.04)
),
bench AS (
  SELECT DISTINCT array_to_string(toks[r.i:r.i+2], ' ') AS gram
  FROM (SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        FROM documents WHERE doc_id % 97 = 0) b, range(512) r(i)
  WHERE r.i >= 1 AND r.i <= len(toks) - 2
),
contaminated AS (
  SELECT DISTINCT g.doc_id
  FROM (SELECT doc_id, array_to_string(toks[r.i:r.i+2], ' ') AS gram
        FROM gated, range(512) r(i) WHERE r.i >= 1 AND r.i <= len(toks) - 2) g
  WHERE g.gram IN (SELECT gram FROM bench)
),
clean AS (
  SELECT doc_id, lang,
         regexp_replace(regexp_replace(text,
           '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}', '<EMAIL>', 'g'),
           '\\b\\d{3}-\\d{3}-\\d{4}\\b', '<PHONE>', 'g') AS scrubbed
  FROM gated WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
),
dedup AS (
  SELECT MIN(doc_id) AS doc_id, scrubbed, arg_min(lang, doc_id) AS lang
  FROM clean GROUP BY scrubbed
)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(len(regexp_extract_all(lower(scrubbed), '[a-z0-9]+'))) AS BIGINT) AS total_tokens
FROM dedup GROUP BY lang
""",
)
def web_curation_pipeline_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from milan_spark.operators.text import (
        repetition_stats,
        scrub_pii,
        token_count,
        word_ngrams,
    )

    docs = table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 97 != 0).select("doc_id", "lang", "text")

    # (1) repetition gate
    st = repetition_stats(corpus, "doc_id", "text")
    bi = F.col("top_bigram_cnt").cast("double") / F.col("n_bigrams").cast("double")
    tri = F.col("top_trigram_cnt").cast("double") / F.col("n_trigrams").cast("double")
    keep_ids = st.filter(
        (bi < 0.05) & ((F.col("n_trigrams") == 0) | (tri < 0.04))
    ).select(F.col("__id").alias("doc_id"))
    gated = corpus.join(keep_ids, "doc_id", "left_semi")

    # (3) decontamination: any shared trigram with the eval set drops the doc
    bench = (
        docs.filter(F.col("doc_id") % 97 == 0)
        .select(F.explode(word_ngrams("text", 3)).alias("gram"))
        .distinct()
    )
    grams = gated.select("doc_id", F.explode(word_ngrams("text", 3)).alias("gram"))
    contaminated = (
        grams.join(F.broadcast(bench), "gram", "left_semi").select("doc_id").distinct()
    )
    decon = gated.join(F.broadcast(contaminated), "doc_id", "left_anti")

    # (2) PII scrub of survivors, then (4) exact dedup on scrubbed text
    clean = decon.select("doc_id", "lang", scrub_pii("text").alias("scrubbed"))
    dedup = clean.groupBy("scrubbed").agg(
        F.min("doc_id").alias("doc_id"), F.min_by("lang", "doc_id").alias("lang")
    )

    # (5) per-language audit
    return dedup.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count("scrubbed")).alias("total_tokens"),
    )


@register(
    "doc_chunking",
    doc="Sliding token-window chunking (window 64, stride 48 — the standard "
    "pre-embedding / pre-packing step): one row per chunk with its index, "
    "text, and token count. The whole plan is a narrow projection + bounded "
    "explode — ZERO shuffles; chunk rows inherit the scan partitioning, so "
    "at 100 TB this pipelines straight into pack_sequences or an embedding "
    "stage without an exchange. Work per doc is O(n_tokens·window/stride) "
    "via one slice per stride position (no quadratic re-scan); fan-out is "
    "ceil(n/stride) rows ≤ window tokens each — output is a constant "
    "factor of input, never quadratic.",
    oracle="""
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents
)
SELECT doc_id,
       CAST((p.i - 1) / 48 AS BIGINT) AS chunk_idx,
       array_to_string(toks[p.i:p.i+63], ' ') AS chunk_text,
       CAST(least(64, len(toks) - p.i + 1) AS INT) AS n_chunk_tokens
FROM (SELECT doc_id, toks, unnest(range(1, len(toks) + 1, 48)) AS i FROM t) p
""",
)
def doc_chunking_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from milan_spark.operators.chunking import chunk_tokens

    docs = table(spark, sf_dir, "documents")
    return chunk_tokens(docs, "doc_id", "text", window=64, stride=48)


@register(
    "collocation_pmi",
    doc="Collocation mining (lift = PMI without the log — identical ranking, "
    "no transcendental so both engines agree bit-for-bit): bigrams seen ≥5 "
    "times whose frequency beats word-independence by the rational "
    "threshold 5/4 (multiplied through, integer-exact). Two map-side-"
    "combinable count aggregates; component counts join onto the pruned "
    "bigram table keyed on words — fan-out per word is its DISTINCT-bigram "
    "count (vocabulary-bounded, so stopword skew is capped and nothing "
    "assumes a broadcastable vocabulary); the independence test multiplies "
    "through in DECIMAL(38,0), exact past int64 for 100 TB token counts.",
    oracle="""
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents
),
w AS (SELECT unnest(toks) AS w FROM t),
uni AS (SELECT w, COUNT(*) AS n_w FROM w GROUP BY w),
total AS (SELECT COUNT(*) AS n_total FROM w),
big AS (
  SELECT array_to_string(toks[p.i:p.i+1], ' ') AS gram
  FROM (SELECT toks, unnest(range(1, len(toks), 1)) AS i FROM t) p
),
bc AS (SELECT gram, COUNT(*) AS n_ab FROM big GROUP BY gram HAVING COUNT(*) >= 5)
SELECT bc.gram, bc.n_ab, a.n_w AS n_a, b.n_w AS n_b,
       (CAST(bc.n_ab AS DOUBLE) * CAST(total.n_total AS DOUBLE))
         / (CAST(a.n_w AS DOUBLE) * CAST(b.n_w AS DOUBLE)) AS lift
FROM bc, uni a, uni b, total
WHERE a.w = split_part(bc.gram, ' ', 1)
  AND b.w = split_part(bc.gram, ' ', 2)
  AND 4 * CAST(bc.n_ab AS HUGEINT) * CAST(total.n_total AS HUGEINT)
      > 5 * CAST(a.n_w AS HUGEINT) * CAST(b.n_w AS HUGEINT)
""",
)
def collocation_pmi_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return T.collocations(docs, "text", min_count=5, min_lift=(5, 4))


@register(
    "duplicate_passage_spans",
    doc="Cross-document duplicated-passage spans at 5-gram resolution — the "
    "distributed counterpart of suffix-array ExactSubstr dedup (Lee et al. "
    "ACL'22): runs of consecutive positions whose 5-shingles each appear "
    "in >1 document mark exact shared substrings of run+4 tokens. Three "
    "uniform-key shuffles (shingle count, shingle semi-join, per-doc run "
    "window) — no suffix array, no driver state; see "
    "operators.dedup.duplicate_passage_spans.",
    oracle="""
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents
),
g AS (
  SELECT doc_id, p.i AS pos, array_to_string(toks[p.i:p.i+4], ' ') AS gram
  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 3, 1)) AS i FROM t) p
),
shared AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(DISTINCT doc_id) > 1),
d AS (SELECT doc_id, pos FROM g WHERE gram IN (SELECT gram FROM shared)),
runs AS (
  SELECT doc_id, pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp FROM d
),
rs AS (SELECT doc_id, grp, COUNT(*) AS run FROM runs GROUP BY doc_id, grp)
SELECT doc_id, CAST(SUM(run) AS BIGINT) AS n_dup_positions, COUNT(*) AS n_dup_runs,
       MAX(run) + 4 AS max_dup_span_tokens
FROM rs GROUP BY doc_id
""",
)
def duplicate_passage_spans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return D.duplicate_passage_spans(docs, "doc_id", "text", k=5)


@register(
    "chunk_maxsim_retrieval",
    doc="RAG retrieval flagship (ColBERT-style max-sim, integer-exact): "
    "chunk every document (window 32, stride 32), featurize each chunk "
    "with a deterministic 8-dim hash embedding (affine maps of the chunk's "
    "md5-prefix fold mod 2^31-1 then mod 10007 — one NATIVE hash call per "
    "chunk on both engines instead of a per-character interpreted fold, "
    "which halved this query's wall time; components < 10007, dots < 2^33, "
    "all exact int64), then for each query chunk (the 40 LOWEST doc_ids "
    "≡ 0 mod 101, held out) score "
    "corpus documents by their BEST chunk's inner product and keep the "
    "top 3 docs per query chunk (ties broken on doc_id). Plan: the query "
    "side is FIXED-SIZE by construction (retrieval's production contract: "
    "an external query load that does not grow with the corpus — round-8 "
    "fix; the earlier docs%101 query set grew with sf, making measured "
    "work corpus×queries = quadratic, 57x wall at 10x data) → broadcast "
    "nested-loop against corpus chunks that NEVER shuffle before scoring; "
    "per-(query, doc) max and the global per-query top-k are combinable "
    "aggregates + one small window. At 100 TB the same topology holds; "
    "the IVF/LSH candidate pruning of operators.similarity composes in "
    "front when the query set itself grows. No floats anywhere — the "
    "score IS the integer dot product.",
    oracle="""
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents
),
c AS (
  SELECT doc_id,
         CAST((p.i - 1) / 32 AS BIGINT) AS chunk_idx,
         array_to_string(toks[p.i:p.i+31], ' ') AS chunk_text
  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) + 1, 32)) AS i FROM t) p
),
f AS (
  SELECT doc_id, chunk_idx,
         ('0x' || substr(md5(chunk_text), 1, 15))::BIGINT % 2147483647 AS fold
  FROM c
),
e AS (
  SELECT doc_id, chunk_idx,
         list_transform(range(8), d -> (fold * (2 * d + 1) + d) % 10007) AS emb
  FROM f
),
qdocs AS (
  SELECT DISTINCT doc_id FROM e WHERE doc_id % 101 = 0 ORDER BY doc_id LIMIT 40
),
q AS (
  SELECT e.doc_id AS q_doc, chunk_idx AS q_chunk, emb AS q_emb
  FROM e JOIN qdocs ON e.doc_id = qdocs.doc_id
),
corpus AS (SELECT doc_id, emb FROM e WHERE doc_id % 101 <> 0),
scored AS (
  SELECT q.q_doc, q.q_chunk, corpus.doc_id,
         MAX(CAST(list_sum(list_transform(range(8), i -> q.q_emb[i + 1] * corpus.emb[i + 1])) AS BIGINT)) AS best_dot
  FROM q, corpus
  GROUP BY q.q_doc, q.q_chunk, corpus.doc_id
),
ranked AS (
  SELECT q_doc, q_chunk, doc_id, best_dot,
         ROW_NUMBER() OVER (PARTITION BY q_doc, q_chunk ORDER BY best_dot DESC, doc_id) AS rk
  FROM scored
)
SELECT q_doc, q_chunk, doc_id, best_dot, rk FROM ranked WHERE rk <= 3
""",
)
def chunk_maxsim_retrieval_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from milan_spark.operators.chunking import chunk_tokens

    docs = table(spark, sf_dir, "documents")
    chunks = chunk_tokens(docs, "doc_id", "text", window=32, stride=32)
    fold = F.conv(F.substring(F.md5("chunk_text"), 1, 15), 16, 10).cast("long") % F.lit(
        2_147_483_647
    )
    emb = F.transform(
        F.sequence(F.lit(0), F.lit(7)),
        lambda d: (fold * (d * 2 + 1) + d) % 10007,
    )
    # materialize the featurized chunks: without the barrier Catalyst
    # collapses the embedding projection into the join output and the
    # char fold re-evaluates once PER PAIR (measured 46 s vs 5.8 s cold
    # at sf0.1)
    e = chunks.select("doc_id", "chunk_idx", emb.alias("emb")).persist()
    is_q = F.col("doc_id") % 101 == 0
    # fixed-size query load: the 40 lowest held-out doc_ids (deterministic).
    # The sort-limit runs on the already-held-out ~1% slice and its result
    # is a 40-row broadcast — the corpus-side cost stays one linear scan.
    qdocs = (
        e.filter(is_q).select("doc_id").distinct().orderBy("doc_id").limit(40)
    )
    q = e.join(F.broadcast(qdocs), "doc_id").select(
        F.col("doc_id").alias("q_doc"), F.col("chunk_idx").alias("q_chunk"),
        F.col("emb").alias("q_emb"),
    )
    corpus = e.filter(~is_q)
    dot = F.aggregate(
        F.zip_with("q_emb", "emb", lambda a, b: a * b), F.lit(0).cast("long"), lambda s, x: s + x
    )
    scored = (
        corpus.crossJoin(F.broadcast(q))
        .select("q_doc", "q_chunk", "doc_id", dot.alias("__dot"))
        .groupBy("q_doc", "q_chunk", "doc_id")
        .agg(F.max("__dot").alias("best_dot"))
    )
    w = W.partitionBy("q_doc", "q_chunk").orderBy(F.col("best_dot").desc(), F.col("doc_id"))
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 3)


@register(
    "quality_percentile_gate",
    doc="Per-source quality-percentile gate (operators.sampling."
    "top_fraction_by_score): keep each source's top 20% of documents by "
    "quality score — EXACTLY the set a per-source ROW_NUMBER over (score "
    "DESC, doc_id) ≤ ⌊n/5⌋ selects, computed by distributed selection "
    "(score histogram → threshold bucket → boundary-bucket rank) so no "
    "task ever sorts a whole source — the gate that still works when one "
    "source is 90% of a 100 TB corpus. The oracle is the naive "
    "single-window formulation; equality proves the selection exact.",
    oracle=f"""
WITH t AS (
  SELECT doc_id, source, {_SQL_TOKENS} AS tokens, text FROM documents
),
scored AS (
  SELECT doc_id, source,
       CAST(len(list_filter(tokens, x -> x IN ({', '.join("'" + w + "'" for w in T.STOPWORDS)}))) AS DOUBLE)
         / greatest(len(tokens), 1) * 0.4
         + (1.0 - CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) / greatest(length(text), 1)) * 0.2
         + CAST(least(len(tokens), 64) AS DOUBLE) / 64.0 * 0.4 AS quality_score
  FROM t
),
quota AS (
  SELECT source, CAST(COUNT(*) / 5 AS BIGINT) AS q FROM scored GROUP BY source
),
ranked AS (
  SELECT s.doc_id, s.source, s.quality_score,
         ROW_NUMBER() OVER (PARTITION BY s.source ORDER BY s.quality_score DESC, s.doc_id) AS rk
  FROM scored s
)
SELECT r.doc_id, r.source, r.quality_score
FROM ranked r, quota
WHERE quota.source = r.source AND r.rk <= quota.q
""",
)
def quality_percentile_gate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from milan_spark.operators.sampling import top_fraction_by_score

    docs = table(spark, sf_dir, "documents")
    scored = T.quality_features(docs, "text").select("doc_id", "source", "quality_score")
    return top_fraction_by_score(
        scored, ["source"], "quality_score", frac=(1, 5), key="doc_id"
    ).select("doc_id", "source", "quality_score")


@register(
    "hot_token_heavy_hitters",
    doc="Exact frequency-threshold heavy hitters (operators.heavyhitters."
    "exact_heavy_hitters): every token holding ≥ 1/40 of all token "
    "occurrences, with exact counts. Plan: a Misra-Gries candidate pass "
    "(mapInPandas, ≤ capacity counters per task — no heavy hitter can be "
    "missed, see the operator's completeness proof) followed by a "
    "broadcast-semi-join exact count of candidates only — the full token "
    "domain NEVER shuffles, which is the point at 100 TB where distinct "
    "n-grams outnumber heavy hitters a million to one. The final integer "
    "predicate n·40 ≥ n_total makes the result bit-equal to brute force, "
    "which is exactly what the oracle computes.",
    oracle=f"""
WITH t AS (
  SELECT {_SQL_TOKENS} AS toks FROM documents
),
w AS (SELECT unnest(toks) AS item FROM t),
tot AS (SELECT COUNT(*) AS n_total FROM w)
SELECT item, COUNT(*) AS n, (SELECT n_total FROM tot) AS n_total
FROM w GROUP BY item
HAVING COUNT(*) * 40 >= (SELECT n_total FROM tot)
""",
)
def hot_token_heavy_hitters_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from milan_spark.operators.heavyhitters import exact_heavy_hitters

    docs = table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(T.tokenize("text")).alias("token"))
    return exact_heavy_hitters(toks, "token", min_share=(1, 40))


@register(
    "hot_sources_by_bytes",
    doc="Weighted heavy hitters (operators.heavyhitters, weight=n_chars): "
    "sources holding ≥ 1/20 of total corpus BYTES — the mass-share question "
    "capacity planning actually asks (which feeds dominate storage, which "
    "keys dominate shuffle bytes), answered by the same Misra-Gries-"
    "prefilter + exact-verify plan with weighted increments; the "
    "completeness proof carries over with byte mass in place of row "
    "counts. Integer-exact end to end.",
    oracle="""
WITH c AS (
  SELECT source AS item, CAST(SUM(n_chars) AS BIGINT) AS n
  FROM documents WHERE source IS NOT NULL GROUP BY source
),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total FROM c)
SELECT item, n, (SELECT n_total FROM tot) AS n_total
FROM c WHERE n * 20 >= (SELECT n_total FROM tot)
""",
)
def hot_sources_by_bytes_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from milan_spark.operators.heavyhitters import exact_heavy_hitters

    docs = table(spark, sf_dir, "documents")
    return exact_heavy_hitters(docs, "source", min_share=(1, 20), weight="n_chars")


@register(
    "unigram_lm_perplexity",
    doc="CCNet-style LM quality scoring (Wenzek LREC'20 §3.3): add-one "
    "unigram LM fit on the corpus itself, per-document cross-entropy "
    "avg_nll in nats — low = fluent head, high = gibberish tail. One "
    "fused plan: combinable (doc,token)-count → combinable term "
    "frequencies → token-keyed score join + one-row totals broadcast → "
    "per-doc combine. Float safety follows the bm25 discipline: compared "
    "after round(·, 4), so a last-ulp ln() disagreement cannot survive.",
    oracle="""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
  FROM documents
),
dtf AS (SELECT doc_id, tok, COUNT(*) AS dtf FROM toks GROUP BY 1, 2),
tf AS (SELECT tok, CAST(SUM(dtf) AS BIGINT) AS tf FROM dtf GROUP BY 1),
tot AS (
  SELECT CAST(SUM(tf) AS BIGINT) AS t_total, COUNT(*) AS v_size FROM tf
)
SELECT d.doc_id,
       CAST(SUM(d.dtf) AS BIGINT) AS n_tokens,
       ROUND(
         -SUM(d.dtf * ln((f.tf + 1.0) / CAST(tot.t_total + tot.v_size AS DOUBLE)))
         / SUM(d.dtf), 4
       ) AS avg_nll
FROM dtf d JOIN tf f USING (tok), tot
GROUP BY d.doc_id
""",
)
def unigram_lm_perplexity_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return T.unigram_lm_nll(docs, "doc_id", "text", alpha=1)


@register(
    "bigram_lm_perplexity",
    doc="Jelinek-Mercer interpolated BIGRAM LM quality scoring (Chen & "
    "Goodman CSL'99 eq. 4, fixed lambda=0.7) - the order-2 upgrade of "
    "unigram_lm_perplexity that unigram scores cannot see: word ORDER. "
    "Bigrams are built row-locally from the token array (slices + "
    "arrays_zip, no positional self-join, no corpus-wide window); counts "
    "are map-side-combinable aggregates; the score join is vocabulary-"
    "bounded on (w1,w2)/w1/w2 with the one-row total on a broadcast "
    "crossJoin. Float discipline: both engines evaluate the literal-"
    "identical interpolation left-to-right and compare after round(.,4).",
    oracle="""
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
  FROM documents
),
bg AS (
  SELECT doc_id,
         unnest(list_slice(toks, 1, len(toks) - 1)) AS w1,
         unnest(list_slice(toks, 2, len(toks))) AS w2
  FROM t WHERE len(toks) >= 2
),
dbf AS (
  SELECT doc_id, w1, w2, COUNT(*) AS dbf FROM bg GROUP BY 1, 2, 3
),
btf AS (SELECT w1, w2, CAST(SUM(dbf) AS BIGINT) AS c12 FROM dbf GROUP BY 1, 2),
c1 AS (SELECT w1, CAST(SUM(dbf) AS BIGINT) AS c1 FROM dbf GROUP BY 1),
uni AS (
  SELECT w2, COUNT(*) AS cu FROM (
    SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w2
    FROM documents
  ) GROUP BY 1
),
tot AS (SELECT CAST(SUM(cu) AS BIGINT) AS t_total FROM uni)
SELECT d.doc_id,
       CAST(SUM(d.dbf) AS BIGINT) AS n_bigrams,
       ROUND(
         -SUM(d.dbf * ln(0.7 * b.c12 / c.c1
                         + 0.3 * u.cu / CAST(tot.t_total AS DOUBLE)))
         / SUM(d.dbf), 4
       ) AS avg_nll
FROM dbf d
JOIN btf b USING (w1, w2)
JOIN c1 c USING (w1)
JOIN uni u USING (w2), tot
GROUP BY d.doc_id
""",
)
def bigram_lm_perplexity_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return T.bigram_lm_nll(docs, "doc_id", "text", lam=0.7)


@register(
    "dedup_keep_best_quality",
    doc="Quality-aware dedup survivorship (the FineWeb/Dolma policy: keep "
    "the BEST copy, not an arbitrary one): exact-duplicate groups by text "
    "hash, survivor = longest copy (n_chars), doc_id tie-break. ONE "
    "map-side-combinable max_by(struct) aggregate — no window, no sort, no "
    "second pass; payloads never shuffle beyond their group row. The "
    "lexicographic struct comparison makes the pick engine-exact.",
    oracle="""
SELECT doc_id, source, n_chars, n_dups FROM (
  SELECT doc_id, source, n_chars,
         ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY n_chars DESC, doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY md5(text)) AS n_dups
  FROM documents
) WHERE rn = 1
""",
)
def dedup_keep_best_quality_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    best = F.max_by(
        F.struct("doc_id", "source", "n_chars"),
        F.struct(F.col("n_chars"), (-F.col("doc_id")).alias("__tie")),
    )
    return (
        docs.groupBy(F.md5("text").alias("__h"))
        .agg(best.alias("__s"), F.count(F.lit(1)).alias("n_dups"))
        .select("__s.doc_id", "__s.source", "__s.n_chars", "n_dups")
    )


@register(
    "tokenizer_fertility_by_lang",
    doc="Tokenizer fertility audit per language (the multilingual-budget "
    "number: BPE-ish subword tokens per whitespace word): both token "
    "counts are JVM regexp columns, one combinable aggregate, one exact "
    "int64 division rounded once — no Python, no second scan.",
    oracle=r"""
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(len(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS BIGINT) AS n_words,
       CAST(SUM(len(regexp_extract_all(lower(text), '''(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s'']+'))) AS BIGINT) AS n_bpe_tokens,
       ROUND(CAST(SUM(len(regexp_extract_all(lower(text), '''(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s'']+'))) AS DOUBLE)
             / SUM(len(regexp_extract_all(lower(text), '[a-z0-9]+'))), 6) AS fertility
FROM documents
GROUP BY lang
""",
)
def tokenizer_fertility_by_lang_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(T.token_count("text")).alias("n_words"),
            F.sum(T.bpe_token_count("text")).alias("n_bpe_tokens"),
        )
        .select(
            "lang",
            "n_docs",
            "n_words",
            "n_bpe_tokens",
            F.round(
                F.col("n_bpe_tokens").cast("double") / F.col("n_words"), 6
            ).alias("fertility"),
        )
    )


@register(
    "ann_index_persisted",
    doc="The production ANN lifecycle (build once / query many): the IVF+"
    "residual-PQ index is BUILT, SAVED to parquet (codes = the corpus at "
    "m ints/vector; coarse/books model-sized), RELOADED, and queried from "
    "disk — the query plan touches only the persisted code table plus "
    "tiny broadcasts, never a raw corpus vector (plan-asserted in "
    "tests/test_ann_index.py). Exact-int64 throughout, so the round-trip "
    "is bit-identical to the one-shot form and shares its oracle.",
    oracle=REGISTRY["ann_ivfpq_residual"].oracle,
)
def ann_index_persisted_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os
    import tempfile

    emb = table(spark, sf_dir, "embeddings")
    index = S.build_ivfpq_residual_index(emb, "vec_id", "embedding", dim=64)
    tag = hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    path = os.path.join(tempfile.gettempdir(), f"milan_ann_idx_{tag}")
    S.save_ivfpq_residual_index(index, path)
    loaded = S.load_ivfpq_residual_index(spark, path)
    queries = emb.filter(F.col("vec_id").isin(list(range(10))))
    return S.query_ivfpq_residual_index(
        loaded, queries, "vec_id", "embedding", k=5, n_probe=4
    )


@register(
    "ngram_diversity_by_source",
    doc="Corpus diversity/repetition metrics per source (the self-BLEU-style "
    "signal data-quality dashboards track): type-token ratio over unigrams "
    "and distinct-over-total word-trigram ratio, on the shared tokenize() "
    "convention ([a-z0-9]+ lowercased). Two map-side-exploded legs — one "
    "combinable count + one exact distinct each — joined on the tiny "
    "source dimension; ratios are IEEE divisions of exact BIGINTs so both "
    "engines round the same doubles. At 100 TB the exact distinct is the "
    "only heavy exchange and is the one you'd swap for HLL "
    "(operators.sketch) when ±2% suffices — stated here so the exact "
    "form's cost is a choice, not an accident.",
    oracle="""
WITH t AS (
  SELECT source, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents
), uni AS (
  SELECT source, unnest(toks) AS tok FROM t
), tri AS (
  SELECT source, array_to_string(toks[r.i:r.i+2], ' ') AS gram
  FROM t, range(512) r(i) WHERE r.i >= 1 AND r.i <= len(toks) - 2
), ustat AS (
  SELECT source, COUNT(*) AS total_tokens, COUNT(DISTINCT tok) AS distinct_tokens
  FROM uni GROUP BY source
), tstat AS (
  SELECT source, COUNT(*) AS total_trigrams, COUNT(DISTINCT gram) AS distinct_trigrams
  FROM tri GROUP BY source
), docs AS (
  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
)
SELECT d.source, d.n_docs,
       u.total_tokens, u.distinct_tokens,
       round(CAST(u.distinct_tokens AS DOUBLE) / u.total_tokens, 6) AS ttr,
       s.total_trigrams, s.distinct_trigrams,
       round(CAST(s.distinct_trigrams AS DOUBLE) / s.total_trigrams, 6) AS trigram_diversity
FROM docs d JOIN ustat u ON d.source = u.source JOIN tstat s ON d.source = s.source
""",
)
def ngram_diversity_by_source_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    toks = docs.select("source", T.tokenize("text").alias("toks"))
    uni = toks.select("source", F.explode("toks").alias("tok")).groupBy("source").agg(
        F.count(F.lit(1)).alias("total_tokens"),
        F.countDistinct("tok").alias("distinct_tokens"),
    )
    tri = (
        docs.select("source", F.explode(T.word_ngrams("text", 3)).alias("gram"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("total_trigrams"),
            F.countDistinct("gram").alias("distinct_trigrams"),
        )
    )
    nd = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        nd.join(uni, "source")
        .join(tri, "source")
        .select(
            "source",
            "n_docs",
            "total_tokens",
            "distinct_tokens",
            F.round(
                F.col("distinct_tokens").cast("double") / F.col("total_tokens"), 6
            ).alias("ttr"),
            "total_trigrams",
            "distinct_trigrams",
            F.round(
                F.col("distinct_trigrams").cast("double") / F.col("total_trigrams"), 6
            ).alias("trigram_diversity"),
        )
    )


@register(
    "hard_negative_mining",
    doc="Contrastive-training hard negatives: per query vector, the top-5 "
    "most-similar corpus vectors with a DIFFERENT label (the negatives a "
    "triplet/InfoNCE objective learns most from). Broadcast query batch, "
    "label-mismatch predicate riding the join, exact-int64 cosine — same "
    "one-narrow-stage topology as ann_brute_force; at corpus scale the "
    "scorer swaps for the IVF candidate path with the identical filter. "
    "See operators.similarity.hard_negatives.",
    oracle=_SQL_VEC_EX
    + """
, lab AS (
  SELECT vec_id, label FROM embeddings
), pairs AS (
  SELECT qa.vec_id AS query_id, ca.vec_id AS neighbor_id, lc.label AS neg_label,
         SUM(qa.x * ca.x) AS dot
  FROM ex qa
  JOIN ex ca ON qa.i = ca.i AND qa.vec_id < 10 AND ca.vec_id != qa.vec_id
  JOIN lab lq ON lq.vec_id = qa.vec_id
  JOIN lab lc ON lc.vec_id = ca.vec_id AND lc.label <> lq.label
  GROUP BY 1, 2, 3
), scored AS (
  SELECT query_id, neighbor_id, neg_label,
         dot / (sqrt(CAST(nq.nn AS DOUBLE)) * sqrt(CAST(nc.nn AS DOUBLE))) AS cosine
  FROM pairs JOIN norms nq ON query_id = nq.vec_id JOIN norms nc ON neighbor_id = nc.vec_id
)
SELECT query_id, neighbor_id, neg_label, rank, round(cosine, 6) AS cosine
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
)
WHERE rank <= 5
""",
)
def hard_negative_mining_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    return S.hard_negatives(
        emb, "vec_id", "embedding", "label", query_ids=range(10), k=5
    )


@register(
    "readability_flesch_gate",
    doc="Flesch reading-ease per document (a standard text-quality gate "
    "alongside the Gopher rules): sentences = terminator runs [.!?]+, "
    "words = the shared tokenize() convention, syllables = vowel-group "
    "runs [aeiouy]+ on the lowercased text (contiguity never crosses a "
    "word boundary, so whole-text matching equals the per-word sum). The "
    "score is one IEEE expression over three exact BIGINT counts — "
    "deterministic on both engines; zero-sentence/zero-word docs guard "
    "through greatest(1, n). Pure JVM regexp columns, embarrassingly "
    "parallel — the 100 TB plan is the scan itself.",
    oracle="""
WITH c AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT) AS n_sentences,
         CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS n_words,
         CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS n_syllables
  FROM documents
)
SELECT doc_id, n_sentences, n_words, n_syllables,
       round(206.835
             - 1.015 * (CAST(n_words AS DOUBLE) / GREATEST(n_sentences, 1))
             - 84.6 * (CAST(n_syllables AS DOUBLE) / GREATEST(n_words, 1)), 4) AS flesch
FROM c
""",
)
def readability_flesch_gate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    low = F.lower(F.col("text"))
    c = docs.select(
        "doc_id",
        F.array_size(F.regexp_extract_all(F.col("text"), F.lit("[.!?]+"), F.lit(0)))
        .cast("long")
        .alias("n_sentences"),
        F.array_size(T.tokenize("text")).cast("long").alias("n_words"),
        F.array_size(F.regexp_extract_all(low, F.lit("[aeiouy]+"), F.lit(0)))
        .cast("long")
        .alias("n_syllables"),
    )
    flesch = (
        F.lit(206.835)
        - F.lit(1.015)
        * (F.col("n_words").cast("double") / F.greatest(F.col("n_sentences"), F.lit(1)))
        - F.lit(84.6)
        * (F.col("n_syllables").cast("double") / F.greatest(F.col("n_words"), F.lit(1)))
    )
    return c.select(
        "doc_id", "n_sentences", "n_words", "n_syllables",
        F.round(flesch, 4).alias("flesch"),
    )
