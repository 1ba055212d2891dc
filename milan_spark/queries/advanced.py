"""Coverage queries for the remaining SURVEY §2 operator surface: grouped
flat-map, whole-window apply, the ApplyFunction UDF escape hatch, CSV
source/sink round-trip, and cycle-based connected components (dedup
clusters) — each with an exact DuckDB oracle.
"""

from __future__ import annotations

import tempfile

import pandas as pd  # module-level so pandas_udf annotations resolve under PEP 563

from pyspark.sql import DataFrame, SparkSession, functions as F

from milan_spark.catalog import REGISTRY, register
from milan_spark.operators.graph import connected_components
from milan_spark.queries.llm_pipeline import _SQL_SHINGLES
from milan_spark.sources import file_source, table
from milan_spark.stream import Stream


@register(
    "grouped_flat_map",
    doc="Milan GroupedStream FlatMap (StreamExpressions.scala:327, doc/Milan "
    "Operations.md:79-97): per-user transform of the group's sub-stream "
    "(arrival index per user), groups merged back into one stream. Declared "
    "as the rank-shaped grouped_rank node and lowered by the optimizer "
    "(plans.rewrite.rule_grouped_rank_to_window — SURVEY §4's optional rule, "
    "second half) to a row_number() window: JVM window exec, no Python "
    "grouped-map in the physical plan.",
    oracle="""
SELECT user_id, event_id,
       ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) AS idx
FROM events
""",
)
def grouped_flat_map_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from milan_spark.plans.nodes import compile_node, from_json, to_json
    from milan_spark.plans.rewrite import optimize

    s = Stream.from_file(spark, f"{sf_dir}/events.parquet").map("user_id", "event_id")
    ranked = s.group_by("user_id").ranked("event_id", alias="idx")
    # portability: the logical plan survives serialization, then the
    # optimizer replaces the applyInPandas fold with the window projection
    plan = from_json(to_json(ranked.node))
    return compile_node(optimize(plan, spark), spark)


@register(
    "tumbling_window_apply",
    doc="Milan WindowApply (StreamExpressions.scala:383, "
    "RecordWindowGenerator.scala:19): whole-window UDF over daily tumbling "
    "windows — distinct users and value span per window.",
    oracle="""
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
       COUNT(DISTINCT user_id) AS n_users,
       MAX(value) - MIN(value) AS value_span
FROM events GROUP BY 1
""",
)
def tumbling_window_apply_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")

    def window_stats(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "window_start": [pdf["window_start"].iloc[0]],
                "n_users": [pdf["user_id"].nunique()],
                "value_span": [pdf["value"].max() - pdf["value"].min()],
            }
        )

    return (
        Stream.from_dataframe(ev)
        .tumbling_window("ts", "1 day")
        .apply(window_stats, "window_start timestamp, n_users long, value_span double")
        .to_df()
    )


@register(
    "udf_escape_hatch",
    doc="Milan ApplyFunction (Expression.scala:407, "
    "ConvertExpressionHost.scala:253-269) — the arbitrary-user-function "
    "escape hatch, realized as an Arrow-vectorized pandas UDF rather than "
    "the reference's row-at-a-time reflective call.",
    oracle="""
SELECT event_id, value, CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
FROM events
""",
)
def udf_escape_hatch_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("event_id", "value")

    def to_cents(v: pd.Series) -> pd.Series:
        import numpy as np

        return pd.Series(np.floor(v * 100 + 0.5).astype("int64"))

    return (
        Stream.from_dataframe(ev)
        .apply_function(to_cents, "long", "value", alias="cents")
        .to_df()
    )


@register(
    "csv_roundtrip",
    doc="CsvDataOutputFormat → CsvDataInputFormat round-trip "
    "(dataformats/CsvDataOutputFormat.scala:1, CsvDataInputFormat.scala:42-48): "
    "write events as CSV, read back with an explicit schema, aggregate. "
    "Doubles survive because Spark writes shortest round-trip decimal forms.",
    oracle="""
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
FROM events GROUP BY 1
""",
)
def csv_roundtrip_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    out = tempfile.mkdtemp(prefix="milan_csv_")
    Stream.from_dataframe(ev).write_file(out, fmt="csv", header="true")
    back = file_source(
        spark,
        out,
        fmt="csv",
        schema="event_id long, event_type string, value double",
        options={"header": "true"},
    )
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")).alias("cents"),
    )


@register(
    "dedup_clusters",
    doc="Milan Cycle (StreamExpressions.scala:141, lang/Stream.scala:143-147) "
    "driving min-label propagation to a fixpoint: exact near-duplicate pairs "
    "(corpus-adaptive n-gram Jaccard generator) collapsed into dedup "
    "clusters — cluster_id = smallest doc_id in the connected component.",
    oracle=_SQL_SHINGLES.replace("WITH toks", "WITH RECURSIVE toks", 1)
    + """
, ex AS (
  SELECT doc_id, unnest(shingles) AS s FROM sh
), jpairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), sizes AS (SELECT doc_id, len(shingles) AS n FROM sh
), edges0 AS (
  SELECT id_a, id_b
  FROM jpairs JOIN sizes sa ON id_a = sa.doc_id JOIN sizes sb ON id_b = sb.doc_id
  WHERE shared * 1.0 / (sa.n + sb.n - shared) >= 0.8
), edges AS (
  SELECT id_a AS u, id_b AS v FROM edges0
  UNION
  SELECT id_b, id_a FROM edges0
), reach AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
)
SELECT u AS doc_id, LEAST(u, MIN(v)) AS cluster_id FROM reach GROUP BY u
""",
)
def dedup_clusters_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from milan_spark.operators.dedup import ngram_jaccard_pairs

    docs = table(spark, sf_dir, "documents")
    # the corpus-adaptive exact generator (identical output to the verified
    # MinHash-LSH path, which the oracle also equals) — on template-heavy
    # corpora its dense block matmul avoids materializing the huge candidate
    # set an LSH banding would flood the pair join with
    pairs = ngram_jaccard_pairs(docs, "doc_id", "text", n=2, threshold=0.8)
    cc = connected_components(pairs, "id_a", "id_b")
    return cc.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))


@register(
    "dedup_clusters_star",
    doc="The SAME dedup clustering computed by the alternating large-star/"
    "small-star algorithm (Kiveris et al. SoCC'14; operators.graph."
    "connected_components_star) instead of min-label propagation: O(log n) "
    "rounds regardless of graph DIAMETER, vs min-label's O(diameter). "
    "Measured head-to-head (SCALE.md round 8): star wins even on the "
    "catalog's dense shallow dedup graph (14.6 vs 22.1 s warm at 10x) and "
    "6x on a 128-hop chain - the contracting edge set beats re-joining "
    "full label frames. Identical output contract, identical oracle: two "
    "physical algorithms, one function.",
    oracle=REGISTRY["dedup_clusters"].oracle,
)
def dedup_clusters_star_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from milan_spark.operators.dedup import ngram_jaccard_pairs
    from milan_spark.operators.graph import connected_components_star

    docs = table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, "doc_id", "text", n=2, threshold=0.8)
    cc = connected_components_star(pairs, "id_a", "id_b")
    return cc.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))


@register(
    "set_intersect_except",
    doc="Set operators (SURVEY §2.7, exceeds-parity): users who purchased AND "
    "erred, minus users who signed up — intersect/except over key streams.",
    oracle="""
SELECT user_id FROM (
  SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 200
  INTERSECT
  SELECT user_id FROM events WHERE event_type = 'error' AND value > 200
)
EXCEPT
SELECT user_id FROM events WHERE event_type = 'signup' AND value > 300
""",
)
def set_intersect_except_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")

    def side(t, min_value):
        return Stream.from_dataframe(
            ev.filter((F.col("event_type") == t) & (F.col("value") > min_value)).select("user_id")
        )

    return side("purchase", 200).intersect(side("error", 200)).except_(side("signup", 300)).to_df()


@register(
    "rollup_revenue",
    doc="Rollup subtotals (SURVEY §2.4, exceeds-parity): order counts and "
    "exact revenue by (status, priority), with subtotals and a grand total.",
    oracle="""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
""",
)
def rollup_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return (
        Stream.from_dataframe(orders)
        .rollup(
            "o_orderstatus",
            "o_orderpriority",
            n=F.count(F.lit(1)),
            revenue=F.round(F.sum(F.col("o_totalprice").cast("decimal(18,6)")), 2).cast("double"),
        )
        .to_df()
    )


@register(
    "json_roundtrip",
    doc="JsonDataOutputFormat → JsonDataInputFormat round-trip "
    "(dataformats/JsonDataOutputFormat.scala:1, JsonDataInputFormat.scala:21): "
    "write events as JSON lines, read back with an explicit schema, aggregate.",
    oracle="""
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
FROM events GROUP BY 1
""",
)
def json_roundtrip_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    out = tempfile.mkdtemp(prefix="milan_json_")
    Stream.from_dataframe(ev).write_file(out, fmt="json")
    back = file_source(
        spark, out, fmt="json", schema="event_id long, event_type string, value double"
    )
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")).alias("cents"),
    )


@register(
    "cube_revenue",
    doc="Cube subtotals (SURVEY §2.4, exceeds-parity): all grouping-set "
    "combinations of (status, priority) with counts and exact revenue.",
    oracle="""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
)
def cube_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return (
        Stream.from_dataframe(orders)
        .cube(
            "o_orderstatus",
            "o_orderpriority",
            n=F.count(F.lit(1)),
            revenue=F.round(F.sum(F.col("o_totalprice").cast("decimal(18,6)")), 2).cast("double"),
        )
        .to_df()
    )


@register(
    "range_join_tiers",
    doc="Interval-containment join via bucketized equi-join (operators."
    "joins.range_join): events land in value tiers [lo, hi), overlapping "
    "tiers emit twice; ranges explode into width-50 buckets so Catalyst "
    "plans a hash join + exact filter, never BroadcastNestedLoopJoin.",
    oracle="""
SELECT tier, COUNT(*) AS n_events,
       CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
FROM events
JOIN (VALUES ('low', 0.0, 50.0), ('mid', 50.0, 200.0),
             ('high', 200.0, 500.0), ('vip', 400.0, 500.0)) tiers(tier, lo, hi)
  ON value >= lo AND value < hi
GROUP BY tier
""",
)
def range_join_tiers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from milan_spark.operators.joins import range_join

    ev = table(spark, sf_dir, "events").select("event_id", "value")
    tiers = spark.createDataFrame(
        [("low", 0.0, 50.0), ("mid", 50.0, 200.0), ("high", 200.0, 500.0), ("vip", 400.0, 500.0)],
        "tier string, lo double, hi double",
    )
    joined = range_join(ev, tiers, "value", "lo", "hi", bucket_width=50.0)
    return joined.groupBy("tier").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")).alias("cents"),
    )


_SQL_KMV_HASH = (
    "(list_reduce(list_transform(regexp_extract_all(CAST({s} AS VARCHAR), '.'),"
    " c -> CAST(ascii(c) AS BIGINT)), (a, c) -> (a * 31 + c) % 2147483647)"
    " * 2654435761) % 2147483647 + 1"
)


@register(
    "kmv_distinct_users",
    doc="KMV distinct-count sketch (operators.sketch.kmv_distinct, k=64): "
    "k-th smallest scrambled hash per event_type estimates distinct users as "
    "(k-1)*P/m_k — deterministic set function, so the oracle replicates it "
    "bit-for-bit (unlike HLL's implementation-defined registers).",
    oracle=f"""
WITH hashed AS (
  SELECT DISTINCT event_type, {_SQL_KMV_HASH.format(s='user_id')} AS h
  FROM events WHERE user_id IS NOT NULL
), ranked AS (
  SELECT event_type, h, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rk
  FROM hashed
), agg AS (
  SELECT event_type, COUNT(*) AS n_hashes, MAX(h) AS kth_min_hash
  FROM ranked WHERE rk <= 64 GROUP BY event_type
)
SELECT event_type, n_hashes, kth_min_hash,
       round(CASE WHEN n_hashes < 64 THEN CAST(n_hashes AS DOUBLE)
                  ELSE 63.0 * 2147483647.0 / kth_min_hash END, 4) AS distinct_est
FROM agg
""",
)
def kmv_distinct_users_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from milan_spark.operators.sketch import kmv_distinct

    ev = table(spark, sf_dir, "events")
    return kmv_distinct(ev, "user_id", k=64, keys=["event_type"])


# the CMS row-hash input: the KMV scrambled char-fold without the +1 shift
_SQL_CMS_FOLD = (
    "(list_reduce(list_transform(regexp_extract_all(CAST({s} AS VARCHAR), '.'),"
    " c -> CAST(ascii(c) AS BIGINT)), (a, c) -> (a * 31 + c) % 2147483647)"
    " * 2654435761) % 2147483647"
)


@register(
    "cms_token_counts",
    doc="Count-min sketch point queries (operators.sketch.cms_build/"
    "cms_estimate, depth 4 x width 16 — width deliberately BELOW the "
    "vocabulary so collisions exercise the min-over-rows recovery): the "
    "whole corpus folds into <= 64 counter cells via a map-side-combinable aggregate (the token "
    "domain never shuffles — the point-query sibling of the Misra-Gries "
    "top-k contract), then every distinct token is estimated as the min "
    "over its 4 cells. Deterministic affine row hashes over the scrambled "
    "char-fold make the sketch a pure function of the multiset, so the "
    "oracle replicates the construction cell-for-cell; est >= n_true by "
    "construction, within eps*N at width = ceil(e/eps).",
    oracle=f"""
WITH t AS (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token FROM documents
),
tc AS (SELECT token, COUNT(*) AS n_true FROM t GROUP BY token),
f AS (SELECT token, n_true, {_SQL_CMS_FOLD.format(s='token')} AS s FROM tc),
sk AS (
  SELECT r.i AS r, ((2 * r.i + 1) * s + r.i * r.i + 17) % 2147483647 % 16 AS i,
         SUM(n_true) AS c
  FROM f, range(4) r(i) GROUP BY 1, 2
),
probe AS (
  SELECT f.token, f.n_true, r.i AS r,
         ((2 * r.i + 1) * f.s + r.i * r.i + 17) % 2147483647 % 16 AS i
  FROM f, range(4) r(i)
)
SELECT p.token, p.n_true, CAST(MIN(sk.c) AS BIGINT) AS est
FROM probe p JOIN sk ON sk.r = p.r AND sk.i = p.i
GROUP BY 1, 2
""",
)
def cms_token_counts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from milan_spark.operators.sketch import cms_build, cms_estimate
    from milan_spark.operators.text import tokenize

    docs = table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokenize("text")).alias("token"))
    sk = cms_build(toks, "token", depth=4, width=16)
    truth = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n_true"))
    est = cms_estimate(sk, truth.select("token"), "token", depth=4, width=16)
    return truth.join(est, "token").select("token", "n_true", "est")


@register(
    "hypertable_rollup",
    doc="Hypertable-style time-hierarchy rollup: one pass over events "
    "produces day-level, (day, hour)-level, and grand-total aggregates via "
    "ROLLUP on truncated time columns — partial aggregation covers all "
    "levels in a single shuffle.",
    oracle="""
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
       COUNT(*) AS n,
       CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
FROM events GROUP BY ROLLUP (day, hour)
""",
)
def hypertable_rollup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        F.date_trunc("day", "ts").alias("day"),
        F.date_trunc("hour", "ts").alias("hour"),
        "value",
    )
    return (
        Stream.from_dataframe(ev)
        .rollup(
            "day",
            "hour",
            n=F.count(F.lit(1)),
            cents=F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")),
        )
        .to_df()
    )


@register(
    "bpe_pretoken_count",
    doc="BPE-style pretokenizer counts: split text the way byte-pair "
    "tokenizers pre-segment it (letter runs | digit runs | single "
    "non-alnum-non-space) and count segments and unique segments per doc - "
    "the token-budget estimator for corpus curation.",
    oracle="""
SELECT doc_id,
       len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS n_pretokens,
       len(list_distinct(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]'))) AS n_unique,
       len(regexp_extract_all(lower(text), '[0-9]+')) AS n_number_runs
FROM documents
""",
)
def bpe_pretoken_count_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.lower("text"), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0)
    return docs.select(
        "doc_id",
        F.array_size(toks).alias("n_pretokens"),
        F.array_size(F.array_distinct(toks)).alias("n_unique"),
        F.array_size(F.regexp_extract_all(F.lower("text"), F.lit(r"[0-9]+"), 0)).alias("n_number_runs"),
    )


@register(
    "fuzzy_dedup_pipeline",
    doc="Flagship composite #2 — fuzzy dedup end-to-end: exact n-gram "
    "Jaccard pair generation (corpus-adaptive), Cycle-driven connected "
    "components, survivor selection (min doc_id per cluster), per-source "
    "audit. The oracle re-derives the whole pipeline in SQL, clusters via a "
    "recursive CTE.",
    oracle=_SQL_SHINGLES.replace("WITH toks", "WITH RECURSIVE toks", 1)
    + """
, ex AS (
  SELECT doc_id, unnest(shingles) AS s FROM sh
), jpairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), sizes AS (SELECT doc_id, len(shingles) AS n FROM sh
), edges0 AS (
  SELECT id_a, id_b
  FROM jpairs JOIN sizes sa ON id_a = sa.doc_id JOIN sizes sb ON id_b = sb.doc_id
  WHERE shared * 1.0 / (sa.n + sb.n - shared) >= 0.8
), edges AS (
  SELECT id_a AS u, id_b AS v FROM edges0
  UNION
  SELECT id_b, id_a FROM edges0
), reach AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
), dupes AS (
  SELECT u AS doc_id FROM reach GROUP BY u HAVING LEAST(u, MIN(v)) < u
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN d.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN d.doc_id IS NULL THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars
FROM documents LEFT JOIN dupes d USING (doc_id)
GROUP BY source
""",
)
def fuzzy_dedup_pipeline_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from milan_spark.operators.dedup import ngram_jaccard_pairs

    docs = table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, "doc_id", "text", n=2, threshold=0.8)
    cc = connected_components(pairs, "id_a", "id_b")
    # docs to drop: cluster members that are not their cluster's min id;
    # the anti-join keeps singletons (never in any pair) for free
    dupes = cc.filter(F.col("node") != F.col("label")).select(F.col("node").alias("doc_id"))
    flagged = docs.join(dupes.withColumn("__dup", F.lit(1)), "doc_id", "left")
    return flagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("__dup").isNull(), 1).otherwise(0)).alias("n_kept"),
        F.sum(F.when(F.col("__dup").isNull(), F.col("n_chars")).otherwise(0)).alias("kept_chars"),
    )


@register(
    "kmv_union_distinct_users",
    doc="KMV sketch MERGE (operators.sketch.kmv_sketch/kmv_merge, k=64): "
    "distinct click-or-view users estimated by merging the two per-type "
    "sketches — never re-scanning the raw union. KMV merge is exact "
    "(the k smallest hashes of a union are a subset of the union of each "
    "side's k smallest), so the oracle computes the estimate FROM THE RAW "
    "UNION and the hash match proves merge(sketch(A), sketch(B)) == "
    "sketch(A ∪ B) bit-for-bit. This is the algebra that lets per-partition "
    "/ per-day sketches roll up without touching data again at 100 TB.",
    oracle=f"""
WITH hashed AS (
  SELECT DISTINCT {_SQL_KMV_HASH.format(s='user_id')} AS h
  FROM events WHERE user_id IS NOT NULL AND event_type IN ('click', 'view')
), ranked AS (
  SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rk FROM hashed
), agg AS (
  SELECT COUNT(*) AS n_hashes, MAX(h) AS kth_min_hash FROM ranked WHERE rk <= 64
)
SELECT n_hashes, kth_min_hash,
       round(CASE WHEN n_hashes < 64 THEN CAST(n_hashes AS DOUBLE)
                  ELSE 63.0 * 2147483647.0 / kth_min_hash END, 4) AS distinct_est
FROM agg
""",
)
def kmv_union_distinct_users_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from milan_spark.operators.sketch import kmv_merge, kmv_sketch

    ev = table(spark, sf_dir, "events").filter(F.col("event_type").isin("click", "view"))
    per_type = kmv_sketch(ev, "user_id", k=64, keys=["event_type"])
    return kmv_merge(per_type.drop("event_type"), k=64)


# numeric-key bloom hash: one scrambled modular multiply per hash function
# (matches operators.sketch._bloom_idx numeric=True; scramblers 2654435761 /
# 2246822519 for base 31 / 131)
_SQL_BLOOM_IDX = (
    "((((CAST({s} AS BIGINT) % 2147483647) + 2147483647) % 2147483647"
    " * {scramble}) % 2147483647) % 65536"
)
_BLOOM_SCRAMBLE = {31: 2654435761, 131: 2246822519}


@register(
    "bloom_prefilter_join",
    doc="Distributed Bloom-filter semi-join prefilter (operators.sketch."
    "bloom_build/bloom_member): a 64-Kbit two-hash Bloom bitmap aggregated "
    "over the filtered build side (map-side-combinable bit_or — at most "
    "m/32 rows cross the exchange however large the build input), "
    "broadcast as ONE map row, probed fact-side with pure int64 bit "
    "algebra (integral keys hash by one scrambled modular multiply — "
    "whole-stage codegen, no per-character fold on the hot path). "
    "The audit compares bloom passes against the exact semi-join: "
    "n_false_pos quantifies the (deterministic, portable-hash) FP rate. "
    "At 100 TB this is the shuffle-avoidance primitive for selective "
    "joins: ship 8 KB instead of re-partitioning the fact table; rows "
    "failing the bloom never enter the join exchange. Engine-native bloom "
    "joins (Spark's runtime filters) do this opaquely; this one is an "
    "explicit, engine-independent set function — bit-for-bit identical in "
    "ANSI SQL.",
    oracle=f"""
WITH sel AS (SELECT c_custkey FROM customer WHERE c_acctbal > 4000),
idx AS (
  SELECT unnest([{_SQL_BLOOM_IDX.format(s='c_custkey', scramble=_BLOOM_SCRAMBLE[31])},
                 {_SQL_BLOOM_IDX.format(s='c_custkey', scramble=_BLOOM_SCRAMBLE[131])}]) AS i
  FROM sel
),
words AS (
  SELECT i // 32 AS w, bit_or(1::BIGINT << CAST(i % 32 AS INT)) AS bw
  FROM idx GROUP BY i // 32
),
probe AS (
  SELECT o_orderkey, o_custkey,
         {_SQL_BLOOM_IDX.format(s='o_custkey', scramble=_BLOOM_SCRAMBLE[31])} AS i1,
         {_SQL_BLOOM_IDX.format(s='o_custkey', scramble=_BLOOM_SCRAMBLE[131])} AS i2
  FROM orders
),
checked AS (
  SELECT p.o_orderkey, p.o_custkey,
         ((coalesce(w1.bw, 0) & (1::BIGINT << CAST(p.i1 % 32 AS INT))) <> 0
          AND (coalesce(w2.bw, 0) & (1::BIGINT << CAST(p.i2 % 32 AS INT))) <> 0) AS pass,
         p.o_custkey IN (SELECT c_custkey FROM sel) AS exact
  FROM probe p
  LEFT JOIN words w1 ON w1.w = p.i1 // 32
  LEFT JOIN words w2 ON w2.w = p.i2 // 32
)
SELECT COUNT(*) AS n_probe,
       CAST(SUM(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_bloom,
       CAST(SUM(CASE WHEN exact THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
       CAST(SUM(CASE WHEN pass AND NOT exact THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos
FROM checked
""",
)
def bloom_prefilter_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from milan_spark.operators.sketch import bloom_build, bloom_member

    cust = table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 4000)
    bloom = bloom_build(cust, "c_custkey", m_bits=65536)
    orders = table(spark, sf_dir, "orders")
    exact_keys = cust.select("c_custkey").distinct()
    checked = (
        orders.crossJoin(F.broadcast(bloom))
        .withColumn("__pass", bloom_member("o_custkey", F.col("bloom"), m_bits=65536, numeric=True))
        .join(F.broadcast(exact_keys), F.col("o_custkey") == F.col("c_custkey"), "left")
        .withColumn("__exact", F.col("c_custkey").isNotNull())
    )
    one = F.lit(1)
    zero = F.lit(0)
    return checked.agg(
        F.count(one).alias("n_probe"),
        F.sum(F.when(F.col("__pass"), one).otherwise(zero)).alias("n_pass_bloom"),
        F.sum(F.when(F.col("__exact"), one).otherwise(zero)).alias("n_exact"),
        F.sum(F.when(F.col("__pass") & ~F.col("__exact"), one).otherwise(zero)).alias(
            "n_false_pos"
        ),
    )


@register(
    "orc_roundtrip",
    doc="ORC write → read round-trip: the second columnar format next to "
    "parquet (reference analog: the pluggable DataOutputFormat/"
    "DataInputFormat pair, dataformats/CsvDataOutputFormat.scala:1 — Milan "
    "has no columnar format at all). Timestamps, longs, and doubles "
    "survive ORC's type system exactly; the aggregate proves value "
    "fidelity against the original table.",
    oracle="""
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents,
       MIN(ts) AS first_ts, MAX(ts) AS last_ts
FROM events GROUP BY 1
""",
)
def orc_roundtrip_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("event_id", "event_type", "value", "ts")
    out = tempfile.mkdtemp(prefix="milan_orc_")
    Stream.from_dataframe(ev).write_file(out, fmt="orc")
    back = file_source(spark, out, fmt="orc")
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")).alias("cents"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )


@register(
    "partitioned_write_prune",
    doc="Partitioned FileDataSink + partition-pruned read-back (the "
    "reference's FileDataSink has no partitioning; Spark's hive-style "
    "layout is the 100 TB table organization): events write partitioned by "
    "event_type, the read-back filters one partition value — the scan's "
    "PartitionFilters prune every other directory BEFORE any I/O (asserted "
    "in tests/test_plan_shapes.py), so the query reads 1/5 of the bytes. "
    "The aggregate proves the round-trip preserved values exactly.",
    oracle="""
SELECT user_id, COUNT(*) AS n,
       CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
FROM events
WHERE event_type = 'purchase'
GROUP BY user_id
""",
)
def partitioned_write_prune_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("event_id", "event_type", "user_id", "value")
    out = tempfile.mkdtemp(prefix="milan_part_")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(out)
    back = spark.read.parquet(out).filter(F.col("event_type") == "purchase")
    return back.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")).alias("cents"),
    )


@register(
    "merge_upsert",
    doc="MERGE/upsert (warehouse staple, no reference analog): a base "
    "snapshot (first half of customers) merged with an updates batch "
    "(every third customer with a shifted balance + brand-new keys offset "
    "past the key space). Semantics: update matched, insert unmatched, "
    "keep the rest — one full-outer join on the key, COALESCE picking the "
    "update side. At 100 TB both sides hash-partition once on the merge "
    "key (or the base stays put under bucketed layout — "
    "operators.bucketing — and only the small updates batch shuffles).",
    oracle="""
WITH base AS (
  SELECT c_custkey, c_name, CAST(c_acctbal AS DECIMAL(18,6)) AS bal
  FROM customer WHERE c_custkey % 2 = 0
),
updates AS (
  SELECT c_custkey, c_name, CAST(c_acctbal AS DECIMAL(18,6)) + 100 AS bal
  FROM customer WHERE c_custkey % 3 = 0
  UNION ALL
  SELECT c_custkey + 1000000, c_name, CAST(0 AS DECIMAL(18,6))
  FROM customer WHERE c_custkey % 7 = 0
)
SELECT COALESCE(u.c_custkey, b.c_custkey) AS c_custkey,
       COALESCE(u.c_name, b.c_name) AS c_name,
       CAST(COALESCE(u.bal, b.bal) AS DOUBLE) AS bal
FROM base b FULL OUTER JOIN updates u ON b.c_custkey = u.c_custkey
""",
)
def merge_upsert_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    bal = F.col("c_acctbal").cast("decimal(18,6)")
    base = cust.filter(F.col("c_custkey") % 2 == 0).select(
        "c_custkey", "c_name", bal.alias("bal")
    )
    updates = (
        cust.filter(F.col("c_custkey") % 3 == 0)
        .select("c_custkey", "c_name", (bal + 100).alias("bal"))
        .unionByName(
            cust.filter(F.col("c_custkey") % 7 == 0).select(
                (F.col("c_custkey") + 1_000_000).alias("c_custkey"),
                "c_name",
                F.lit(0).cast("decimal(18,6)").alias("bal"),
            )
        )
    )
    b, u = base.alias("b"), updates.alias("u")
    return b.join(u, F.col("b.c_custkey") == F.col("u.c_custkey"), "full_outer").select(
        F.coalesce(F.col("u.c_custkey"), F.col("b.c_custkey")).alias("c_custkey"),
        F.coalesce(F.col("u.c_name"), F.col("b.c_name")).alias("c_name"),
        F.coalesce(F.col("u.bal"), F.col("b.bal")).cast("double").alias("bal"),
    )


@register(
    "scd2_intervals",
    doc="SCD-2 validity intervals (warehouse staple, no reference analog): "
    "each user's event history becomes (value, valid_from, valid_to) rows "
    "— valid_to = next event's timestamp via LEAD, NULL on the open "
    "current row; is_current flags it. One shuffle on the entity key, one "
    "sort per partition — the standard change-history materialization "
    "that scales with history per entity, never globally sorted.",
    oracle="""
SELECT user_id, event_id, value AS attr_value,
       ts AS valid_from,
       lead(ts) OVER w AS valid_to,
       (lead(ts) OVER w IS NULL) AS is_current
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
)
def scd2_intervals_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return ev.select(
        "user_id",
        "event_id",
        F.col("value").alias("attr_value"),
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


@register(
    "salted_distinct_users",
    doc="Skew-proof exact distinct (operators.skew.salted_aggregate): "
    "distinct users per event_type — 5 hot keys that would each serialize "
    "onto one task under a plain groupBy-distinct. Salting ON THE DISTINCT "
    "COLUMN (salt = hash(user_id) % 16) makes the holistic aggregate "
    "additive: each user lands in exactly one (key, salt) shard, so "
    "phase 1's per-shard COUNT(DISTINCT) values simply SUM in phase 2 — "
    "exact, and the hot key now occupies 16 parallel tasks. The same "
    "trick carries any per-entity holistic aggregate at 100 TB. Oracle: "
    "the plain COUNT(DISTINCT).",
    oracle="""
SELECT event_type, COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type
""",
)
def salted_distinct_users_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from milan_spark.operators.skew import salted_aggregate

    ev = table(spark, sf_dir, "events").select("event_type", "user_id")
    return salted_aggregate(
        ev,
        ["event_type"],
        {
            "n_events": F.count(F.lit(1)),
            "n_users": F.count_distinct(F.col("user_id")),
        },
        salt=16,
        salt_from=F.xxhash64("user_id"),
    ).select("event_type", "n_events", "n_users")


@register(
    "zorder_layout_prune",
    doc="Z-order (Morton) clustered layout (operators.layout): lineitem "
    "written with (l_partkey, l_suppkey) bit-interleaved — one range "
    "exchange + per-partition sort, static int64 bit algebra, no UDF — "
    "then read back through a 2-d box predicate. Because every row group "
    "covers a small axis-aligned box in key space, the scan's ordinary "
    "min/max row-group statistics prune boxes on EITHER key; "
    "tests/test_layout.py measures the pruning directly from the parquet "
    "footers (row groups overlapping the box: z-ordered ≪ natural order). "
    "At 100 TB this is the table organization for fact tables queried by "
    "two-key boxes. The aggregate proves the round-trip + predicate "
    "semantics exact.",
    oracle="""
SELECT COUNT(*) AS n_rows,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_partkey BETWEEN 100 AND 300 AND l_suppkey BETWEEN 10 AND 30
""",
)
def zorder_layout_prune_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from milan_spark.operators.layout import write_zordered

    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_extendedprice")
    out = tempfile.mkdtemp(prefix="milan_zorder_") + "/t"
    write_zordered(li, out, "l_partkey", "l_suppkey")
    back = spark.read.parquet(out).filter(
        F.col("l_partkey").between(100, 300) & F.col("l_suppkey").between(10, 30)
    )
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,6)")), 2)
        .cast("double")
        .alias("revenue"),
    )


def _pagerank_oracle(
    iterations: int = 5,
    num: int = 85,
    den: int = 100,
    scale: int = 1_000_000,
    seeds: tuple[int, ...] | None = None,
) -> str:
    """Unrolled fixed-iteration PageRank as chained CTEs — the recursion-free
    mirror of operators.graph.pagerank_scaled, constant-for-constant (base
    and damping are formatted from the SAME Python integers the operator
    uses, so the two sides cannot drift). ``seeds`` mirrors the operator's
    personalized variant: restart mass and initial rank land on seed nodes
    only."""
    base = (scale * (den - num)) // den
    if seeds is not None:
        in_list = ", ".join(str(int(s)) for s in sorted(seeds))
        init = f"CASE WHEN node IN ({in_list}) THEN CAST({scale} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
        base_sql = f"CASE WHEN n.node IN ({in_list}) THEN {base} ELSE 0 END"
    else:
        init = f"CAST({scale} AS BIGINT)"
        base_sql = str(base)
    ctes = [f"r0 AS (SELECT node, {init} AS rank FROM nodes)"]
    for k in range(1, iterations + 1):
        ctes.append(
            f"""r{k} AS (
  SELECT n.node, CAST({base_sql} + ({num} * COALESCE(m.s, 0)) // {den} AS BIGINT) AS rank
  FROM nodes n LEFT JOIN (
    SELECT e.v AS node, SUM(r.rank // d.outdeg) AS s
    FROM e JOIN r{k - 1} r ON r.node = e.u JOIN outdeg d ON d.node = e.u
    GROUP BY e.v
  ) m ON m.node = n.node
)"""
        )
    return f"""
WITH e AS (
  SELECT DISTINCT l.l_suppkey AS u, o.o_custkey AS v
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
nodes AS (SELECT u AS node FROM e UNION SELECT v FROM e),
outdeg AS (SELECT u AS node, COUNT(*) AS outdeg FROM e GROUP BY u),
{', '.join(ctes)}
SELECT node, rank FROM r{iterations}
"""


@register(
    "pagerank_supplier_customer",
    doc="Fixed-iteration PageRank over the supplier→customer fulfillment "
    "graph (distinct (l_suppkey, o_custkey) edges), in scaled int64 "
    "arithmetic — sums and floor divisions only, so the result is "
    "bit-identical regardless of partitioning or engine, which is what "
    "makes an iterative NUMERIC algorithm oracle-checkable at all (float "
    "PageRank cannot hash-match across engines). Five rounds of two "
    "equi-joins + one combinable sum over a persisted edge list, lineage "
    "truncated per round — the k-passes-over-edges shape that holds at "
    "any scale. See operators.graph.pagerank_scaled.",
    oracle=_pagerank_oracle(),
)
def pagerank_supplier_customer_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from milan_spark.operators.graph import pagerank_scaled

    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    edges = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        F.col("l_suppkey").alias("src"), F.col("o_custkey").alias("dst")
    )
    # the node universe here is the supplier+customer entity set — KBs at any
    # edge scale — so the broadcast plan (edges never shuffle) is the right one
    return pagerank_scaled(edges, "src", "dst", iterations=5, broadcast_ranks=True)


@register(
    "scd2_temporal_join",
    doc="SCD-2 temporal dimension join (warehouse staple): each purchase "
    "fact joins the dimension VERSION valid at its event time — interval "
    "containment against a time-partitioned version table IS the as-of "
    "(backward) join, so the plan is operators.joins.asof_join's one "
    "shuffle + one sort per key over the tagged union, never a per-row "
    "range probe. Versions (from signup events) are pre-deduplicated per "
    "(user, ts) with max_by for determinism. The oracle is DuckDB's NATIVE "
    "ASOF JOIN — an independent implementation of the same semantics.",
    oracle="""
WITH base AS (
  SELECT event_id, user_id, event_type, value, epoch_ns(ts) // 1000 AS ts_us
  FROM events
), dim AS (
  SELECT user_id, ts_us AS valid_from_us, max_by(value, event_id) AS signup_value
  FROM base WHERE event_type = 'signup' GROUP BY 1, 2
), f AS (
  SELECT event_id, user_id, ts_us, value FROM base WHERE event_type = 'purchase'
)
SELECT f.event_id, f.user_id, f.ts_us, f.value, d.signup_value, d.valid_from_us
FROM f ASOF LEFT JOIN dim d
  ON f.user_id = d.user_id AND f.ts_us >= d.valid_from_us
""",
)
def scd2_temporal_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from milan_spark.operators.joins import asof_join

    base = table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value",
        F.unix_micros("ts").alias("ts_us"),
    )
    dim = (
        base.filter(F.col("event_type") == "signup")
        .groupBy("user_id", "ts_us")
        .agg(F.max_by("value", "event_id").alias("signup_value"))
        .select("user_id", "ts_us", "signup_value")
    )
    facts = base.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_us", "value"
    )
    out = asof_join(facts, dim, on="user_id", left_ord="ts_us", right_ord="ts_us")
    return out.select(
        "event_id",
        "user_id",
        "ts_us",
        "value",
        "signup_value",
        F.col("r_ts_us").alias("valid_from_us"),
    )


@register(
    "snapshot_diff_cdc",
    doc="CDC snapshot diff (operators.diff.snapshot_diff): the merge_upsert "
    "result minus a simulated deletion slice, diffed against the base — "
    "every key classified added/removed/changed/unchanged in ONE full-"
    "outer join on the key (null-safe column compare, row-local "
    "classification). At 100 TB the base stays put under bucketed layout "
    "and only the delta shuffles — a diff is the read-only half of MERGE.",
    oracle="""
WITH base AS (
  SELECT c_custkey, c_name, CAST(c_acctbal AS DECIMAL(18,6)) AS bal
  FROM customer WHERE c_custkey % 2 = 0
),
updates AS (
  SELECT c_custkey, c_name, CAST(c_acctbal AS DECIMAL(18,6)) + 100 AS bal
  FROM customer WHERE c_custkey % 3 = 0
  UNION ALL
  SELECT c_custkey + 1000000, c_name, CAST(0 AS DECIMAL(18,6))
  FROM customer WHERE c_custkey % 7 = 0
),
merged AS (
  SELECT COALESCE(u.c_custkey, b.c_custkey) AS c_custkey,
         COALESCE(u.c_name, b.c_name) AS c_name,
         COALESCE(u.bal, b.bal) AS bal
  FROM base b FULL OUTER JOIN updates u ON b.c_custkey = u.c_custkey
),
new_snap AS (SELECT * FROM merged WHERE c_custkey % 5 <> 0)
SELECT COALESCE(n.c_custkey, b.c_custkey) AS c_custkey,
       CASE WHEN b.c_custkey IS NULL THEN 'added'
            WHEN n.c_custkey IS NULL THEN 'removed'
            WHEN n.c_name IS DISTINCT FROM b.c_name
                 OR n.bal IS DISTINCT FROM b.bal THEN 'changed'
            ELSE 'unchanged' END AS change
FROM base b FULL OUTER JOIN new_snap n ON b.c_custkey = n.c_custkey
""",
)
def snapshot_diff_cdc_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from milan_spark.operators.diff import snapshot_diff

    cust = table(spark, sf_dir, "customer")
    bal = F.col("c_acctbal").cast("decimal(18,6)")
    base = cust.filter(F.col("c_custkey") % 2 == 0).select(
        "c_custkey", "c_name", bal.alias("bal")
    )
    updates = (
        cust.filter(F.col("c_custkey") % 3 == 0)
        .select("c_custkey", "c_name", (bal + 100).alias("bal"))
        .unionByName(
            cust.filter(F.col("c_custkey") % 7 == 0).select(
                (F.col("c_custkey") + 1_000_000).alias("c_custkey"),
                "c_name",
                F.lit(0).cast("decimal(18,6)").alias("bal"),
            )
        )
    )
    b, u = base.alias("b"), updates.alias("u")
    merged = b.join(u, F.col("b.c_custkey") == F.col("u.c_custkey"), "full_outer").select(
        F.coalesce(F.col("u.c_custkey"), F.col("b.c_custkey")).alias("c_custkey"),
        F.coalesce(F.col("u.c_name"), F.col("b.c_name")).alias("c_name"),
        F.coalesce(F.col("u.bal"), F.col("b.bal")).alias("bal"),
    )
    new_snap = merged.filter(F.col("c_custkey") % 5 != 0)
    return snapshot_diff(base, new_snap, keys=["c_custkey"])


@register(
    "psi_value_drift",
    doc="Population Stability Index drift monitor (operators.diff."
    "psi_drift): purchase-value distribution vs the view-value base over "
    "10 fixed-width buckets from the base min/max. Two combinable bucket-"
    "count aggregates (value domain never shuffles un-aggregated), a "
    "10-row join, add-one-smoothed exact-int rationals into one ln per "
    "bucket, round(·,6) — PSI localized per bucket, summed for the "
    "headline drift number.",
    oracle="""
WITH stats AS (
  SELECT MIN(value) AS lo, MAX(value) AS hi FROM events WHERE event_type = 'view'
),
bb AS (
  SELECT CASE WHEN s.hi = s.lo THEN 0
              ELSE LEAST(9, GREATEST(0,
                CAST(FLOOR((e.value - s.lo) * 10 / (s.hi - s.lo)) AS INT))) END AS bucket,
         COUNT(*) AS n
  FROM events e, stats s WHERE e.event_type = 'view' AND e.value IS NOT NULL
  GROUP BY 1
),
nb AS (
  SELECT CASE WHEN s.hi = s.lo THEN 0
              ELSE LEAST(9, GREATEST(0,
                CAST(FLOOR((e.value - s.lo) * 10 / (s.hi - s.lo)) AS INT))) END AS bucket,
         COUNT(*) AS n
  FROM events e, stats s WHERE e.event_type = 'purchase' AND e.value IS NOT NULL
  GROUP BY 1
),
j AS (
  SELECT r.bucket,
         CAST(COALESCE(bb.n, 0) AS BIGINT) AS base_n,
         CAST(COALESCE(nb.n, 0) AS BIGINT) AS new_n
  FROM (SELECT unnest(range(10)) AS bucket) r
  LEFT JOIN bb USING (bucket) LEFT JOIN nb USING (bucket)
),
tot AS (SELECT SUM(base_n) AS qt, SUM(new_n) AS pt FROM j)
SELECT j.bucket, j.base_n, j.new_n,
       ROUND(
         (CAST(j.new_n + 1 AS DOUBLE) / CAST(tot.pt + 10 AS DOUBLE)
          - CAST(j.base_n + 1 AS DOUBLE) / CAST(tot.qt + 10 AS DOUBLE))
         * ln((CAST(j.new_n + 1 AS DOUBLE) / CAST(tot.pt + 10 AS DOUBLE))
              / (CAST(j.base_n + 1 AS DOUBLE) / CAST(tot.qt + 10 AS DOUBLE))), 6
       ) AS psi_contrib
FROM j, tot
""",
)
def psi_value_drift_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from milan_spark.operators.diff import psi_drift

    ev = table(spark, sf_dir, "events")
    base = ev.filter(F.col("event_type") == "view")
    new = ev.filter(F.col("event_type") == "purchase")
    return psi_drift(base, new, "value", buckets=10)


@register(
    "apply_function_bundle",
    doc="Serializable ApplyFunction in the portable IR (the reference ships "
    "UDFs in its JSON programs as FunctionReference name pairs re-resolved "
    "by each compiler - Expression.scala:407, ConvertExpressionHost.scala:"
    "253-269, TreeParser.scala:23-120): an apply_function node holding the "
    "dotted-path reference milan_spark.functions.udfs:char_fold (Arrow-"
    "vectorized polynomial char fold) rides an Application bundle through "
    "to_json -> from_json -> run_batch; the deserialized side re-resolves "
    "the function by name and the aggregate hash-matches DuckDB's "
    "list_reduce replication of the same fold.",
    oracle="""
SELECT source, COUNT(*) AS n_docs,
       MAX(list_reduce(list_transform(regexp_extract_all(source, '.'),
           c -> CAST(ascii(c) AS BIGINT)),
           (a, c) -> (a * 31 + c) % 2147483647)) AS src_hash_max
FROM documents
GROUP BY source
""",
)
def apply_function_bundle_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from milan_spark.application import Application
    from milan_spark.plans.nodes import Node

    plan = Node(
        "aggregate",
        {"keys": ["source"], "aggs": {"n_docs": "count(*)", "src_hash_max": "max(src_hash)"}},
        [
            Node(
                "apply_function",
                {
                    "ref": "milan_spark.functions.udfs:char_fold",
                    "return_type": "bigint",
                    "cols": ["source"],
                    "alias": "src_hash",
                },
                [
                    Node(
                        "map",
                        {"exprs": ["doc_id", "source"]},
                        [Node("external_stream", {"stream_id": "documents"})],
                    )
                ],
            )
        ],
    )
    app = Application(
        app_id="bundle_udf_src_hash",
        plan=plan,
        sources={"documents": {"kind": "parquet", "path": f"{sf_dir}/documents.parquet"}},
    )
    shipped = Application.from_json(app.to_json())  # the UDF travels by name
    df, _ = shipped.run_batch(spark)
    return df


@register(
    "grouping_sets_revenue",
    doc="Arbitrary GROUPING SETS aggregation (Stream.grouping_sets -> "
    "df.groupingSets; the general form rollup/cube specialize — SURVEY "
    "§2.4 exceeds-parity, completing the multi-dim family): order counts "
    "and exact DECIMAL revenue for the NON-hierarchical sets (status), "
    "(priority), (status, priority) in ONE pass over orders — Spark "
    "expands the sets map-side, so the fact table is read and shuffled "
    "once, not once per set. grouping_id disambiguates a NULL group key "
    "from a rolled-up one (the standard bitmask both engines define).",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
       COUNT(*) AS n,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                        (o_orderstatus, o_orderpriority))
""",
)
def grouping_sets_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from milan_spark.stream import Stream

    orders = table(spark, sf_dir, "orders")
    return (
        Stream.from_dataframe(orders)
        .grouping_sets(
            [["o_orderstatus"], ["o_orderpriority"],
             ["o_orderstatus", "o_orderpriority"]],
            "o_orderstatus",
            "o_orderpriority",
            gid="CAST(grouping_id() AS BIGINT)",
            n="count(1)",
            revenue="CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)",
        )
        .to_df()
    )


@register(
    "kmv_intersect_distinct_users",
    doc="KMV sketch set-algebra COMPLETION (operators.sketch.kmv_sketch/"
    "kmv_merge, k=64): distinct users doing BOTH click and view estimated "
    "by inclusion-exclusion over three sketch-derived estimates — "
    "est(A) + est(B) - est(A∪B) — touching the per-type sketches only "
    "(the union estimate comes from kmv_merge's exact sketch-union, never "
    "a re-scan). This is the roll-up algebra sketch warehouses ship: "
    "per-segment sketches stored once answer pairwise-overlap questions "
    "at O(k) cost each. All three estimates are the documented "
    "correctly-rounded doubles of exact ints; the intersection is one "
    "fixed-order sum of the ROUNDED values, so it is engine-exact.",
    oracle=f"""
WITH hashed AS (
  SELECT DISTINCT event_type, {_SQL_KMV_HASH.format(s='user_id')} AS h
  FROM events WHERE user_id IS NOT NULL AND event_type IN ('click', 'view')
), per_ranked AS (
  SELECT event_type, h,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rk
  FROM hashed
), per_est AS (
  SELECT event_type,
         round(CASE WHEN COUNT(*) < 64 THEN CAST(COUNT(*) AS DOUBLE)
                    ELSE 63.0 * 2147483647.0 / MAX(h) END, 4) AS est
  FROM per_ranked WHERE rk <= 64 GROUP BY 1
), un_ranked AS (
  SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rk
  FROM (SELECT DISTINCT h FROM hashed)
), un_est AS (
  SELECT round(CASE WHEN COUNT(*) < 64 THEN CAST(COUNT(*) AS DOUBLE)
                    ELSE 63.0 * 2147483647.0 / MAX(h) END, 4) AS est_union
  FROM un_ranked WHERE rk <= 64
)
SELECT c.est AS est_click, v.est AS est_view, u.est_union,
       round(c.est + v.est - u.est_union, 4) AS est_intersect
FROM per_est c, per_est v, un_est u
WHERE c.event_type = 'click' AND v.event_type = 'view'
""",
)
def kmv_intersect_distinct_users_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from milan_spark.operators.sketch import kmv_merge, kmv_sketch

    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    sk = kmv_sketch(ev, "user_id", k=64, keys=["event_type"])
    per = kmv_merge(sk, k=64, keys=["event_type"]).select(
        "event_type", "distinct_est"
    )
    un = kmv_merge(sk.drop("event_type"), k=64).select(
        F.col("distinct_est").alias("est_union")
    )
    wide = per.groupBy().agg(
        F.max(
            F.when(F.col("event_type") == "click", F.col("distinct_est"))
        ).alias("est_click"),
        F.max(
            F.when(F.col("event_type") == "view", F.col("distinct_est"))
        ).alias("est_view"),
    )
    return wide.crossJoin(un).select(
        "est_click",
        "est_view",
        "est_union",
        F.round(
            F.col("est_click") + F.col("est_view") - F.col("est_union"), 4
        ).alias("est_intersect"),
    )


@register(
    "incremental_agg_refresh",
    doc="Algebraic materialized-view maintenance (operators.diff."
    "incremental_agg_refresh): a per-event-type aggregate view (count, "
    "exact cents sum, min/max event_id) is maintained from its stored "
    "PARTIALS plus an insert-only delta's partials — refresh(view, d) = "
    "merge(partials, partial(d)), one combinable groupBy over O(groups) "
    "rows, the base NEVER rescanned. The oracle computes the aggregate "
    "from the FULL raw table, so the hash match proves the maintenance "
    "identity merge(partial(A), partial(B)) == agg(A ∪ B) bit-for-bit — "
    "the algebra that makes view refresh O(delta) at 100 TB.",
    oracle="""
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents,
       MIN(event_id) AS min_eid, MAX(event_id) AS max_eid
FROM events GROUP BY 1
""",
)
def incremental_agg_refresh_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from milan_spark.operators.diff import incremental_agg_refresh

    ev = table(spark, sf_dir, "events").select(
        "event_type",
        "ts",
        "event_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents_row"),
    )
    cutoff = F.lit("2024-01-20").cast("timestamp")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents_row").alias("cents"),
            F.min("event_id").alias("min_eid"),
            F.max("event_id").alias("max_eid"),
        )

    base = partial(ev.filter(F.col("ts") < cutoff))
    delta = partial(ev.filter(F.col("ts") >= cutoff))
    return incremental_agg_refresh(
        base,
        delta,
        ["event_type"],
        sum_cols=["cents"],
        count_col="n",
        min_cols=["min_eid"],
        max_cols=["max_eid"],
    )


@register(
    "fuzzy_name_pairs",
    doc="Blocked fuzzy entity matching (the record-linkage staple): "
    "near-duplicate part NAMES at edit distance 1-2, computed over the "
    "DISTINCT name dictionary (names repeat across parts; resolving the "
    "dictionary once is the production shape — the dictionary is orders "
    "of magnitude smaller than the fact table). Candidate generation is "
    "BLOCKED on (last token, |length diff| <= 2) — the noun is the "
    "stable discriminative field in these names, so the quadratic runs "
    "within blocks, never all-pairs (standard blocking recall trade: an "
    "edit inside the blocking token escapes the block; production "
    "linkage runs a second pass on another key to recover). "
    "levenshtein() is deterministic and identical in both engines; "
    "canonical a < b ordering dedupes pairs.",
    oracle="""
WITH names AS (SELECT DISTINCT p_name FROM part)
SELECT a.p_name AS name_a, b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
FROM names a JOIN names b
  ON (string_split(a.p_name, ' '))[-1] = (string_split(b.p_name, ' '))[-1]
 AND a.p_name < b.p_name
 AND abs(length(a.p_name) - length(b.p_name)) <= 2
WHERE levenshtein(a.p_name, b.p_name) <= 2
""",
)
def fuzzy_name_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    names = table(spark, sf_dir, "part").select("p_name").distinct()
    a = names.select(F.col("p_name").alias("name_a"))
    b = names.select(F.col("p_name").alias("name_b"))
    pairs = a.join(
        b,
        (
            F.element_at(F.split("name_a", " "), -1)
            == F.element_at(F.split("name_b", " "), -1)
        )
        & (F.col("name_a") < F.col("name_b"))
        & (
            F.abs(F.length("name_a") - F.length("name_b")) <= 2
        ),
    )
    return pairs.filter(
        F.levenshtein("name_a", "name_b") <= 2
    ).select(
        "name_a", "name_b", F.levenshtein("name_a", "name_b").alias("dist")
    )


@register(
    "histogram_quantile_sketch",
    doc="Mergeable quantile summary (operators.sketch.histogram_quantiles, "
    "64 equi-width buckets, two passes): per-event-type p50/p95 of exact "
    "cents estimated from bucket counts with in-bucket linear "
    "interpolation. Bucket counts are combinable sums, so histograms "
    "merge by ADDITION — per-partition/per-day quantile summaries roll "
    "up without re-scanning, completing the sketch family "
    "(distinct: KMV/HLL, frequency: CMS/heavy-hitters, membership: "
    "Bloom, quantiles: this). Bucket index and target rank are exact "
    "int arithmetic (floor of ratios of exact ints); the interpolation "
    "is one fixed double expression — engine-exact, error bounded by "
    "span/64. The oracle replays the identical two passes.",
    oracle="""
WITH base AS (
  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
), stats AS (
  SELECT event_type, COUNT(*) AS n, MIN(cents) AS mn, MAX(cents) AS mx
  FROM base GROUP BY 1
), binned AS (
  SELECT b.event_type, s.n, s.mn, s.mx,
         least(63, CAST(floor((b.cents - s.mn) * 64 / (s.mx - s.mn + 1)) AS BIGINT)) AS bin
  FROM base b JOIN stats s USING (event_type)
), counts AS (
  SELECT event_type, n, mn, mx, bin, COUNT(*) AS c
  FROM binned GROUP BY 1, 2, 3, 4, 5
), cum AS (
  SELECT *, SUM(c) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
         SUM(c) OVER (PARTITION BY event_type ORDER BY bin) - c AS cum_before
  FROM counts
), hit50 AS (
  SELECT event_type, n, mn, mx,
         MIN(struct_pack(bin := bin, c := c, cum_before := cum_before)) AS h
  FROM cum WHERE cum >= CAST(floor((n * 50 + 99) / 100) AS BIGINT)
  GROUP BY 1, 2, 3, 4
), hit95 AS (
  SELECT event_type, n, mn, mx,
         MIN(struct_pack(bin := bin, c := c, cum_before := cum_before)) AS h
  FROM cum WHERE cum >= CAST(floor((n * 95 + 99) / 100) AS BIGINT)
  GROUP BY 1, 2, 3, 4
), p50 AS (
  SELECT event_type, n, mn, mx,
         round(CAST(mn AS DOUBLE)
               + CAST(h.bin AS DOUBLE) * CAST(mx - mn + 1 AS DOUBLE) / 64.0e0
               + CAST(mx - mn + 1 AS DOUBLE) / 64.0e0
                 * CAST(CAST(floor((n * 50 + 99) / 100) AS BIGINT) - h.cum_before AS DOUBLE)
                 / CAST(h.c AS DOUBLE), 4) AS p50_est
  FROM hit50
), p95 AS (
  SELECT event_type, n, mn, mx,
         round(CAST(mn AS DOUBLE)
               + CAST(h.bin AS DOUBLE) * CAST(mx - mn + 1 AS DOUBLE) / 64.0e0
               + CAST(mx - mn + 1 AS DOUBLE) / 64.0e0
                 * CAST(CAST(floor((n * 95 + 99) / 100) AS BIGINT) - h.cum_before AS DOUBLE)
                 / CAST(h.c AS DOUBLE), 4) AS p95_est
  FROM hit95
)
SELECT event_type, n, mn, mx, p50.p50_est, p95.p95_est
FROM p50 JOIN p95 USING (event_type, n, mn, mx)
""",
)
def histogram_quantile_sketch_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from milan_spark.operators.sketch import histogram_quantiles

    ev = table(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    return histogram_quantiles(
        ev, "cents", keys=["event_type"], bins=64, percents=(50, 95)
    )


@register(
    "k_anonymity_audit",
    doc="k-anonymity audit over the quasi-identifier pair (nation, market "
    "segment) — the privacy gate a training corpus runs before release: "
    "every QI equivalence class with fewer than k=5 members is a "
    "re-identification risk. One map-side-combinable groupBy; the audit "
    "emits per-class size, the risk flag, and the smallest member id as "
    "the investigation handle (deterministic min, not an arbitrary "
    "sample). Output is the full class inventory so the oracle hash "
    "covers compliant AND risky classes.",
    oracle="""
SELECT c_nationkey, c_mktsegment, COUNT(*) AS class_size,
       COUNT(*) < 5 AS at_risk,
       MIN(c_custkey) AS example_custkey
FROM customer
GROUP BY 1, 2
""",
)
def k_anonymity_audit_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    return cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("class_size"),
        (F.count(F.lit(1)) < 5).alias("at_risk"),
        F.min("c_custkey").alias("example_custkey"),
    )


@register(
    "mad_outlier_audit",
    doc="Robust outlier detection by median absolute deviation (the "
    "Hampel X84 rule, |x - med| > 3·MAD) on exact cents per event type. "
    "Medians are EXACT lower-medians (value at rank ceil(n/2) — the "
    "quantile_disc discipline, no float interpolation, engine-identical "
    "for any n), computed by rank windows over the per-(type, value) "
    "count table so the raw stream is aggregated before any sort. "
    "Output: per-type med, mad, and outlier count — integer-exact end "
    "to end (3·MAD compare in plain int64).",
    oracle="""
WITH base AS (
  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
), vc AS (
  SELECT event_type, cents, COUNT(*) AS c FROM base GROUP BY 1, 2
), ranked AS (
  SELECT *, SUM(c) OVER (PARTITION BY event_type ORDER BY cents) AS cum,
         SUM(c) OVER (PARTITION BY event_type) AS n
  FROM vc
), med AS (
  SELECT event_type, MIN(cents) AS med FROM ranked
  WHERE cum >= CAST(floor((n + 1) / 2) AS BIGINT) GROUP BY 1
), dev AS (
  SELECT b.event_type, abs(b.cents - m.med) AS d, m.med
  FROM base b JOIN med m USING (event_type)
), dvc AS (
  SELECT event_type, med, d, COUNT(*) AS c FROM dev GROUP BY 1, 2, 3
), dranked AS (
  SELECT *, SUM(c) OVER (PARTITION BY event_type ORDER BY d) AS cum,
         SUM(c) OVER (PARTITION BY event_type) AS n
  FROM dvc
), mad AS (
  SELECT event_type, med, MIN(d) AS mad FROM dranked
  WHERE cum >= CAST(floor((n + 1) / 2) AS BIGINT) GROUP BY 1, 2
)
SELECT b.event_type, m.med, m.mad,
       CAST(SUM(CASE WHEN abs(b.cents - m.med) > 3 * m.mad THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers,
       COUNT(*) AS n
FROM base b JOIN mad m USING (event_type)
GROUP BY 1, 2, 3
""",
)
def mad_outlier_audit_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )

    def lower_median(df: DataFrame, col: str) -> DataFrame:
        vc = df.groupBy("event_type", col).agg(F.count(F.lit(1)).alias("c"))
        w = W.partitionBy("event_type").orderBy(col)
        wn = W.partitionBy("event_type")
        ranked = vc.withColumn("cum", F.sum("c").over(w)).withColumn(
            "n", F.sum("c").over(wn)
        )
        t = F.floor((F.col("n") + 1) / 2).cast("long")
        return (
            ranked.filter(F.col("cum") >= t)
            .groupBy("event_type")
            .agg(F.min(col).alias(f"med_{col}"))
        )

    med = lower_median(ev, "cents").withColumnRenamed("med_cents", "med")
    dev = ev.join(med, "event_type").select(
        "event_type", "med", F.abs(F.col("cents") - F.col("med")).alias("d")
    )
    mad = (
        lower_median(dev.select("event_type", F.col("d").alias("cents")), "cents")
        .withColumnRenamed("med_cents", "mad")
    )
    stats = med.join(mad, "event_type")
    return (
        ev.join(F.broadcast(stats), "event_type")
        .groupBy("event_type", "med", "mad")
        .agg(
            F.sum(
                F.when(
                    F.abs(F.col("cents") - F.col("med")) > 3 * F.col("mad"), 1
                ).otherwise(0)
            ).cast("long").alias("n_outliers"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "gaps_and_islands",
    doc="Gaps-and-islands: maximal runs of CONSECUTIVE active days per "
    "user (the classic sequential-SQL pattern; streak analytics, "
    "contiguous-coverage audits). The island id is day - dense_rank over "
    "the user's distinct active days — constant within a run, different "
    "across gaps — so the whole query is the distinct-day aggregate plus "
    "ONE window over per-user days and one final groupBy; the raw event "
    "stream is reduced before any sort. Output: per-user islands of "
    "length >= 2 with start/end day and length, exact date ints.",
    oracle="""
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
  WHERE user_id IS NOT NULL
), marked AS (
  SELECT user_id, day,
         CAST(day - CAST(DENSE_RANK() OVER (PARTITION BY user_id ORDER BY day) AS INT)
              AS DATE) AS island
  FROM days
)
SELECT user_id, MIN(day) AS start_day, MAX(day) AS end_day,
       COUNT(*) AS len
FROM marked GROUP BY user_id, island
HAVING COUNT(*) >= 2
""",
)
def gaps_and_islands_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    days = ev.select("user_id", F.col("ts").cast("date").alias("day")).distinct()
    rk = F.dense_rank().over(W.partitionBy("user_id").orderBy("day"))
    marked = days.withColumn("island", F.date_sub(F.col("day"), rk))
    return (
        marked.groupBy("user_id", "island")
        .agg(
            F.min("day").alias("start_day"),
            F.max("day").alias("end_day"),
            F.count(F.lit(1)).alias("len"),
        )
        .filter(F.col("len") >= 2)
        # timestamps out: pandas reads DuckDB DATE as datetime64, Spark DATE
        # as objects — cast so both engines land on the same dtype
        .select(
            "user_id",
            F.col("start_day").cast("timestamp").alias("start_day"),
            F.col("end_day").cast("timestamp").alias("end_day"),
            "len",
        )
    )


def _hits_oracle(iterations: int = 4, scale: int = 1_000_000, offset: int = 10_000_000) -> str:
    """Unrolled fixed-iteration HITS as chained CTEs — the recursion-free
    mirror of operators.graph.hits_scaled, constant-for-constant (scale and
    iteration count are formatted from the SAME Python integers the catalog
    query passes, so the two sides cannot drift).

    Every round CTE is AS MATERIALIZED: the raw-score CTEs are referenced
    twice (once for the values, once inside the scalar MAX), and DuckDB's
    default CTE inlining re-evaluates each reference — doubling per
    half-step compounds to 2^(2·iterations) copies of the whole chain
    (measured: the un-materialized form did not finish at sf0.01)."""
    ctes = [f"h0 AS MATERIALIZED (SELECT node, CAST({scale} AS BIGINT) AS s FROM nodes)"]
    prev_h = "h0"
    for k in range(1, iterations + 1):
        ctes.append(
            f"""a{k}r AS MATERIALIZED (
  SELECT e.v AS node, SUM(h.s) AS s FROM e JOIN {prev_h} h ON h.node = e.u GROUP BY e.v
), a{k} AS MATERIALIZED (
  SELECT node, CAST((s * {scale}) // (SELECT MAX(s) FROM a{k}r) AS BIGINT) AS s FROM a{k}r
), h{k}r AS MATERIALIZED (
  SELECT e.u AS node, SUM(a.s) AS s FROM e JOIN a{k} a ON a.node = e.v GROUP BY e.u
), h{k} AS MATERIALIZED (
  SELECT node, CAST((s * {scale}) // (SELECT MAX(s) FROM h{k}r) AS BIGINT) AS s FROM h{k}r
)"""
        )
        prev_h = f"h{k}"
    return f"""
WITH e AS (
  SELECT DISTINCT l.l_suppkey AS u, o.o_custkey + {offset} AS v
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
nodes AS (SELECT u AS node FROM e UNION SELECT v FROM e),
{', '.join(ctes)}
SELECT n.node,
       COALESCE(h.s, CAST(0 AS BIGINT)) AS hub,
       COALESCE(a.s, CAST(0 AS BIGINT)) AS auth
FROM nodes n
LEFT JOIN h{iterations} h ON h.node = n.node
LEFT JOIN a{iterations} a ON a.node = n.node
"""


@register(
    "hits_hub_authority",
    doc="Fixed-iteration HITS (Kleinberg 1999) over the bipartite "
    "supplier→customer fulfillment graph (customers offset by 10^7 so the "
    "two key spaces stay disjoint): suppliers score as hubs, customers as "
    "authorities. Scaled int64 arithmetic with max-normalization per "
    "half-step — sums and floor divisions only, bit-identical on any "
    "engine/partitioning (float HITS cannot hash-match). Four rounds of "
    "two equi-join+combinable-sum passes over a persisted edge list plus "
    "one-row broadcast maxes; broadcast_scores keeps the edge list "
    "shuffle-free (node universe = entity keys, KBs at any edge scale). "
    "See operators.graph.hits_scaled.",
    oracle=_hits_oracle(),
)
def hits_hub_authority_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from milan_spark.operators.graph import hits_scaled

    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    edges = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        F.col("l_suppkey").alias("src"),
        (F.col("o_custkey") + F.lit(10_000_000)).cast("long").alias("dst"),
    )
    return hits_scaled(edges, "src", "dst", iterations=4, broadcast_scores=True)


@register(
    "scc_nation_trade",
    doc="Strongly connected components of the thinned nation→nation trade "
    "digraph: an edge supp_nation→cust_nation survives when its lineitem "
    "count exceeds 1.25× the mean edge count (exact cross-multiplied "
    "integer test — cnt·n_edges·100 > total·125 — so both engines keep "
    "the identical edge set). SCC by semi-naive transitive closure "
    "(Δ ⋈ E minus known pairs per round, per-round lineage truncation) "
    "+ one transpose self-join for mutual reach + a combinable min — "
    "viable exactly where SCC is run in practice: metadata-scale graphs "
    "(or a corpus graph after CC contraction/trim). The oracle is "
    "DuckDB's RECURSIVE CTE — an independent realization of the same "
    "closure. See operators.graph.strongly_connected_components.",
    oracle="""
WITH RECURSIVE pairs AS (
  SELECT s.s_nationkey AS u, c.c_nationkey AS v, COUNT(*) AS cnt
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  WHERE s.s_nationkey <> c.c_nationkey
  GROUP BY 1, 2
), tot AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS t, COUNT(*) AS ne FROM pairs
), e AS (
  SELECT CAST(u AS BIGINT) AS u, CAST(v AS BIGINT) AS v
  FROM pairs, tot WHERE cnt * ne * 100 > t * 125
), tc AS (
  SELECT u, v FROM e
  UNION
  SELECT tc.u, e.v FROM tc JOIN e ON tc.v = e.u
), nodes AS (
  SELECT u AS node FROM e UNION SELECT v FROM e
)
SELECT n.node,
       CAST(MIN(LEAST(n.node, COALESCE(m.peer, n.node))) AS BIGINT) AS scc_id
FROM nodes n LEFT JOIN (
  SELECT a.u AS node, a.v AS peer FROM tc a JOIN tc b ON a.u = b.v AND a.v = b.u
) m ON m.node = n.node
GROUP BY n.node
""",
)
def scc_nation_trade_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from milan_spark.operators.graph import strongly_connected_components

    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    supp = table(spark, sf_dir, "supplier")
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .groupBy(
            F.col("s_nationkey").cast("long").alias("u"),
            F.col("c_nationkey").cast("long").alias("v"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    tot = pairs.agg(
        F.sum("cnt").cast("long").alias("t"), F.count(F.lit(1)).alias("ne")
    )
    edges = (
        pairs.crossJoin(F.broadcast(tot))
        .filter(F.col("cnt") * F.col("ne") * 100 > F.col("t") * 125)
        .select(F.col("u").alias("src"), F.col("v").alias("dst"))
    )
    return strongly_connected_components(edges)


@register(
    "hits_cycle_ir",
    doc="HITS AS A PORTABLE PLAN — the fifth cycle-node program, and the "
    "first carrying TWO evolving quantities through the single-state cycle "
    "contract: hub and authority rows ride one tagged frame (role ∈ "
    "{'h','a'}), the body filters out the hub half, runs both max-"
    "normalized half-steps, and re-tags. Every multi-consumer subtree in "
    "the body sits under the new ``checkpoint`` IR node (raw scores feed "
    "max + rescale; normalized auth feeds the hub step + the output union) "
    "— the exact blowup plans.validate.audit_shared_subtrees flags, "
    "asserted clean in tests/test_plan_audit.py. Built as raw IR, JSON "
    "round-tripped, compiled by the batch driver fixpoint; SAME ORACLE as "
    "hits_hub_authority — the DSL operator and the deserialized plan must "
    "be bit-identical (StreamExpressions.scala:141 portability).",
    oracle=_hits_oracle(),
)
def hits_cycle_ir_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from milan_spark.plans.nodes import compile_node, from_json, to_json

    return compile_node(from_json(to_json(_hits_ir_plan(sf_dir))), spark)


def _hits_ir_plan(sf_dir: str):
    """The hits_cycle_ir Node plan, exposed for the shared-subtree audit
    test (tests/test_plan_audit.py asserts the body is checkpoint-clean)."""
    from milan_spark.plans.nodes import Node

    scale = 1_000_000
    li = Node(
        "map",
        {"exprs": ["l_orderkey", "l_suppkey"]},
        [Node("parquet_source", {"path": f"{sf_dir}/lineitem.parquet"})],
    )
    orders = Node(
        "map",
        {"exprs": ["o_orderkey AS l_orderkey", "o_custkey"]},
        [Node("parquet_source", {"path": f"{sf_dir}/orders.parquet"})],
    )
    edges = Node("cache", {}, [Node("distinct", {}, [Node(
        "map",
        {"exprs": ["l_suppkey AS u", "CAST(o_custkey + 10000000 AS BIGINT) AS v"]},
        [Node("relational_join", {"on": ["l_orderkey"]}, [li, orders])],
    )])])
    nodes = Node("cache", {}, [Node("distinct", {}, [Node("union", {}, [
        Node("map", {"exprs": ["u AS node"]}, [edges]),
        Node("map", {"exprs": ["v AS node"]}, [edges]),
    ])])])
    seed = Node(
        "map",
        {"exprs": ["node", f"CAST({scale} AS BIGINT) AS s", "'h' AS role"]},
        [nodes],
    )

    def half_step(score_in: Node, join_col: str, out_key: str) -> Node:
        # one HITS half-step: edges ⋈ scores on join_col, combinable sum
        # keyed by the other endpoint, then max-normalize. The raw frame
        # feeds TWO consumers (max + rescale) → checkpoint node.
        raw = Node("checkpoint", {}, [Node(
            "aggregate",
            {"keys": [f"{out_key} AS node"], "aggs": {"s": "sum(s)"}},
            [Node(
                "relational_join",
                {"on": [join_col]},
                [edges, Node("map", {"exprs": [f"node AS {join_col}", "s"]}, [score_in])],
            )],
        )])
        mx = Node(
            "aggregate",
            {"keys": ["1 AS k"], "aggs": {"mx": "max(s)"}},
            [raw],
        )
        return Node(
            "map",
            {"exprs": ["node", f"CAST((s * {scale}) div mx AS BIGINT) AS s"]},
            [Node(
                "relational_join",
                {"on": ["k"]},
                [Node("map", {"exprs": ["node", "s", "1 AS k"]}, [raw]), mx],
            )],
        )

    state = Node("cycle_ref")
    h = Node("filter", {"condition": "role = 'h'"}, [state])
    a_new = Node("checkpoint", {}, [half_step(h, "u", "v")])   # auth from hubs
    h_new = half_step(a_new, "v", "u")                          # hubs from auths
    body = Node("union", {}, [
        Node("map", {"exprs": ["node", "s", "'h' AS role"]}, [h_new]),
        Node("map", {"exprs": ["node", "s", "'a' AS role"]}, [a_new]),
    ])
    final = Node("cycle", {"max_iterations": 4}, [seed, body])
    hub = Node("map", {"exprs": ["node", "s AS hub"]},
               [Node("filter", {"condition": "role = 'h'"}, [final])])
    auth = Node("map", {"exprs": ["node", "s AS auth"]},
                [Node("filter", {"condition": "role = 'a'"}, [final])])
    plan = Node(
        "map",
        {"exprs": [
            "node",
            "CAST(coalesce(hub, 0) AS BIGINT) AS hub",
            "CAST(coalesce(auth, 0) AS BIGINT) AS auth",
        ]},
        [Node(
            "relational_join",
            {"on": ["node"], "how": "left"},
            [Node("relational_join", {"on": ["node"], "how": "left"}, [nodes, hub]), auth],
        )],
    )
    return plan


@register(
    "personalized_pagerank_seeds",
    doc="PERSONALIZED PageRank (random-walk-with-restart, the related-items "
    "recommendation shape): restart mass and initial rank concentrated on "
    "seed suppliers {1,2,3} over the supplier->customer fulfillment graph "
    "— same scaled-int64 algebra and two-joins-per-round plan as "
    "pagerank_supplier_customer (operators.graph.pagerank_scaled "
    "seeds=...), so the personalized variant stays bit-identical and "
    "oracle-checkable. Nodes unreachable from the seeds read exactly 0.",
    oracle=_pagerank_oracle(seeds=(1, 2, 3)),
)
def personalized_pagerank_seeds_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from milan_spark.operators.graph import pagerank_scaled

    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    edges = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        F.col("l_suppkey").alias("src"), F.col("o_custkey").alias("dst")
    )
    return pagerank_scaled(
        edges, "src", "dst", iterations=5, broadcast_ranks=True, seeds=(1, 2, 3)
    )


@register(
    "l_diversity_audit",
    doc="l-diversity audit (Machanavajjhala TKDD'07, the k-anonymity "
    "companion): within each quasi-identifier class (nation, market "
    "segment), the SENSITIVE attribute (order priority of the class "
    "members' orders) must take at least l=3 distinct values — a class "
    "can be k-anonymous yet leak via a homogeneous sensitive column. One "
    "join + one combinable groupBy with an exact distinct; emits the full "
    "class inventory (sizes, distinct sensitive count, risk flag) so the "
    "hash covers compliant and risky classes alike.",
    oracle="""
SELECT c.c_nationkey, c.c_mktsegment,
       COUNT(*) AS n_rows,
       COUNT(DISTINCT o.o_orderpriority) AS distinct_sensitive,
       COUNT(DISTINCT o.o_orderpriority) < 3 AS at_risk
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY 1, 2
""",
)
def l_diversity_audit_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    )
    orders = table(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    joined = orders.join(cust, orders.o_custkey == cust.c_custkey)
    return joined.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("o_orderpriority").alias("distinct_sensitive"),
        (F.countDistinct("o_orderpriority") < 3).alias("at_risk"),
    )


@register(
    "entity_resolution_pipeline",
    doc="Entity-resolution FLAGSHIP (record linkage end to end): blocked "
    "fuzzy matching over the distinct part-name dictionary (edit distance "
    "<= 2 within (last token, length band) blocks — the fuzzy_name_pairs "
    "stage), near-match graph collapsed to entities by "
    "operators.graph.connected_components (min-label propagation — string "
    "labels compare byte-wise identically in both engines), then "
    "SURVIVORSHIP: every fact row resolves to its cluster's canonical "
    "(minimum) name, unpaired names resolve to themselves, and the audit "
    "emits per-entity fact count, variant-name count, and the smallest "
    "partkey as the investigation handle. The oracle re-derives the "
    "clusters with a DuckDB recursive reachability CTE — an independent "
    "CC implementation.",
    oracle="""
WITH RECURSIVE names AS (SELECT DISTINCT p_name FROM part),
pairs AS (
  SELECT a.p_name AS na, b.p_name AS nb
  FROM names a JOIN names b
    ON (string_split(a.p_name, ' '))[-1] = (string_split(b.p_name, ' '))[-1]
   AND a.p_name < b.p_name
   AND abs(length(a.p_name) - length(b.p_name)) <= 2
  WHERE levenshtein(a.p_name, b.p_name) <= 2
),
e AS (SELECT na AS u, nb AS v FROM pairs UNION ALL SELECT nb AS u, na AS v FROM pairs),
reach(n, l) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM e)
  UNION
  SELECT e.v, reach.l FROM reach JOIN e ON e.u = reach.n
),
lab AS (SELECT n, MIN(l) AS label FROM reach GROUP BY n)
SELECT COALESCE(lab.label, p.p_name) AS canonical_name,
       COUNT(*) AS n_parts,
       COUNT(DISTINCT p.p_name) AS n_names,
       MIN(p.p_partkey) AS example_partkey
FROM part p LEFT JOIN lab ON lab.n = p.p_name
GROUP BY 1
""",
)
def entity_resolution_pipeline_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from milan_spark.operators.graph import connected_components

    part = table(spark, sf_dir, "part").select("p_partkey", "p_name")
    names = part.select("p_name").distinct()
    a = names.select(F.col("p_name").alias("name_a"))
    b = names.select(F.col("p_name").alias("name_b"))
    pairs = a.join(
        b,
        (
            F.element_at(F.split("name_a", " "), -1)
            == F.element_at(F.split("name_b", " "), -1)
        )
        & (F.col("name_a") < F.col("name_b"))
        & (F.abs(F.length("name_a") - F.length("name_b")) <= 2),
    ).filter(F.levenshtein("name_a", "name_b") <= 2)
    labels = connected_components(pairs, "name_a", "name_b").select(
        F.col("node").alias("p_name"), F.col("label").alias("canonical")
    )
    resolved = part.join(labels, "p_name", "left").select(
        "p_partkey",
        "p_name",
        F.coalesce("canonical", "p_name").alias("canonical_name"),
    )
    return resolved.groupBy("canonical_name").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.countDistinct("p_name").alias("n_names"),
        F.min("p_partkey").alias("example_partkey"),
    )


@register(
    "merge_upsert_with_deletes",
    doc="MERGE with tombstones (the CDC-apply step change-data-feed "
    "pipelines run): the updates batch carries an is_delete flag — "
    "matched tombstones REMOVE the base row, matched updates replace it, "
    "unmatched non-tombstone updates insert, unmatched base survives. "
    "Still ONE full-outer join on the key + a row-local CASE (the "
    "merge_upsert plan with one extra filter); tombstones for absent "
    "keys are no-ops by construction.",
    oracle="""
WITH base AS (
  SELECT c_custkey, c_name, CAST(c_acctbal AS DECIMAL(18,6)) AS bal
  FROM customer WHERE c_custkey % 2 = 0
),
updates AS (
  SELECT c_custkey, c_name, CAST(c_acctbal AS DECIMAL(18,6)) + 100 AS bal,
         c_custkey % 5 = 0 AS is_delete
  FROM customer WHERE c_custkey % 3 = 0
  UNION ALL
  SELECT c_custkey + 1000000, c_name, CAST(0 AS DECIMAL(18,6)), FALSE
  FROM customer WHERE c_custkey % 7 = 0
)
SELECT COALESCE(u.c_custkey, b.c_custkey) AS c_custkey,
       COALESCE(u.c_name, b.c_name) AS c_name,
       CAST(COALESCE(u.bal, b.bal) AS DOUBLE) AS bal
FROM base b FULL OUTER JOIN updates u ON b.c_custkey = u.c_custkey
WHERE NOT COALESCE(u.is_delete, FALSE)
""",
)
def merge_upsert_with_deletes_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    bal = F.col("c_acctbal").cast("decimal(18,6)")
    base = cust.filter(F.col("c_custkey") % 2 == 0).select(
        "c_custkey", "c_name", bal.alias("bal")
    )
    updates = (
        cust.filter(F.col("c_custkey") % 3 == 0)
        .select(
            "c_custkey", "c_name", (bal + 100).alias("bal"),
            (F.col("c_custkey") % 5 == 0).alias("is_delete"),
        )
        .unionByName(
            cust.filter(F.col("c_custkey") % 7 == 0).select(
                (F.col("c_custkey") + 1_000_000).alias("c_custkey"),
                "c_name",
                F.lit(0).cast("decimal(18,6)").alias("bal"),
                F.lit(False).alias("is_delete"),
            )
        )
    )
    b, u = base.alias("b"), updates.alias("u")
    merged = b.join(u, F.col("b.c_custkey") == F.col("u.c_custkey"), "full_outer")
    return merged.filter(
        ~F.coalesce(F.col("u.is_delete"), F.lit(False))
    ).select(
        F.coalesce(F.col("u.c_custkey"), F.col("b.c_custkey")).alias("c_custkey"),
        F.coalesce(F.col("u.c_name"), F.col("b.c_name")).alias("c_name"),
        F.coalesce(F.col("u.bal"), F.col("b.bal")).cast("double").alias("bal"),
    )


@register(
    "incremental_join_maintenance",
    doc="Incremental view maintenance for a JOIN view (the delta-join rule "
    "dBase engines and stream processors share): with A split into "
    "(A_old, dA) and B into (B_old, dB), the view delta is "
    "dA><B_old  U  A_old><dB  U  dA><dB — the OLD view is never "
    "rescanned and the big sides join only against deltas. Here "
    "A=orders (delta: last month present), B=customer (delta: custkey%10 "
    "= 3 'late-arriving dims'); the oracle simply recomputes the FULL "
    "join, hash-proving the maintenance identity view_old U delta = "
    "full.",
    oracle="""
SELECT o.o_orderkey, o.o_custkey,
       CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents,
       c.c_mktsegment
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
""",
)
def incremental_join_maintenance_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("price_cents"),
        "o_orderdate",
    )
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cutoff = orders.agg(F.date_trunc("month", F.max("o_orderdate"))).first()[0]
    a_old = orders.filter(F.col("o_orderdate") < cutoff)
    d_a = orders.filter(F.col("o_orderdate") >= cutoff)
    b_old = cust.filter(F.col("c_custkey") % 10 != 3)
    d_b = cust.filter(F.col("c_custkey") % 10 == 3)
    cols = ["o_orderkey", "o_custkey", "price_cents", "c_mktsegment"]

    def j(a, b):
        return a.join(b, a["o_custkey"] == b["c_custkey"]).select(*cols)

    view_old = j(a_old, b_old)
    delta = j(d_a, b_old).unionByName(j(a_old, d_b)).unionByName(j(d_a, d_b))
    return view_old.unionByName(delta)


@register(
    "asof_join_forward_next_signup",
    doc="FORWARD as-of join (operators.joins.asof_join direction='forward' "
    "— the time-to-next-event shape churn/attribution analyses run): each "
    "purchase pairs with the user's NEXT signup at-or-after its event "
    "time. Same one-shuffle-one-sort-per-key plan as the backward family; "
    "rights pre-deduplicated per (user, ts) with max_by. The oracle maps "
    "forward onto DuckDB's native backward ASOF by negating the time axis "
    "(greatest -ts_d <= -ts_f == smallest ts_d >= ts_f, ties included).",
    oracle="""
WITH base AS (
  SELECT event_id, user_id, event_type, value, epoch_ns(ts) // 1000 AS ts_us
  FROM events
), dim AS (
  SELECT user_id, ts_us AS sig_us, -ts_us AS neg_sig,
         max_by(value, event_id) AS signup_value
  FROM base WHERE event_type = 'signup' GROUP BY 1, 2, 3
), f AS (
  SELECT event_id, user_id, ts_us, -ts_us AS neg_ts, value
  FROM base WHERE event_type = 'purchase'
)
SELECT f.event_id, f.user_id, f.ts_us, f.value,
       d.signup_value AS next_signup_value, d.sig_us AS next_signup_us
FROM f ASOF LEFT JOIN dim d
  ON f.user_id = d.user_id AND f.neg_ts >= d.neg_sig
""",
)
def asof_join_forward_next_signup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from milan_spark.operators.joins import asof_join

    base = table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value",
        F.unix_micros("ts").alias("ts_us"),
    )
    dim = (
        base.filter(F.col("event_type") == "signup")
        .groupBy("user_id", "ts_us")
        .agg(F.max_by("value", "event_id").alias("next_signup_value"))
        .select("user_id", "ts_us", "next_signup_value")
    )
    facts = base.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_us", "value"
    )
    out = asof_join(
        facts, dim, on="user_id", left_ord="ts_us", right_ord="ts_us",
        direction="forward",
    )
    return out.select(
        "event_id",
        "user_id",
        "ts_us",
        "value",
        "next_signup_value",
        F.col("r_ts_us").alias("next_signup_us"),
    )


@register(
    "scc_after_contraction",
    doc="The SCC production recipe EXECUTED, not just documented (the "
    "strongly_connected_components docstring's 100-TB prescription, now "
    "operators.graph.scc_trim_contract): the input digraph is the thinned "
    "nation->nation trade core PLUS a large acyclic periphery — every "
    "customer points at its nation (in-degree-0 nodes, key+10^7) and every "
    "nation at its suppliers (out-degree-0 nodes, key+10^8). Trim peels "
    "the whole periphery in one round (each peeled node is a singleton "
    "SCC by construction), reciprocal-edge CC contraction collapses the "
    "mutual core pairs, and the quadratic-risk closure runs only on the "
    "residual handful of nations — while the oracle computes plain SCC "
    "over the ENTIRE graph (recursive CTE), proving the recipe is "
    "semantics-preserving. SCALE.md records the closure-pair reduction.",
    oracle="""
WITH RECURSIVE np AS (
  SELECT s.s_nationkey AS u, c.c_nationkey AS v, COUNT(*) AS cnt
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  WHERE s.s_nationkey <> c.c_nationkey
  GROUP BY 1, 2
), tot AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS t, COUNT(*) AS ne FROM np
), e AS (
  SELECT CAST(u AS BIGINT) AS u, CAST(v AS BIGINT) AS v
  FROM np, tot WHERE cnt * ne * 100 > t * 125
  UNION
  SELECT CAST(c_custkey + 10000000 AS BIGINT), CAST(c_nationkey AS BIGINT)
  FROM customer
  UNION
  SELECT CAST(s_nationkey AS BIGINT), CAST(s_suppkey + 100000000 AS BIGINT)
  FROM supplier
), tc AS (
  SELECT u, v FROM e
  UNION
  SELECT tc.u, e.v FROM tc JOIN e ON tc.v = e.u
), nodes AS (
  SELECT u AS node FROM e UNION SELECT v FROM e
)
SELECT n.node,
       CAST(MIN(LEAST(n.node, COALESCE(m.peer, n.node))) AS BIGINT) AS scc_id
FROM nodes n LEFT JOIN (
  SELECT a.u AS node, a.v AS peer FROM tc a JOIN tc b ON a.u = b.v AND a.v = b.u
) m ON m.node = n.node
GROUP BY n.node
""",
)
def scc_after_contraction_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from milan_spark.operators.graph import scc_trim_contract

    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    supp = table(spark, sf_dir, "supplier")
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .groupBy(
            F.col("s_nationkey").cast("long").alias("u"),
            F.col("c_nationkey").cast("long").alias("v"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    tot = pairs.agg(F.sum("cnt").cast("long").alias("t"), F.count(F.lit(1)).alias("ne"))
    core = (
        pairs.crossJoin(F.broadcast(tot))
        .filter(F.col("cnt") * F.col("ne") * 100 > F.col("t") * 125)
        .select("u", "v")
    )
    periphery_in = cust.select(
        (F.col("c_custkey") + F.lit(10_000_000)).cast("long").alias("u"),
        F.col("c_nationkey").cast("long").alias("v"),
    )
    periphery_out = supp.select(
        F.col("s_nationkey").cast("long").alias("u"),
        (F.col("s_suppkey") + F.lit(100_000_000)).cast("long").alias("v"),
    )
    edges = core.unionByName(periphery_in).unionByName(periphery_out)
    return scc_trim_contract(edges, "u", "v", trim_rounds=2)


@register(
    "versioned_time_travel",
    doc="Versioned table layout (operators.versioned): lakehouse-style "
    "snapshot isolation over plain parquet — immutable per-commit data "
    "directories + manifests, one atomically-replaced pointer; commits "
    "write everything first and flip the pointer LAST, so readers resolve "
    "a version once and never see a torn table. The query drives the full "
    "lifecycle — append (pre-1995 orders), append (the rest), MERGE "
    "(doubled cents for o_orderkey%10=0 plus synthetic inserted keys, the "
    "merge_upsert COALESCE plan) — then time-travels all three snapshots "
    "and rolls each up; the oracle re-derives every snapshot from the raw "
    "orders table, so the hash pins commit isolation, merge semantics, and "
    "history readability at once. Scale: append commits are O(new data); "
    "manifests list directories, not files (O(commits) until compact).",
    oracle="""
WITH base AS (
  SELECT o_orderkey, CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
         o_orderdate
  FROM orders
), v1 AS (
  SELECT * FROM base WHERE o_orderdate < DATE '1995-01-01'
), v3 AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 10 = 0 THEN cents * 2 ELSE cents END AS cents
  FROM base
  UNION ALL
  SELECT -o_orderkey AS o_orderkey, cents FROM base WHERE o_orderkey % 97 = 0 AND o_orderkey > 0
)
SELECT 1 AS version, COUNT(*) AS n_orders, CAST(SUM(cents) AS BIGINT) AS total_cents FROM v1
UNION ALL
SELECT 2, COUNT(*), CAST(SUM(cents) AS BIGINT) FROM base
UNION ALL
SELECT 3, COUNT(*), CAST(SUM(cents) AS BIGINT) FROM v3
""",
)
def versioned_time_travel_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from milan_spark.operators.versioned import (
        commit_append,
        commit_merge,
        read_version,
    )

    base = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").alias("cents"),
        "o_orderdate",
    )
    path = tempfile.mkdtemp(prefix="milan_vtt_")
    commit_append(base.filter("o_orderdate < DATE '1995-01-01'"), path, tag="pre95")
    commit_append(base.filter("o_orderdate >= DATE '1995-01-01'"), path, tag="rest")
    updates = base.filter("o_orderkey % 10 = 0").withColumn(
        "cents", F.col("cents") * 2
    ).unionByName(
        base.filter("o_orderkey % 97 = 0 AND o_orderkey > 0").select(
            (-F.col("o_orderkey")).alias("o_orderkey"), "cents", "o_orderdate"
        )
    )
    commit_merge(spark, updates, path, ["o_orderkey"], tag="adjust")
    parts = []
    for v in (1, 2, 3):
        parts.append(
            read_version(spark, path, v).agg(
                F.lit(v).cast("int").alias("version"),
                F.count(F.lit(1)).alias("n_orders"),
                F.sum("cents").alias("total_cents"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@register(
    "versioned_change_feed",
    doc="Change data feed between two committed table versions — the "
    "versioned layout (operators.versioned) composed with the CDC "
    "classifier (operators.diff.snapshot_diff): rebuild the "
    "versioned_time_travel table, diff version 2 against the post-MERGE "
    "version 3, and roll the per-key change rows up by kind. Added keys "
    "are the merge's synthetic inserts, changed keys the doubled-cents "
    "updates, everything else unchanged — all re-derived from raw orders "
    "by the oracle, so the hash pins that time travel exposes exactly the "
    "delta the merge produced (ONE full-outer join on the key; the base "
    "version never rewrites).",
    oracle="""
WITH base AS (
  SELECT o_orderkey, CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
)
SELECT 'added' AS change, (SELECT COUNT(*) FROM base WHERE o_orderkey % 97 = 0 AND o_orderkey > 0) AS n_keys
UNION ALL
SELECT 'changed', (SELECT COUNT(*) FROM base WHERE o_orderkey % 10 = 0 AND cents <> 0)
UNION ALL
SELECT 'unchanged', (SELECT COUNT(*) FROM base WHERE o_orderkey % 10 <> 0 OR cents = 0)
""",
)
def versioned_change_feed_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from milan_spark.operators.diff import snapshot_diff
    from milan_spark.operators.versioned import (
        commit_append,
        commit_merge,
        read_version,
    )

    base = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").alias("cents"),
        "o_orderdate",
    )
    path = tempfile.mkdtemp(prefix="milan_vcf_")
    commit_append(base.filter("o_orderdate < DATE '1995-01-01'"), path)
    commit_append(base.filter("o_orderdate >= DATE '1995-01-01'"), path)
    updates = base.filter("o_orderkey % 10 = 0").withColumn(
        "cents", F.col("cents") * 2
    ).unionByName(
        base.filter("o_orderkey % 97 = 0 AND o_orderkey > 0").select(
            (-F.col("o_orderkey")).alias("o_orderkey"), "cents", "o_orderdate"
        )
    )
    commit_merge(spark, updates, path, ["o_orderkey"])
    diff = snapshot_diff(
        read_version(spark, path, 2),
        read_version(spark, path, 3),
        keys=["o_orderkey"],
        compare=["cents"],
    )
    return (
        diff.filter("change <> 'removed'")  # merge never deletes
        .groupBy("change")
        .agg(F.count(F.lit(1)).alias("n_keys"))
    )


@register(
    "versioned_pruned_scan",
    doc="Manifest zone-map data skipping on the versioned table "
    "(operators.versioned.prune_files/read_pruned): orders lands as three "
    "date-ranged append commits with per-file min/max stats collected from "
    "the parquet footers into the manifest (stats_cols), then a "
    "date-window + price predicate is answered by read_pruned — files "
    "whose [min, max] cannot hold a match are dropped DRIVER-SIDE from "
    "the scan list before Spark lists anything, and the exact predicate "
    "still applies, so the result is precisely WHERE semantics. The query "
    "then re-clusters via compact(cluster_by=o_orderdate) and re-answers "
    "the same predicate at the new version; both snapshots' monthly "
    "rollups must match the oracle's plain WHERE twice. Self-checking: it "
    "RAISES unless pruning actually skipped files in both versions, so a "
    "silent stats regression fails the gate rather than degrading to a "
    "full scan. Scale: this is the Iceberg/Delta scan-planning story — at "
    "100 TB the manifest is the small table that turns a petabyte listing "
    "into reading only matching files, and clustered compaction is what "
    "keeps those zone maps tight as appends accumulate.",
    oracle="""
WITH hits AS (
  SELECT date_trunc('month', o_orderdate) AS month,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
  WHERE o_orderdate BETWEEN TIMESTAMP '1998-01-01 00:00:00'
                        AND TIMESTAMP '1998-12-31 23:59:59'
    AND o_totalprice >= 100000.0
), agg AS (
  SELECT month, COUNT(*) AS n_orders, CAST(SUM(cents) AS BIGINT) AS total_cents
  FROM hits GROUP BY month
)
SELECT 'appended' AS snapshot, * FROM agg
UNION ALL
SELECT 'compacted', * FROM agg
""",
)
def versioned_pruned_scan_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    import datetime as dt

    from milan_spark.errors import MilanAnalysisError
    from milan_spark.operators.versioned import (
        commit_append,
        compact,
        read_pruned,
    )

    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    path = tempfile.mkdtemp(prefix="milan_vps_")
    splits = [
        orders.filter("o_orderdate < TIMESTAMP '1997-01-01'"),
        orders.filter(
            "o_orderdate >= TIMESTAMP '1997-01-01' "
            "AND o_orderdate < TIMESTAMP '1999-01-01'"
        ),
        orders.filter("o_orderdate >= TIMESTAMP '1999-01-01'"),
    ]
    for part in splits:
        # range-partition each commit on the date so per-file zone maps are
        # tight -- the layout discipline that makes skipping effective
        commit_append(
            part.repartitionByRange(4, "o_orderdate")
            .sortWithinPartitions("o_orderdate"),
            path,
            stats_cols=["o_orderdate", "o_totalprice"],
        )
    preds = [
        ("o_orderdate", "between",
         (dt.datetime(1998, 1, 1), dt.datetime(1998, 12, 31, 23, 59, 59))),
        ("o_totalprice", ">=", 100000.0),
    ]

    def monthly(snapshot: str) -> DataFrame:
        df, report = read_pruned(spark, path, preds, with_report=True)
        if report["files_skipped"] < 1 or report["dirs_without_stats"]:
            raise MilanAnalysisError(
                f"versioned_pruned_scan: zone maps failed to prune "
                f"({report}) — stats collection or skipping regressed"
            )
        return (
            df.groupBy(F.date_trunc("month", "o_orderdate").alias("month"))
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum(
                    F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
                ).alias("total_cents"),
            )
            .select(F.lit(snapshot).alias("snapshot"), "*")
        )

    before = monthly("appended")
    compact(
        spark, path, cluster_by=("o_orderdate",),
        stats_cols=["o_orderdate", "o_totalprice"], partitions=12,
    )
    after = monthly("compacted")
    return before.unionByName(after)


@register(
    "versioned_bloom_lookup",
    doc="Per-file Bloom-filter indexes on the versioned table "
    "(operators.versioned bloom_cols): orders lands hash-distributed on "
    "o_orderkey, so every file spans the whole key domain and zone maps "
    "can prune NOTHING for a point lookup — the classic needle-in-100-TB "
    "case. Each commit therefore aggregates a portable per-file Bloom "
    "filter (sketch.bloom_build's two-fold hash, map-side combinable, "
    "bounded at files x m/32 words in the manifest) and the driver-side "
    "probe — a pure-Python twin of the column hash, pinned equal by "
    "pytest — drops files whose filter lacks the key's bits before Spark "
    "lists anything. The IN-list lookup unions per-key probes; the exact "
    "predicate still applies, so the rows equal plain WHERE ... IN. "
    "Self-checking: raises unless the bloom actually skipped most files. "
    "False positives only cost an extra file read; never a lost row.",
    oracle="""
SELECT o_orderkey,
       CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
       o_orderdate
FROM orders
WHERE o_orderkey IN (1, 7, 32, 33, 999999999)
""",
)
def versioned_bloom_lookup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from milan_spark.errors import MilanAnalysisError
    from milan_spark.operators.versioned import commit_append, read_pruned

    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    )
    path = tempfile.mkdtemp(prefix="milan_vbl_")
    # size the layout from the data so the filters stay useful at ANY sf:
    # ~8k keys/file at 2^17 bits -> load 0.12, false-positive rate ~1.3%
    # per key-file; a fixed file count would saturate the blooms at sf1
    n = orders.count()
    files = max(8, -(-n // 8000))
    # hash distribution on the key: the layout point lookups actually face
    commit_append(
        orders.repartition(files, "o_orderkey"), path,
        stats_cols=["o_orderkey"], bloom_cols=["o_orderkey"],
        bloom_bits=1 << 17,
    )
    keys = (1, 7, 32, 33, 999999999)
    df, report = read_pruned(
        spark, path, [("o_orderkey", "in", keys)], with_report=True
    )
    if report["files_skipped"] < report["files_total"] // 2:
        raise MilanAnalysisError(
            f"versioned_bloom_lookup: bloom index failed to prune "
            f"({report}) — per-file filter build or probe regressed"
        )
    return df.select(
        "o_orderkey",
        F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").alias("cents"),
        "o_orderdate",
    )


@register(
    "materialized_view_incremental",
    doc="Incrementally-maintained materialized aggregate view "
    "(operators/materialize.py) over the versioned orders table: the "
    "first refresh computes per-priority sum/count/min/max from the full "
    "snapshot; the two later appends are folded in by aggregating ONLY "
    "the directories they added (appended_dirs_between reads the "
    "manifest chain, no diff join, no history scan) and merging partial "
    "states into the stored view with one full-outer coalesce — "
    "O(delta)+O(view), the maintenance discipline that keeps a 100 TB "
    "fact table's rollups affordable. The view is itself a versioned "
    "table whose commit tag carries the src= watermark, so refresh is "
    "idempotent and crash-safe. Self-checking: raises unless the second "
    "refresh actually ran incrementally. The oracle recomputes the final "
    "rollup from raw orders, pinning that incremental == recompute.",
    oracle="""
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents,
       CAST(MIN(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS min_cents,
       CAST(MAX(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS max_cents
FROM orders
GROUP BY o_orderpriority
""",
)
def materialized_view_incremental_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from milan_spark.errors import MilanAnalysisError
    from milan_spark.operators.materialize import refresh_agg_view
    from milan_spark.operators.versioned import commit_append, read_version

    orders = table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").alias("cents"),
        "o_orderdate",
    )
    src = tempfile.mkdtemp(prefix="milan_mvi_src_")
    view = tempfile.mkdtemp(prefix="milan_mvi_view_")
    measures = {
        "n_orders": ("count", "*"),
        "total_cents": ("sum", "cents"),
        "min_cents": ("min", "cents"),
        "max_cents": ("max", "cents"),
    }
    commit_append(orders.filter("o_orderdate < TIMESTAMP '1997-01-01'"), src)
    first = refresh_agg_view(spark, src, view, ["o_orderpriority"], measures)
    commit_append(
        orders.filter(
            "o_orderdate >= TIMESTAMP '1997-01-01' "
            "AND o_orderdate < TIMESTAMP '1999-01-01'"
        ),
        src,
    )
    commit_append(orders.filter("o_orderdate >= TIMESTAMP '1999-01-01'"), src)
    second = refresh_agg_view(spark, src, view, ["o_orderpriority"], measures)
    if first["mode"] != "full" or second["mode"] != "incremental":
        raise MilanAnalysisError(
            f"materialized_view_incremental: expected full then incremental "
            f"refresh, got {first['mode']!r} then {second['mode']!r}"
        )
    return read_version(spark, view).select(
        "o_orderpriority", "n_orders", "total_cents", "min_cents", "max_cents"
    )


@register(
    "versioned_targeted_delete",
    doc="Targeted copy-on-write DELETE on the versioned table "
    "(operators.versioned.commit_delete) — the right-to-be-forgotten "
    "shape: orders lands range-clustered on o_custkey with per-file zone "
    "maps, then one customer-key range is deleted by rewriting ONLY the "
    "files whose [min, max] can contain those keys (the same manifest "
    "metadata that prunes reads bounds the rewrite); every other file "
    "stays referenced byte-identical, and the pre-delete snapshot remains "
    "time-travelable until vacuum (which IS the erasure step for privacy "
    "deletes — the docstring says so). NULL-safe SQL DELETE semantics: a "
    "NULL predicate does not match, so NULL keys survive. Output is the "
    "per-status rollup of the post-delete snapshot unioned with the "
    "pre-delete one; the oracle re-derives both from raw orders, and the "
    "query raises unless the rewrite actually touched a minority of "
    "files.",
    oracle="""
WITH base AS (
  SELECT o_orderstatus AS status,
         o_custkey,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
)
SELECT 'after_delete' AS snapshot, status,
       COUNT(*) AS n_orders, CAST(SUM(cents) AS BIGINT) AS total_cents
FROM base WHERE o_custkey < 200 OR o_custkey > 260
GROUP BY status
UNION ALL
SELECT 'before_delete', status, COUNT(*), CAST(SUM(cents) AS BIGINT)
FROM base GROUP BY status
""",
)
def versioned_targeted_delete_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from milan_spark.errors import MilanAnalysisError
    from milan_spark.operators.versioned import (
        commit_append,
        commit_delete,
        read_version,
    )

    orders = table(spark, sf_dir, "orders").select(
        F.col("o_orderstatus").alias("status"),
        "o_custkey",
        F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").alias("cents"),
    )
    path = tempfile.mkdtemp(prefix="milan_vtd_")
    commit_append(
        orders.repartitionByRange(8, "o_custkey")
        .sortWithinPartitions("o_custkey"),
        path, stats_cols=["o_custkey"],
    )
    rep = commit_delete(spark, path, [("o_custkey", "between", (200, 260))])
    if rep["files_rewritten"] > rep["files_untouched"]:
        raise MilanAnalysisError(
            f"versioned_targeted_delete: rewrite was not targeted ({rep}) — "
            f"zone-map bounding of the delete regressed"
        )

    def rollup(df: DataFrame, label: str) -> DataFrame:
        return (
            df.groupBy("status")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum("cents").alias("total_cents"),
            )
            .select(F.lit(label).alias("snapshot"), "*")
        )

    return rollup(read_version(spark, path), "after_delete").unionByName(
        rollup(read_version(spark, path, 1), "before_delete")
    )


@register(
    "versioned_targeted_update",
    doc="Targeted copy-on-write UPDATE (operators.versioned.commit_update) "
    "— the fourth DML verb beside append/MERGE/DELETE: a price correction "
    "for one customer-key range rewrites only the files whose zone maps "
    "admit those keys, applying the assignment to matching rows and "
    "passing the candidates' other rows through unchanged; every "
    "non-candidate file stays referenced byte-identical, and the "
    "pre-update snapshot stays time-travelable. The query self-fails "
    "unless the rewrite touched a minority of files; the oracle "
    "re-derives post- and pre-update rollups from raw orders with a CASE "
    "expression, pinning row identity through the update.",
    oracle="""
WITH base AS (
  SELECT o_orderstatus AS status,
         o_custkey,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
)
SELECT 'after_update' AS snapshot, status, COUNT(*) AS n_orders,
       CAST(SUM(CASE WHEN o_custkey BETWEEN 200 AND 260
                     THEN cents + 500 ELSE cents END) AS BIGINT) AS total_cents
FROM base GROUP BY status
UNION ALL
SELECT 'before_update', status, COUNT(*), CAST(SUM(cents) AS BIGINT)
FROM base GROUP BY status
""",
)
def versioned_targeted_update_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from milan_spark.errors import MilanAnalysisError
    from milan_spark.operators.versioned import (
        commit_append,
        commit_update,
        read_version,
    )

    orders = table(spark, sf_dir, "orders").select(
        F.col("o_orderstatus").alias("status"),
        "o_custkey",
        F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").alias("cents"),
    )
    path = tempfile.mkdtemp(prefix="milan_vtu_")
    commit_append(
        orders.repartitionByRange(8, "o_custkey")
        .sortWithinPartitions("o_custkey"),
        path, stats_cols=["o_custkey"],
    )
    rep = commit_update(
        spark, path, [("o_custkey", "between", (200, 260))],
        {"cents": F.col("cents") + 500},
    )
    if rep["files_rewritten"] > rep["files_untouched"]:
        raise MilanAnalysisError(
            f"versioned_targeted_update: rewrite was not targeted ({rep})"
        )

    def rollup(df: DataFrame, label: str) -> DataFrame:
        return (
            df.groupBy("status")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum("cents").alias("total_cents"),
            )
            .select(F.lit(label).alias("snapshot"), "*")
        )

    return rollup(read_version(spark, path), "after_update").unionByName(
        rollup(read_version(spark, path, 1), "before_update")
    )


@register(
    "versioned_metadata_count",
    doc="COUNT pushdown into the manifest "
    "(operators.versioned.count_where): orders lands date-range-clustered "
    "with footer row counts + zone maps in the manifest, and COUNT(*) "
    "queries split files three ways — disjoint (skip), fully-covered "
    "(counted from metadata without opening the file; requires proven "
    "zero NULLs), partial (scanned exactly). The unfiltered count reads "
    "ZERO data bytes, a year slice scans only its two boundary files — "
    "the numRecords fast path every table format ships, generalized to "
    "range predicates. Exactness is unconditional (undecidable files are "
    "scanned), which the oracle pins by re-deriving every count from raw "
    "orders; the query raises unless the metadata path actually engaged.",
    oracle="""
SELECT 'all' AS label, COUNT(*) AS n FROM orders
UNION ALL
SELECT 'y1997', COUNT(*) FROM orders
WHERE o_orderdate BETWEEN TIMESTAMP '1997-01-01 00:00:00'
                      AND TIMESTAMP '1997-12-31 23:59:59'
UNION ALL
SELECT 'pre96', COUNT(*) FROM orders
WHERE o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
""",
)
def versioned_metadata_count_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    import datetime as dt

    from milan_spark.errors import MilanAnalysisError
    from milan_spark.operators.versioned import commit_append, count_where

    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    path = tempfile.mkdtemp(prefix="milan_vmc_")
    commit_append(
        orders.repartitionByRange(12, "o_orderdate")
        .sortWithinPartitions("o_orderdate"),
        path, stats_cols=["o_orderdate"],
    )
    results = {
        "all": count_where(spark, path),
        "y1997": count_where(
            spark, path,
            [("o_orderdate", "between",
              (dt.datetime(1997, 1, 1), dt.datetime(1997, 12, 31, 23, 59, 59)))],
        ),
        "pre96": count_where(
            spark, path, [("o_orderdate", "<", dt.datetime(1996, 1, 1))]
        ),
    }
    if results["all"]["files_scanned"] != 0 or (
        results["y1997"]["files_metadata_only"] < 1
    ):
        raise MilanAnalysisError(
            f"versioned_metadata_count: metadata fast path did not engage "
            f"({results})"
        )
    return spark.createDataFrame(
        [(k, r["count"]) for k, r in results.items()], "label string, n long"
    )
