"""Relational-analytics and training-pipeline queries: TPC-H classic shapes,
window-function analytics, pivot, exact moments/quantiles, deterministic
splits/samples, TF-IDF.

These exceed the reference's operator surface (SURVEY.md §2.7 notes Milan has
no sorts/limits/pivots and no scalar library at all — everything here would be
user ``ApplyFunction`` code there); they are the queries a user of a general
analytics engine runs daily, expressed through the same library primitives.

Float discipline (see ``milan_spark.catalog``): every double is derived from
exact DECIMAL/integer quantities by an identical IEEE expression tree on both
engines; magnitudes stay under 2^53 so decimal→double casts are exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from milan_spark import functions as mf
from milan_spark.catalog import register
from milan_spark.operators.sampling import hash_split, stratified_sample
from milan_spark.sources import table

DEC = "decimal(18,6)"

# Oracle fragments: the same polynomial folds used by operators/text.py and
# operators/sampling.py, in DuckDB list_reduce form.
_H31 = (
    "list_reduce(list_transform(regexp_extract_all({s}, '.'), c -> CAST(ascii(c) AS BIGINT)),"
    " (a, c) -> (a * 31 + c) % 2147483647)"
)
_H131 = (
    "list_reduce(list_transform(regexp_extract_all({s}, '.'), c -> CAST(ascii(c) AS BIGINT)),"
    " (a, c) -> (a * 131 + c) % 2147483647)"
)
# XOR mix (see operators/sampling.py hash_bucket: linear mixes collapse
# mod n for short numeric keys)
_BUCKET = f"(xor({_H31}, ({_H131} * 65537) % 2147483647) % {{n}})"


@register(
    "q3_shipping_priority",
    doc="TPC-H Q3 shape: segment-filtered customer ⋈ orders ⋈ lineitem, "
    "revenue per order, top 10. The filtered dimension broadcasts; the fact "
    "table never shuffles before aggregation (plan audited in "
    "tests/test_plan_shapes.py).",
    oracle="""
SELECT l_orderkey,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))), 2) AS DOUBLE) AS revenue,
       o_orderdate
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1998-06-01'
  AND l_shipdate > TIMESTAMP '1998-06-01'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-06-01").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-06-01").cast("timestamp")
    )
    price = F.col("l_extendedprice").cast(DEC)
    disc = F.col("l_discount").cast(DEC)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(mf.agg_sum(price * (F.lit(1) - disc)), 2).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "q6_revenue_forecast",
    doc="TPC-H Q6 shape: pure filter + global aggregate — every predicate "
    "pushes to the parquet scan, the aggregate is map-side partial; the "
    "whole query is one scan and a 1-row exchange.",
    oracle="""
SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(l_discount AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    sd = F.col("l_shipdate")
    return (
        li.filter(
            (sd >= F.lit("1996-01-01").cast("timestamp"))
            & (sd < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                mf.agg_sum(F.col("l_extendedprice").cast(DEC) * F.col("l_discount").cast(DEC)), 2
            )
            .cast("double")
            .alias("revenue"),
            mf.agg_count().alias("n_items"),
        )
    )


@register(
    "order_gap_lag_lead",
    doc="Window-function analytics (absent in the reference — ordering exists "
    "only inside scans): per-customer order timeline with lag/lead/rank. One "
    "shuffle + one sort per customer partition.",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(epoch(o_orderdate) AS BIGINT)
         - lag(CAST(epoch(o_orderdate) AS BIGINT)) OVER w AS gap_seconds,
       lead(o_totalprice) OVER w AS next_price,
       rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS price_rank
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
)
def order_gap_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    wt = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wp = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    # parquet stores TIMESTAMP_NTZ; go through session-tz timestamp (UTC) to
    # epoch seconds — identical to DuckDB's epoch()
    ts = F.col("o_orderdate").cast("timestamp").cast("long")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        (ts - F.lag(ts).over(wt)).alias("gap_seconds"),
        F.lead("o_totalprice").over(wt).alias("next_price"),
        F.rank().over(wp).alias("price_rank"),
    )


@register(
    "pivot_revenue_matrix",
    doc="Pivot (groupBy().pivot() — no reference analog): linestatus × "
    "returnflag revenue matrix. Plans as one hash aggregate over composite "
    "keys then a width-3 projection — no extra shuffle versus the flat agg.",
    oracle="""
SELECT l_linestatus,
       CAST(ROUND(SUM(CASE WHEN l_returnflag = 'A' THEN CAST(l_extendedprice AS DECIMAL(18,6)) END), 2) AS DOUBLE) AS "A",
       CAST(ROUND(SUM(CASE WHEN l_returnflag = 'N' THEN CAST(l_extendedprice AS DECIMAL(18,6)) END), 2) AS DOUBLE) AS "N",
       CAST(ROUND(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_extendedprice AS DECIMAL(18,6)) END), 2) AS DOUBLE) AS "R"
FROM lineitem
GROUP BY l_linestatus
""",
)
def pivot_revenue_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    pivoted = (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.round(mf.agg_sum(F.col("l_extendedprice").cast(DEC)), 2).cast("double"))
    )
    return pivoted


@register(
    "stats_moments",
    doc="Statistical aggregates (stddev/covar/corr — absent in the reference) "
    "computed from exact DECIMAL power sums by an identical IEEE double "
    "formula on both engines: order-independent under parallel aggregation, "
    "unlike native stddev/corr whose float accumulation order varies.",
    oracle="""
WITH sums AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,6))), 6) AS DOUBLE) AS sq,
         CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,6)) * CAST(l_quantity AS DECIMAL(18,6))), 6) AS DOUBLE) AS sqq,
         CAST(ROUND(SUM(CAST(l_discount AS DECIMAL(18,6))), 6) AS DOUBLE) AS sd,
         CAST(ROUND(SUM(CAST(l_discount AS DECIMAL(18,6)) * CAST(l_discount AS DECIMAL(18,6))), 6) AS DOUBLE) AS sdd,
         CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,6)) * CAST(l_discount AS DECIMAL(18,6))), 6) AS DOUBLE) AS sqd
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag,
       CAST(n AS BIGINT) AS n_rows,
       sq / n AS mean_qty,
       sqrt((sqq - sq * sq / n) / (n - 1)) AS stddev_qty,
       (sqd - sq * sd / n) / (n - 1) AS covar_qty_disc,
       ((sqd - sq * sd / n) / (n - 1))
         / (sqrt((sqq - sq * sq / n) / (n - 1)) * sqrt((sdd - sd * sd / n) / (n - 1))) AS corr_qty_disc
FROM sums
""",
)
def stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast(DEC)
    d = F.col("l_discount").cast(DEC)

    def dsum(c, name):
        return F.round(mf.agg_sum(c), 6).cast("double").alias(name)

    sums = li.groupBy("l_returnflag").agg(
        mf.agg_count().cast("double").alias("n"),
        dsum(q, "sq"),
        dsum(q * q, "sqq"),
        dsum(d, "sd"),
        dsum(d * d, "sdd"),
        dsum(q * d, "sqd"),
    )
    n, sq, sqq, sd, sdd, sqd = (F.col(c) for c in ["n", "sq", "sqq", "sd", "sdd", "sqd"])
    var_q = (sqq - sq * sq / n) / (n - 1)
    var_d = (sdd - sd * sd / n) / (n - 1)
    covar = (sqd - sq * sd / n) / (n - 1)
    return sums.select(
        "l_returnflag",
        n.cast("long").alias("n_rows"),
        (sq / n).alias("mean_qty"),
        F.sqrt(var_q).alias("stddev_qty"),
        covar.alias("covar_qty_disc"),
        (covar / (F.sqrt(var_q) * F.sqrt(var_d))).alias("corr_qty_disc"),
    )


@register(
    "quantile_selection_prices",
    doc="The same exact per-key discrete quantiles as quantile_disc_prices, "
    "computed by two-phase DISTRIBUTED SELECTION instead of the per-key "
    "full sort (operators.sampling.exact_quantiles): per-key (n, min, max) "
    "combine -> integer bucket histogram combine -> cumulative histogram "
    "locates each target rank's bucket (<= 1024 rows per key) -> ONLY the "
    "target buckets' rows rank exactly. At 100 TB the disc variant sorts "
    "every row of the heaviest key on one task; this touches ~n*|probs|/B "
    "rows past the two combines. Identical output, same oracle shape.",
    oracle="""
WITH ranked AS (
  SELECT l_returnflag, l_extendedprice,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag
                            ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn
  FROM lineitem
), counts AS (
  SELECT l_returnflag, COUNT(*) AS n FROM lineitem GROUP BY l_returnflag
), targets AS (
  SELECT l_returnflag, p, (num * n + den - 1) // den AS target_rn
  FROM counts, (VALUES ('p25', 1, 4), ('p50', 1, 2), ('p75', 3, 4), ('p95', 19, 20)) q(p, num, den)
)
SELECT r.l_returnflag, t.p, r.l_extendedprice AS q_value
FROM ranked r JOIN targets t
  ON r.l_returnflag = t.l_returnflag AND r.rn = t.target_rn
""",
)
def quantile_selection_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    from milan_spark.operators.sampling import exact_quantiles

    li = table(spark, sf_dir, "lineitem").withColumn(
        "__cents", (F.col("l_extendedprice") * 100).cast("long")
    )
    return exact_quantiles(
        li,
        ["l_returnflag"],
        "l_extendedprice",
        "__cents",
        [("p25", 1, 4), ("p50", 1, 2), ("p75", 3, 4), ("p95", 19, 20)],
        tiebreak=["l_orderkey", "l_linenumber"],
    )


@register(
    "quantile_disc_prices",
    doc="Exact discrete quantiles per key — value at rank ceil(p·n), computed "
    "entirely in integer arithmetic (no float quantile interpolation, which "
    "is engine-specific). One sort per key partition + a broadcast of the "
    "4-row-per-key target table.",
    oracle="""
WITH ranked AS (
  SELECT l_returnflag, l_extendedprice,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag
                            ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn
  FROM lineitem
), counts AS (
  SELECT l_returnflag, COUNT(*) AS n FROM lineitem GROUP BY l_returnflag
), targets AS (
  SELECT l_returnflag, p, (num * n + den - 1) // den AS target_rn
  FROM counts, (VALUES ('p25', 1, 4), ('p50', 1, 2), ('p75', 3, 4), ('p95', 19, 20)) q(p, num, den)
)
SELECT r.l_returnflag, t.p, r.l_extendedprice AS q_value
FROM ranked r JOIN targets t
  ON r.l_returnflag = t.l_returnflag AND r.rn = t.target_rn
""",
)
def quantile_disc_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_returnflag").orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
    ranked = li.select(
        "l_returnflag", "l_extendedprice", F.row_number().over(w).alias("rn")
    )
    counts = li.groupBy("l_returnflag").agg(mf.agg_count().alias("n"))
    ps = F.array(
        *[
            F.struct(
                F.lit(p).alias("p"), F.lit(num).cast("long").alias("num"), F.lit(den).cast("long").alias("den")
            )
            for p, num, den in [("p25", 1, 4), ("p50", 1, 2), ("p75", 3, 4), ("p95", 19, 20)]
        ]
    )
    targets = (
        counts.select("l_returnflag", "n", F.explode(ps).alias("q"))
        .select(
            F.col("l_returnflag").alias("t_flag"),
            F.col("q.p").alias("p"),
            F.expr("(q.num * n + q.den - 1) div q.den").alias("target_rn"),
        )
    )
    return (
        ranked.join(
            F.broadcast(targets),
            (ranked.l_returnflag == F.col("t_flag")) & (ranked.rn == F.col("target_rn")),
        )
        .select("l_returnflag", "p", F.col("l_extendedprice").alias("q_value"))
    )


@register(
    "hash_split_train_test",
    doc="Deterministic 80/10/10 train/val/test split of the document corpus "
    "(operators/sampling.py): assignment is a pure function of doc_id — "
    "stable under repartitioning, retries, and corpus growth, unlike "
    "randomSplit. No shuffle at all: the label is a narrow projection.",
    oracle=f"""
WITH b AS (
  SELECT doc_id, {_BUCKET.format(s="CAST(doc_id AS VARCHAR)", n=100)} AS bucket FROM documents
)
SELECT doc_id, bucket,
       CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split
FROM b
""",
)
def hash_split_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    from milan_spark.operators.sampling import hash_bucket

    return hash_split(docs, "doc_id").select(
        "doc_id", hash_bucket("doc_id", 100).alias("bucket"), "split"
    )


@register(
    "stratified_sample_events",
    doc="Exact-size stratified sample: 5 events per event_type, chosen by "
    "deterministic hash order (operators/sampling.py) — a reproducible "
    "uniform sample with no RNG. One shuffle + per-stratum sort.",
    oracle=f"""
SELECT event_id, event_type, sample_rank FROM (
  SELECT event_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY {_BUCKET.format(s="CAST(event_id AS VARCHAR)", n=1073741824)}, event_id) AS sample_rank
  FROM events
)
WHERE sample_rank <= 5
""",
)
def stratified_sample_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return stratified_sample(ev, ["event_type"], 5, "event_id").select(
        "event_id", "event_type", "sample_rank"
    )


@register(
    "tfidf_top_terms",
    doc="TF-IDF salience, integer-exact: score = tf · ((N·1e6) div df) — the "
    "floor-scaled idf keeps both engines bit-identical (ln() is libm-"
    "dependent) while preserving tf/idf ordering. Top-3 terms per document. "
    "Token explode is a narrow op; the two aggregations are the only "
    "shuffles; the df side joins broadcast (vocabulary ≪ corpus).",
    oracle="""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
), df AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
), n AS (
  SELECT COUNT(*) AS n_docs FROM documents
), scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         tf.tf * ((n.n_docs * 1000000) // df.df) AS score
  FROM tf, df, n WHERE tf.term = df.term
)
SELECT doc_id, term, tf, df, score, rk FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rk FROM scored
)
WHERE rk <= 3
""",
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z0-9]+"), 0)).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(mf.agg_count().alias("tf"))
    df_ = tf.groupBy("term").agg(mf.agg_count().alias("df"))
    n = docs.agg(mf.agg_count().alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.expr("tf * ((n_docs * 1000000) div df)").alias("score"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term"))
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 3)


@register(
    "q5_local_supplier_volume",
    doc="TPC-H Q5 shape: six-table join (customer ⋈ orders ⋈ lineitem ⋈ "
    "supplier ⋈ nation ⋈ region) with the local-supplier condition "
    "(customer and supplier share a nation), revenue per nation for one "
    "region-year. Topology: nation/region/supplier broadcast (tiny and "
    "1%-of-customers dims); the only big shuffles are the fact-side "
    "order/customer equi-joins and the final per-nation aggregate — at "
    "SF100 the same plan holds because the broadcast sides grow with SF "
    "only linearly in supplier (0.01×lineitem).",
    oracle="""
SELECT n_name,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))), 2) AS DOUBLE) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
""",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = table(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    supp = table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast(DEC)
    disc = F.col("l_discount").cast(DEC)
    return (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .groupBy("n_name")
        .agg(F.round(mf.agg_sum(price * (F.lit(1) - disc)), 2).cast("double").alias("revenue"))
    )


@register(
    "q16_supplier_part_variety",
    doc="TPC-H Q16 shape: anti-join exclusion (negative-balance suppliers "
    "excluded via NOT IN -> broadcast anti-join; this testdata has no "
    "s_comment column, so acctbal<0 stands in for the complaints predicate) "
    "+ distinct-count aggregate per part attribute group. The excluded set "
    "is tiny -> broadcast anti; partsupp is simulated by the lineitem "
    "(partkey, suppkey) projection — count(distinct suppkey) exercises the "
    "two-phase distinct aggregate.",
    oracle="""
SELECT p_brand, p_type,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM part, lineitem
WHERE p_partkey = l_partkey
  AND p_brand <> 'Brand#1'
  AND l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p_brand, p_type
""",
)
def q16_supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = table(spark, sf_dir, "part").filter(F.col("p_brand") != "Brand#1")
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    bad = table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q7_nation_trade_flows",
    doc="TPC-H Q7 shape: bidirectional trade volume between two nations per "
    "ship year. The fact table reaches TWO independent nation lookups — "
    "supplier-side and customer-side — so the plan has two broadcast dim "
    "chains feeding one fact pipeline; the symmetric nation-pair predicate "
    "is a residual filter on the joined row. The only big shuffles are the "
    "lineitem⋈orders and orders⋈customer equi-joins; at SF100 both sides of "
    "every broadcast stay dim-sized, and the final (nation, nation, year) "
    "aggregate is 2×|years| rows.",
    oracle="""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))), 2) AS DOUBLE) AS revenue
FROM lineitem, orders, customer, supplier, nation n1, nation n2
WHERE l_orderkey = o_orderkey
  AND o_custkey = c_custkey
  AND l_suppkey = s_suppkey
  AND s_nationkey = n1.n_nationkey
  AND c_nationkey = n2.n_nationkey
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
""",
)
def q7_nation_trade_flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    supp = table(spark, sf_dir, "supplier").join(
        F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key")
    )
    cust = table(spark, sf_dir, "customer").join(
        F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key")
    )
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast(DEC)
    disc = F.col("l_discount").cast(DEC)
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(F.round(mf.agg_sum(price * (F.lit(1) - disc)), 2).cast("double").alias("revenue"))
    )


@register(
    "q10_returned_items",
    doc="TPC-H Q10 shape: top-20 customers by revenue lost to returned lines "
    "(l_returnflag = 'R'), enriched with nation. Ordering ties are broken "
    "by c_custkey so the top-20 cut is deterministic on both engines. The "
    "revenue aggregate shuffles on custkey AFTER the returnflag filter has "
    "pruned ~2/3 of the fact table at the scan (predicate pushed to "
    "parquet); customer and nation broadcast into the enrich join; the "
    "global top-20 is a driver-side sort of the per-customer aggregate — "
    "TakeOrderedAndProject, no full sort at scale.",
    oracle="""
SELECT c.c_custkey, c.c_name,
       CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l.l_discount AS DECIMAL(18,6)))), 2) AS DOUBLE) AS revenue,
       c.c_acctbal, n.n_name
FROM customer c, orders o, lineitem l, nation n
WHERE c.c_custkey = o.o_custkey
  AND l.l_orderkey = o.o_orderkey
  AND l.l_returnflag = 'R'
  AND c.c_nationkey = n.n_nationkey
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
""",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = table(spark, sf_dir, "nation")
    price = F.col("l_extendedprice").cast(DEC)
    disc = F.col("l_discount").cast(DEC)
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(mf.agg_sum(price * (F.lit(1) - disc)), 2).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "q14_promo_revenue",
    doc="TPC-H Q14 shape: promotion revenue share — a conditional aggregate "
    "ratio over one join. Both the promo numerator and the total "
    "denominator come out of ONE pass (two conditional DECIMAL sums in the "
    "same aggregate, each rounded to an exact double before the final "
    "division, which is then bit-identical IEEE on both engines). part "
    "broadcasts; the fact side aggregates map-side to a single row.",
    oracle="""
SELECT CAST(ROUND(SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))
                 ELSE CAST(0 AS DECIMAL(18,6)) END), 2) AS DOUBLE) AS promo_revenue,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))), 2) AS DOUBLE) AS total_revenue,
       100.0 * CAST(ROUND(SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))
                 ELSE CAST(0 AS DECIMAL(18,6)) END), 2) AS DOUBLE)
           / CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))), 2) AS DOUBLE) AS promo_pct
FROM lineitem, part
WHERE l_partkey = p_partkey
""",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    price = F.col("l_extendedprice").cast(DEC)
    disc = F.col("l_discount").cast(DEC)
    rev = price * (F.lit(1) - disc)
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast(DEC))
    out = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(mf.agg_sum(promo), 2).cast("double").alias("promo_revenue"),
            F.round(mf.agg_sum(rev), 2).cast("double").alias("total_revenue"),
        )
    )
    return out.select(
        "promo_revenue",
        "total_revenue",
        (F.lit(100.0) * F.col("promo_revenue") / F.col("total_revenue")).alias("promo_pct"),
    )


@register(
    "q15_top_supplier",
    doc="TPC-H Q15 shape: the revenue view + scalar-max subquery — suppliers "
    "whose quarter revenue equals the global maximum. The per-supplier "
    "aggregate is computed ONCE and reused for both the max scalar and the "
    "equality filter (self-referencing view decorrelated to a 1-row "
    "broadcast cross-join); the comparison happens on the exact DECIMAL "
    "sums, not on rounded doubles, so ties are decided identically on both "
    "engines.",
    oracle="""
WITH rev AS (
  SELECT l_suppkey,
         SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))) AS total
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name,
       CAST(ROUND(rev.total, 2) AS DOUBLE) AS total_revenue
FROM supplier s, rev
WHERE s.s_suppkey = rev.l_suppkey
  AND rev.total = (SELECT MAX(total) FROM rev)
""",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    supp = table(spark, sf_dir, "supplier")
    price = F.col("l_extendedprice").cast(DEC)
    disc = F.col("l_discount").cast(DEC)
    # the per-supplier aggregate feeds both the max-scalar and the final
    # compare; persist it (small: one row per supplier) instead of paying a
    # second fact scan — exchange reuse does not fire across the two uses
    rev = li.groupBy("l_suppkey").agg(
        mf.agg_sum(price * (F.lit(1) - disc)).alias("total")
    ).persist()
    top = rev.agg(F.max("total").alias("max_total"))
    return (
        rev.crossJoin(F.broadcast(top))
        .filter(F.col("total") == F.col("max_total"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey", "s_name", F.round(F.col("total"), 2).cast("double").alias("total_revenue")
        )
    )


@register(
    "q8_market_share",
    doc="TPC-H Q8 shape: national market share — one nation's fraction of "
    "region revenue for one part type per order year, as a conditional "
    "aggregate ratio over a seven-table join. Both numerator and "
    "denominator come from ONE aggregate pass; the type-filtered part dim "
    "prunes the fact side FIRST (broadcast semi effect of the inner join), "
    "customer-side region membership and supplier-side nation name ride "
    "two independent broadcast dim chains, like q7. Shares divide exact "
    "rounded doubles, bit-identical on both engines.",
    oracle="""
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(ROUND(SUM(CASE WHEN n1.n_name = 'NATION_3'
             THEN CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))
             ELSE CAST(0 AS DECIMAL(18,6)) END), 2) AS DOUBLE) AS nation_revenue,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))), 2) AS DOUBLE) AS total_revenue,
       CAST(ROUND(SUM(CASE WHEN n1.n_name = 'NATION_3'
             THEN CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))
             ELSE CAST(0 AS DECIMAL(18,6)) END), 2) AS DOUBLE)
         / CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))), 2) AS DOUBLE) AS mkt_share
FROM lineitem, orders, customer, supplier, part, nation n1, nation n2, region
WHERE l_orderkey = o_orderkey
  AND o_custkey = c_custkey
  AND l_suppkey = s_suppkey
  AND l_partkey = p_partkey
  AND s_nationkey = n1.n_nationkey
  AND c_nationkey = n2.n_nationkey
  AND n2.n_regionkey = r_regionkey
  AND r_name = 'EUROPE'
  AND p_type = 'PROMO'
GROUP BY year(o_orderdate)
""",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    supp = table(spark, sf_dir, "supplier").join(
        F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key")
    )
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    n2 = table(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    cust = table(spark, sf_dir, "customer").join(
        F.broadcast(n2), F.col("c_nationkey") == F.col("n_nationkey")
    )
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast(DEC)
    disc = F.col("l_discount").cast(DEC)
    rev = price * (F.lit(1) - disc)
    nat = F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(F.lit(0).cast(DEC))
    out = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(mf.agg_sum(nat), 2).cast("double").alias("nation_revenue"),
            F.round(mf.agg_sum(rev), 2).cast("double").alias("total_revenue"),
        )
    )
    return out.select(
        "o_year",
        "nation_revenue",
        "total_revenue",
        (F.col("nation_revenue") / F.col("total_revenue")).alias("mkt_share"),
    )


@register(
    "q9_product_type_profit",
    doc="TPC-H Q9 shape: profit by supplier nation and order year for a "
    "part-name family ('%red%'). This testdata has no partsupp, so unit cost is the "
    "deterministic stand-in 0.6 * p_retailprice (DECIMAL constant): profit "
    "= extprice*(1-disc) - 0.6*retail*qty, summed per (nation, year). The "
    "name-family filter prunes part BEFORE its broadcast; the fact side "
    "shuffles only for the orders join and final aggregate.",
    oracle="""
SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(ROUND(SUM(
         CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))
         - CAST(0.6 AS DECIMAL(18,6)) * CAST(p_retailprice AS DECIMAL(18,6)) * CAST(l_quantity AS DECIMAL(18,6))
       ), 2) AS DOUBLE) AS profit
FROM lineitem, orders, supplier, part, nation
WHERE l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey
  AND l_partkey = p_partkey
  AND s_nationkey = n_nationkey
  AND p_name LIKE '%red%'
GROUP BY n_name, year(o_orderdate)
""",
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    nation = table(spark, sf_dir, "nation")
    supp = table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast(DEC)
    disc = F.col("l_discount").cast(DEC)
    profit = price * (F.lit(1) - disc) - (
        F.lit(0.6).cast(DEC) * F.col("p_retailprice").cast(DEC) * F.col("l_quantity").cast(DEC)
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("n_name", F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(F.round(mf.agg_sum(profit), 2).cast("double").alias("profit"))
    )


@register(
    "q19_disjunctive_predicate",
    doc="TPC-H Q19 shape: revenue under an OR-of-ANDs predicate spanning "
    "both join sides (brand/size bands on part x quantity bands on "
    "lineitem). The per-side conjuncts that appear in EVERY disjunct are "
    "hoisted so they push to the parquet scans (quantity <= 30, size >= "
    "1); the cross-side residual stays on the broadcast hash join — the "
    "shape Catalyst plans for disjunctive join predicates. Single "
    "aggregate output, DECIMAL-exact.",
    oracle="""
SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))), 2) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND ((p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 10)
    OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20 AND l_quantity BETWEEN 10 AND 20)
    OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 30 AND l_quantity BETWEEN 20 AND 30))
""",
)
def q19_disjunctive_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    qty = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 10) & qty.between(1, 10))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 20) & qty.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 30) & qty.between(20, 30))
    )
    price = F.col("l_extendedprice").cast(DEC)
    disc = F.col("l_discount").cast(DEC)
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(
            F.round(mf.agg_sum(price * (F.lit(1) - disc)), 2).cast("double").alias("revenue"),
            mf.agg_count().alias("n_lines"),
        )
    )


@register(
    "training_shuffle_order",
    doc="Deterministic epoch shuffle for training-data layout: every "
    "document gets its global position in hash order (a reproducible "
    "permutation — stable under repartitioning and retries, unlike any "
    "RNG shuffle) plus a round-robin shard. The global rank is NOT a "
    "single-partition ROW_NUMBER: position = exclusive bucketed prefix "
    "sum of 1 over order-aligned hash-range buckets (hash >> 22 is an "
    "order prefix of the 2^30 hash), so the plan is one exchange + "
    "parallel per-bucket windows + an O(buckets) offset window — the same "
    "skew-proof machinery as pack_sequences, reused for ordering itself.",
    oracle=f"""
SELECT doc_id,
       ROW_NUMBER() OVER (ORDER BY {_BUCKET.format(s="CAST(doc_id AS VARCHAR)", n=1073741824)}, doc_id) - 1 AS position,
       CAST((ROW_NUMBER() OVER (ORDER BY {_BUCKET.format(s="CAST(doc_id AS VARCHAR)", n=1073741824)}, doc_id) - 1) % 8 AS BIGINT) AS shard
FROM documents
""",
)
def training_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    from milan_spark.operators.packing import bucketed_prefix_sum
    from milan_spark.operators.sampling import hash_bucket

    docs = table(spark, sf_dir, "documents").select("doc_id")
    h = docs.withColumn("__h", hash_bucket("doc_id", 1_073_741_824))
    ranked = bucketed_prefix_sum(
        h,
        F.lit(1).cast("long"),
        ["__h", "doc_id"],
        F.shiftright("__h", 22),
        alias="position",
    )
    return ranked.select("doc_id", "position", (F.col("position") % 8).alias("shard"))


@register(
    "q12_late_priority_lines",
    doc="TPC-H Q12 shape (conditional aggregation over a fact-fact join): "
    "lines shipped more than 45 days after their order date, classified by "
    "return flag (the schema's stand-in for shipmode), counting high- vs "
    "low-priority orders per class. Both sides shuffle once on orderkey "
    "(orders projected to 2 columns before the exchange); the CASE "
    "aggregation is map-side combinable, so the post-join groupBy on the "
    "3-value flag is a few-row exchange. At 100 TB the late-shipment filter "
    "cannot push below the join (it correlates both sides), but the narrow "
    "projection keeps the shuffle payload minimal.",
    oracle="""
SELECT l.l_returnflag AS ship_class,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o, lineitem l
WHERE o.o_orderkey = l.l_orderkey
  AND l.l_shipdate > o.o_orderdate + INTERVAL 45 DAY
GROUP BY l.l_returnflag
""",
)
def q12_late_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_returnflag", "l_shipdate")
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 45 DAYS"))
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            mf.agg_sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            mf.agg_sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


@register(
    "q13_customer_order_distribution",
    doc="TPC-H Q13 shape (left outer join + count + distribution-of-counts): "
    "how many customers placed exactly N qualifying orders, including N=0. "
    "Scale plan: the orders side is aggregated to (custkey, count) BEFORE "
    "the outer join — the classic Q13 plan that joins raw orders to "
    "customer and then groups pays a fan-out shuffle of every order row; "
    "aggregating first means the join carries one row per active customer, "
    "and the final distribution groupBy is a few-hundred-row exchange. "
    "COALESCE(cnt, 0) reinstates never-ordered customers.",
    oracle="""
WITH per_cust AS (
  SELECT c.c_custkey,
         COALESCE(oc.cnt, 0) AS n_orders
  FROM customer c
  LEFT JOIN (
    SELECT o_custkey, COUNT(*) AS cnt
    FROM orders
    WHERE o_orderpriority <> '4-NOT SPECIFIED'
    GROUP BY o_custkey
  ) oc ON oc.o_custkey = c.c_custkey
)
SELECT n_orders, COUNT(*) AS n_customers
FROM per_cust
GROUP BY n_orders
""",
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").select("c_custkey")
    oc = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "4-NOT SPECIFIED")
        .groupBy("o_custkey")
        .agg(mf.agg_count().alias("cnt"))
    )
    return (
        cust.join(oc, cust.c_custkey == oc.o_custkey, "left")
        .select(F.coalesce(F.col("cnt"), F.lit(0)).alias("n_orders"))
        .groupBy("n_orders")
        .agg(mf.agg_count().alias("n_customers"))
    )


@register(
    "q11_important_part_value",
    doc="TPC-H Q11 shape (HAVING against a global scalar subquery): per-part "
    "shipped value restricted to suppliers of five nations, keeping parts "
    "whose value exceeds 1/1200 of the scoped total. The schema has no "
    "partsupp table, so shipped lineitem value stands in for stock value — "
    "the plan shape is identical: scope (broadcast semi-join on the "
    "filtered supplier dim) → per-key decimal aggregate (persisted: it "
    "feeds both the 1-row total and the final compare, and measured plans "
    "showed exchange reuse does NOT fire across the two uses — without the "
    "persist each use re-scans the fact table) → "
    "broadcast compare, multiplied through (value·1200 > total) so the "
    "threshold is DECIMAL-exact. The per-part aggregate is the only "
    "full-fact shuffle.",
    oracle="""
WITH scoped AS (
  SELECT l.l_partkey, CAST(l.l_extendedprice AS DECIMAL(18,6)) AS v
  FROM lineitem l, supplier s
  WHERE s.s_suppkey = l.l_suppkey AND s.s_nationkey IN (0, 5, 10, 15, 20)
),
per_part AS (
  SELECT l_partkey, SUM(v) AS pv FROM scoped GROUP BY l_partkey
),
tot AS (SELECT SUM(pv) AS total_v FROM per_part)
SELECT per_part.l_partkey, CAST(ROUND(pv, 2) AS DOUBLE) AS part_value
FROM per_part, tot
WHERE pv * 1200 > tot.total_v
""",
)
def q11_important_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_extendedprice")
    supp_keys = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_nationkey").isin(0, 5, 10, 15, 20))
        .select("s_suppkey")
    )
    per_part = (
        li.join(F.broadcast(supp_keys), li.l_suppkey == supp_keys.s_suppkey, "semi")
        .groupBy("l_partkey")
        .agg(mf.agg_sum(F.col("l_extendedprice").cast(DEC)).alias("pv"))
    )
    per_part = per_part.persist()  # both the total and the compare read it;
    # without the persist each use re-scans the fact table (no exchange reuse)
    tot = per_part.agg(mf.agg_sum(F.col("pv")).alias("total_v"))
    return (
        per_part.crossJoin(F.broadcast(tot))
        .filter(F.col("pv") * 1200 > F.col("total_v"))
        .select("l_partkey", F.round(F.col("pv"), 2).cast("double").alias("part_value"))
    )


@register(
    "referential_integrity_audit",
    doc="Data-quality audit (the pre-ingest conformance gate a 100 TB "
    "pipeline runs before anything else): orphaned foreign keys counted "
    "for lineitem→orders, lineitem→part, lineitem→supplier, and "
    "orders→customer in ONE pass per fact table — each check is a "
    "broadcast-or-shuffled left-anti join projected to the key column "
    "only, so the audit's shuffle payload is one bigint per row; the "
    "four counts union into a single tiny result. No row data moves, "
    "only keys.",
    oracle="""
SELECT 'lineitem->orders' AS fk, COUNT(*) AS n_orphans FROM lineitem l
  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
UNION ALL
SELECT 'lineitem->part', COUNT(*) FROM lineitem l
  WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
UNION ALL
SELECT 'lineitem->supplier', COUNT(*) FROM lineitem l
  WHERE NOT EXISTS (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)
UNION ALL
SELECT 'orders->customer', COUNT(*) FROM orders o
  WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
""",
)
def referential_integrity_audit_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")

    def orphans(fact, key, dim, dim_key, label):
        return (
            fact.select(key)
            .join(F.broadcast(table(spark, sf_dir, dim).select(dim_key)),
                  F.col(key) == F.col(dim_key), "left_anti")
            .agg(mf.agg_count().alias("n_orphans"))
            .select(F.lit(label).alias("fk"), "n_orphans")
        )

    return (
        orphans(li, "l_orderkey", "orders", "o_orderkey", "lineitem->orders")
        .unionByName(orphans(li, "l_partkey", "part", "p_partkey", "lineitem->part"))
        .unionByName(orphans(li, "l_suppkey", "supplier", "s_suppkey", "lineitem->supplier"))
        .unionByName(orphans(orders, "o_custkey", "customer", "c_custkey", "orders->customer"))
    )


@register(
    "table_profile",
    doc="One-pass column profiling (the other data-quality staple): per "
    "numeric column of lineitem — null count, min, max, decimal-exact "
    "rounded sum; plus row count and exact distinct keys. ONE aggregate "
    "over one scan for all columns simultaneously (a naive per-column "
    "loop scans the table N times); distincts ride the same pass as "
    "count_distinct partials. Doubles derive from DECIMAL sums, so the "
    "profile is bit-stable under any partitioning.",
    oracle="""
SELECT COUNT(*) AS n_rows,
       COUNT(DISTINCT l_orderkey) AS distinct_orders,
       COUNT(DISTINCT l_partkey) AS distinct_parts,
       CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS qty_nulls,
       MIN(l_quantity) AS qty_min, MAX(l_quantity) AS qty_max,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS qty_sum,
       MIN(l_extendedprice) AS price_min, MAX(l_extendedprice) AS price_max,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS price_sum,
       MIN(l_shipdate) AS ship_min, MAX(l_shipdate) AS ship_max
FROM lineitem
""",
)
def table_profile_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity")
    price = F.col("l_extendedprice")
    return li.agg(
        mf.agg_count().alias("n_rows"),
        F.count_distinct(F.col("l_orderkey")).alias("distinct_orders"),
        F.count_distinct(F.col("l_partkey")).alias("distinct_parts"),
        mf.agg_sum(F.when(qty.isNull(), 1).otherwise(0)).cast("long").alias("qty_nulls"),
        F.min(qty).alias("qty_min"),
        F.max(qty).alias("qty_max"),
        F.round(mf.agg_sum(qty.cast(DEC)), 2).cast("double").alias("qty_sum"),
        F.min(price).alias("price_min"),
        F.max(price).alias("price_max"),
        F.round(mf.agg_sum(price.cast(DEC)), 2).cast("double").alias("price_sum"),
        F.min("l_shipdate").alias("ship_min"),
        F.max("l_shipdate").alias("ship_max"),
    )


@register(
    "weighted_sample_orders",
    doc="Weighted sampling WITHOUT replacement (operators.sampling."
    "weighted_sample; Efraimidis-Spirakis A-ES, IPL 2006): 10 orders per "
    "priority with inclusion probability proportional to o_totalprice — "
    "the data-mixing primitive for importance-weighted corpus selection. "
    "The exponential key -ln(u)/w uses the record's deterministic content "
    "hash as u (task retries cannot resample it, unlike rand()); the same "
    "two-phase composite-key top-n as stratified_sample caps any task at "
    "~1/32 of the heaviest stratum. Ranked on the key ROUNDED to 9 "
    "decimals with an id tie-break, so a last-ulp ln() disagreement "
    "cannot flip the order across engines (the bm25 discipline).",
    oracle=f"""
WITH es AS (
  SELECT o_orderkey, o_orderpriority,
         round(-ln(CAST(({_BUCKET.format(s="CAST(o_orderkey AS VARCHAR)", n=1073741824)}
                         * 2654435761) % 2147483647 + 1 AS DOUBLE) / 2147483648e0)
               / CAST(o_totalprice AS DOUBLE), 9) AS es_key
  FROM orders WHERE o_totalprice > 0
)
SELECT o_orderkey, o_orderpriority, es_key, sample_rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                               ORDER BY es_key, o_orderkey) AS sample_rank
  FROM es
) WHERE sample_rank <= 10
""",
)
def weighted_sample_orders_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from milan_spark.operators.sampling import weighted_sample

    orders = table(spark, sf_dir, "orders")
    return weighted_sample(
        orders, ["o_orderpriority"], 10, "o_orderkey", "o_totalprice"
    ).select("o_orderkey", "o_orderpriority", "es_key", "sample_rank")


@register(
    "conversion_funnel",
    doc="Ordered 3-step conversion funnel (view -> click within 30d -> "
    "purchase within 30d, strict event-time order) — the sequential-"
    "pattern query every product-analytics engine ships and the "
    "reference's keyed aggregation cannot express in one pass. Shape: "
    "ONE combinable shuffle collects each user's (ts, type) pairs; the "
    "funnel walk is row-local array algebra (array_sort + filter on the "
    "sorted struct array — JVM higher-order functions, no Python, no "
    "per-step self-join over the fact table). Per-user fan-in is bounded "
    "by the user's event count, the same trade _copart_pairs documents. "
    "The oracle re-derives the funnel as chained per-step MIN joins — "
    "two independent formulations, one answer.",
    oracle="""
WITH v AS (
  SELECT user_id, MIN(ts) AS v_ts FROM events
  WHERE event_type = 'view' AND user_id IS NOT NULL GROUP BY 1
), c AS (
  SELECT e.user_id, MIN(e.ts) AS c_ts FROM events e JOIN v USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > v.v_ts
    AND e.ts <= v.v_ts + INTERVAL 30 DAY
  GROUP BY 1
), p AS (
  SELECT e.user_id, MIN(e.ts) AS p_ts FROM events e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
    AND e.ts <= c.c_ts + INTERVAL 30 DAY
  GROUP BY 1
)
SELECT * FROM (
  SELECT 1 AS stage_idx, 'view' AS stage, (SELECT COUNT(*) FROM v) AS users
  UNION ALL
  SELECT 2, 'click', (SELECT COUNT(*) FROM c)
  UNION ALL
  SELECT 3, 'purchase', (SELECT COUNT(*) FROM p)
)
""",
)
def conversion_funnel_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        table(spark, sf_dir, "events")
        .filter(
            F.col("user_id").isNotNull()
            & F.col("event_type").isin("view", "click", "purchase")
        )
        .select("user_id", "event_type", "ts")
    )
    per_user = ev.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("ts"), F.col("event_type").alias("et")))
        ).alias("seq")
    )
    day30 = F.expr("INTERVAL 30 DAY")
    # seq is ts-sorted, so try_element_at(filter(...), 1) is the EARLIEST
    # match, NULL when the stage is never reached (a user with no 'view'
    # must yield NULL, not an ANSI out-of-bounds error)
    v_ts = F.try_element_at(
        F.filter(F.col("seq"), lambda x: x["et"] == "view"), F.lit(1)
    )["ts"]
    stages = per_user.select(F.col("user_id"), v_ts.alias("v_ts"), F.col("seq"))
    c_ts = F.try_element_at(
        F.filter(
            F.col("seq"),
            lambda x: (x["et"] == "click")
            & (x["ts"] > F.col("v_ts"))
            & (x["ts"] <= F.col("v_ts") + day30),
        ),
        F.lit(1),
    )["ts"]
    stages = stages.select("user_id", "v_ts", c_ts.alias("c_ts"), "seq")
    p_ts = F.try_element_at(
        F.filter(
            F.col("seq"),
            lambda x: (x["et"] == "purchase")
            & (x["ts"] > F.col("c_ts"))
            & (x["ts"] <= F.col("c_ts") + day30),
        ),
        F.lit(1),
    )["ts"]
    stages = stages.select("user_id", "v_ts", "c_ts", p_ts.alias("p_ts"))
    counts = stages.agg(
        F.count("v_ts").alias("n_v"),
        F.count("c_ts").alias("n_c"),
        F.count("p_ts").alias("n_p"),
    )
    return counts.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit(1).alias("stage_idx"),
                    F.lit("view").alias("stage"),
                    F.col("n_v").alias("users"),
                ),
                F.struct(
                    F.lit(2).alias("stage_idx"),
                    F.lit("click").alias("stage"),
                    F.col("n_c").alias("users"),
                ),
                F.struct(
                    F.lit(3).alias("stage_idx"),
                    F.lit("purchase").alias("stage"),
                    F.col("n_p").alias("users"),
                ),
            )
        ).alias("s")
    ).select("s.stage_idx", "s.stage", "s.users")


@register(
    "retention_cohorts",
    doc="Weekly retention-cohort matrix — the second canonical product-"
    "analytics shape: users cohorted by the Monday week of their FIRST "
    "event, counted as retained in each of weeks +0..+3 they were active "
    "in. Two combinable shuffles total: per-user first-event min, and "
    "the distinct (user, week) activity set joined back (broadcast-able "
    "cohort side is O(users)); the (cohort, week_k) count is map-side "
    "combinable. Calendar math is date_trunc('week')/date_diff — exact "
    "int days, identical Monday-start convention in both engines.",
    oracle="""
WITH first_ev AS (
  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
  FROM events WHERE user_id IS NOT NULL GROUP BY 1
), activity AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS act_week
  FROM events WHERE user_id IS NOT NULL
)
SELECT f.cohort_week,
       CAST(date_diff('day', f.cohort_week, a.act_week) // 7 AS INT) AS week_k,
       COUNT(DISTINCT f.user_id) AS active_users
FROM first_ev f JOIN activity a USING (user_id)
WHERE date_diff('day', f.cohort_week, a.act_week) // 7 BETWEEN 0 AND 3
GROUP BY 1, 2
""",
)
def retention_cohorts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    first_ev = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("act_week")
    ).distinct()
    week_k = (F.datediff(F.col("act_week"), F.col("cohort_week")) / 7).cast("int")
    return (
        first_ev.join(activity, "user_id")
        .withColumn("week_k", week_k)
        .filter(F.col("week_k").between(0, 3))
        .groupBy("cohort_week", "week_k")
        .agg(F.count_distinct("user_id").alias("active_users"))
    )


def _corr_matrix_oracle() -> str:
    """Pairwise-Pearson oracle generated from the SAME column list and the
    SAME expression tree the Spark builder uses (one f-string loop builds
    both sides, so the 15 power sums and 6 corr formulas cannot drift)."""
    cols = _CORR_COLS
    # DECIMAL(30,6) operands: DuckDB multiplies DECIMAL(18,6) pairs in int64
    # and overflows on price² ticks; 30 digits forces int128. The VALUES are
    # exact either way, so the Spark side's decimal(18,6)→(37,12) products
    # land on identical numbers.
    sums = ["CAST(COUNT(*) AS DOUBLE) AS n"]
    for a, (short_a, col_a) in enumerate(cols):
        sums.append(
            f"CAST(ROUND(SUM(CAST({col_a} AS DECIMAL(30,6))), 6) AS DOUBLE) AS s_{short_a}"
        )
        for short_b, col_b in cols[a:]:
            sums.append(
                f"CAST(ROUND(SUM(CAST({col_a} AS DECIMAL(30,6)) * CAST({col_b} AS DECIMAL(30,6))), 6) AS DOUBLE)"
                f" AS ss_{short_a}_{short_b}"
            )
    legs = []
    for a, (sa, _) in enumerate(cols):
        for sb, _ in cols[a + 1 :]:
            legs.append(
                f"""SELECT '{sa}' AS col_a, '{sb}' AS col_b, CAST(n AS BIGINT) AS n_rows,
       (ss_{sa}_{sb} - s_{sa} * s_{sb} / n)
         / (sqrt(ss_{sa}_{sa} - s_{sa} * s_{sa} / n) * sqrt(ss_{sb}_{sb} - s_{sb} * s_{sb} / n)) AS corr
FROM sums"""
            )
    return (
        "WITH sums AS (\n  SELECT " + ",\n         ".join(sums) + "\n  FROM lineitem\n)\n"
        + "\nUNION ALL\n".join(legs)
    )


_CORR_COLS = [
    ("qty", "l_quantity"),
    ("price", "l_extendedprice"),
    ("disc", "l_discount"),
    ("tax", "l_tax"),
]


@register(
    "feature_correlation_matrix",
    doc="Pairwise Pearson correlation matrix over the four lineitem measures "
    "(feature-screening profile, tidy rows): ONE pass computes all 15 exact "
    "DECIMAL power sums as a single combinable aggregate (no per-pair "
    "rescans — the multi-pair generalization of stats_moments), then each "
    "of the 6 correlations is the identical IEEE double formula on both "
    "engines. At 100 TB this stays one scan + one 1-row reduce; the "
    "pair-expansion is driver-free column algebra on the single result "
    "row.",
    oracle=_corr_matrix_oracle(),
)
def feature_correlation_matrix_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")

    def dsum(c, name):
        return F.round(mf.agg_sum(c), 6).cast("double").alias(name)

    aggs = [mf.agg_count().cast("double").alias("n")]
    for a, (sa, ca) in enumerate(_CORR_COLS):
        x = F.col(ca).cast(DEC)
        aggs.append(dsum(x, f"s_{sa}"))
        for sb, cb in _CORR_COLS[a:]:
            aggs.append(dsum(x * F.col(cb).cast(DEC), f"ss_{sa}_{sb}"))
    sums = li.agg(*aggs)
    # ONE aggregate row exploded into the 6 pair rows — a per-leg union would
    # plan 6 scans of lineitem; this keeps exactly one
    n = F.col("n")
    pair_structs = []
    for a, (sa, _) in enumerate(_CORR_COLS):
        for sb, _ in _CORR_COLS[a + 1 :]:
            sx, sy = F.col(f"s_{sa}"), F.col(f"s_{sb}")
            sxx, syy = F.col(f"ss_{sa}_{sa}"), F.col(f"ss_{sb}_{sb}")
            sxy = F.col(f"ss_{sa}_{sb}")
            corr = (sxy - sx * sy / n) / (
                F.sqrt(sxx - sx * sx / n) * F.sqrt(syy - sy * sy / n)
            )
            pair_structs.append(
                F.struct(
                    F.lit(sa).alias("col_a"),
                    F.lit(sb).alias("col_b"),
                    corr.alias("corr"),
                )
            )
    return sums.select(
        n.cast("long").alias("n_rows"), F.explode(F.array(*pair_structs)).alias("p")
    ).select("p.col_a", "p.col_b", "n_rows", "p.corr")


_ZSCORE_ORACLE = """
WITH v AS (
  SELECT event_id, user_id, CAST(floor(value * 100 + 0.5) AS BIGINT) AS v FROM events
), pre AS (
  SELECT event_id, user_id, v,
         COUNT(*) OVER w AS n,
         SUM(v) OVER w AS s,
         SUM(v * v) OVER w AS s2
  FROM v
  WINDOW w AS (PARTITION BY user_id ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT event_id, user_id, v AS value_cents, CAST(n AS BIGINT) AS n_prior
FROM pre
WHERE n >= 8 AND (v * n - s) * (v * n - s) > 9 * (n * s2 - s * s)
"""


@register(
    "zscore_anomaly",
    doc="Per-key running z-score anomaly flags (monitoring staple): an event "
    "is anomalous when it sits >3 running standard deviations from the "
    "mean of its key's PRIOR events (n_prior ≥ 8). The z² > 9 test is "
    "cross-multiplied into pure integer arithmetic — (v·n − s)² > "
    "9·(n·s2 − s²) over exact cents sums, DECIMAL(38)-widened so the "
    "squares cannot overflow at any key cardinality — so the flag set is "
    "bit-identical on any engine (a float z-score would flip borderline "
    "events under reordered partial sums). One shuffle on the key, one "
    "running window — the same plan at 100 TB.",
    oracle=_ZSCORE_ORACLE,
)
def zscore_anomaly_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    v = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    w = (
        W.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    d38 = "decimal(38,0)"
    pre = ev.select(
        "event_id",
        "user_id",
        v.alias("v"),
        F.count(F.lit(1)).over(w).alias("n"),
        # widen BEFORE the sum: a long running sum would overflow before the
        # decimal cast on hot keys at extreme scale (DuckDB sums in int128)
        F.sum(v.cast(d38)).over(w).alias("s"),
        F.sum((v * v).cast(d38)).over(w).alias("s2"),
    )
    vn = F.col("v").cast(d38) * F.col("n").cast(d38)
    lhs = (vn - F.col("s")) * (vn - F.col("s"))
    rhs = F.lit(9).cast(d38) * (
        F.col("n").cast(d38) * F.col("s2") - F.col("s") * F.col("s")
    )
    return pre.filter((F.col("n") >= 8) & (lhs > rhs)).select(
        "event_id",
        "user_id",
        F.col("v").alias("value_cents"),
        F.col("n").cast("long").alias("n_prior"),
    )


@register(
    "event_transition_matrix",
    doc="First-order Markov transition matrix over per-user event sequences "
    "(clickstream staple): LAG each user's event_id-ordered stream by one, "
    "count (from_type → to_type) transitions, and attach the row-normalized "
    "transition probability (exact BIGINT counts; one IEEE division, "
    "rounded, identical on both engines). One shuffle on the key for the "
    "window + one combinable groupBy + a tiny per-from_type reduce "
    "broadcast back — the same plan at 100 TB.",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_type
  FROM events
), trans AS (
  SELECT prev_type AS from_type, event_type AS to_type, COUNT(*) AS n_transitions
  FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2
), totals AS (
  SELECT from_type, CAST(SUM(n_transitions) AS BIGINT) AS n_from FROM trans GROUP BY 1
)
SELECT t.from_type, t.to_type, t.n_transitions,
       round(CAST(t.n_transitions AS DOUBLE) / o.n_from, 6) AS p
FROM trans t JOIN totals o ON t.from_type = o.from_type
""",
)
def event_transition_matrix_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    seq = ev.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(W.partitionBy("user_id").orderBy("event_id")).alias("prev_type"),
    )
    trans = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy(F.col("prev_type").alias("from_type"), F.col("event_type").alias("to_type"))
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    totals = trans.groupBy("from_type").agg(
        F.sum("n_transitions").cast("long").alias("n_from")
    )
    return trans.join(F.broadcast(totals), "from_type").select(
        "from_type",
        "to_type",
        "n_transitions",
        F.round(F.col("n_transitions").cast("double") / F.col("n_from"), 6).alias("p"),
    )


@register(
    "target_encode_categories",
    doc="Smoothed target encoding (the standard categorical-feature ML "
    "transform): per o_orderpriority, enc = (Σ target + m·global_mean) / "
    "(n + m) with m=10 — the additive-smoothing form that shrinks rare "
    "categories toward the prior. Sums are exact DECIMAL (round 2 → "
    "double), the blend is one IEEE expression shared verbatim by both "
    "engines. Two combinable aggregates + a one-row broadcast — the same "
    "plan at any scale.",
    oracle="""
WITH g AS (
  SELECT CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(30,6))), 2) AS DOUBLE) AS gs,
         CAST(COUNT(*) AS BIGINT) AS gn
  FROM orders
), per AS (
  SELECT o_orderpriority,
         CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(30,6))), 2) AS DOUBLE) AS s,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM orders GROUP BY 1
)
SELECT p.o_orderpriority, p.n,
       round((p.s + 10.0 * (g.gs / g.gn)) / (p.n + 10), 6) AS enc
FROM per p, g
""",
)
def target_encode_categories_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    dec = F.col("o_totalprice").cast("decimal(30,6)")
    g = orders.agg(
        F.round(F.sum(dec), 2).cast("double").alias("gs"),
        F.count(F.lit(1)).alias("gn"),
    )
    per = orders.groupBy("o_orderpriority").agg(
        F.round(F.sum(dec), 2).cast("double").alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    return per.crossJoin(F.broadcast(g)).select(
        "o_orderpriority",
        "n",
        F.round(
            (F.col("s") + F.lit(10.0) * (F.col("gs") / F.col("gn")))
            / (F.col("n") + F.lit(10)),
            6,
        ).alias("enc"),
    )


@register(
    "self_join_size_estimate",
    doc="Join-cardinality estimation by coordinated key sampling "
    "(operators.sketch.join_size_estimate — the F2/end-biased estimator): "
    "the self-join size Sum f(k)^2 of lineitem on l_partkey from the 1/16 "
    "of keys whose deterministic hash falls lowest, scaled back by 16. "
    "This is the skew diagnostic an optimizer prices a shuffle with "
    "before running it; the row-local key filter drops shuffle volume "
    "16x before the combinable count. Deterministic hash -> the estimate "
    "is a pure function of the input, so the oracle replays it exactly.",
    oracle=f"""
WITH k AS (
  SELECT l_partkey AS key, COUNT(*) AS f FROM lineitem
  WHERE {_BUCKET.format(s="CAST(l_partkey AS VARCHAR)", n=1073741824)} < 67108864
  GROUP BY 1
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_sampled_keys,
       CAST(COALESCE(SUM(f * f), 0) AS BIGINT) AS sampled_pairs,
       CAST(COALESCE(SUM(f * f), 0) * 16 AS BIGINT) AS est_pairs
FROM k
""",
)
def self_join_size_estimate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from milan_spark.operators.sketch import join_size_estimate

    li = table(spark, sf_dir, "lineitem")
    return join_size_estimate(li, "l_partkey", sample_den=16)


@register(
    "event_sessionization",
    doc="Sessionization (session-id assignment): per-user sessions split at "
    "30-minute inactivity gaps — LAG + cumulative new-session flags (the "
    "gaps-and-islands device on timestamps), then one combinable rollup "
    "per session: event count, exact microsecond start/end/duration. One "
    "key-partitioned window exchange over (user, ts, event_id)-ordered "
    "rows; ties broken on event_id so the split is engine-exact.",
    oracle="""
WITH base AS (
  SELECT user_id, event_id, epoch_ns(ts) // 1000 AS ts_us
  FROM events WHERE user_id IS NOT NULL
), flagged AS (
  SELECT user_id, event_id, ts_us,
         CASE WHEN ts_us - LAG(ts_us) OVER w > 1800000000
              OR LAG(ts_us) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
  FROM base WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
), sess AS (
  SELECT user_id, event_id, ts_us,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_idx
  FROM flagged
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       COUNT(*) AS n_events,
       MIN(ts_us) AS start_us, MAX(ts_us) AS end_us,
       MAX(ts_us) - MIN(ts_us) AS duration_us
FROM sess GROUP BY 1, 2
""",
)
def event_sessionization_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    base = (
        table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select("user_id", "event_id", F.unix_micros("ts").alias("ts_us"))
    )
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    flagged = base.withColumn(
        "new_sess",
        F.when(
            F.lag("ts_us").over(w).isNull()
            | (F.col("ts_us") - F.lag("ts_us").over(w) > 1_800_000_000),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    sess = flagged.withColumn(
        "session_idx",
        F.sum("new_sess").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)).cast("long"),
    )
    return sess.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_us").alias("start_us"),
        F.max("ts_us").alias("end_us"),
        (F.max("ts_us") - F.min("ts_us")).alias("duration_us"),
    )


@register(
    "winsorized_value_stats",
    doc="Winsorized (p95-clipped) robust statistics per event type — the "
    "outlier-capped feature the raw mean is not: the exact discrete p95 "
    "(value at rank ceil(95n/100) in cents, integer rank arithmetic — "
    "no float interpolation) caps every value above it, then one "
    "combinable aggregate emits n, the cap, clipped sum, and the clipped "
    "mean as a single exact-int division pair. Per-type partitions are "
    "domain-bounded (5 event types), so the rank window is cheap here; "
    "the selection-based exact_quantiles operator is the 100 TB path for "
    "high-cardinality strata (quantile_selection_prices demonstrates it).",
    oracle="""
WITH base AS (
  SELECT event_type, event_id, CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE event_type IS NOT NULL
), ranked AS (
  SELECT event_type, cents,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY cents, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM base
), p95 AS (
  SELECT event_type, MIN(cents) AS p95_cents
  FROM ranked WHERE rn >= CAST(ceil(95 * n / 100.0) AS BIGINT) GROUP BY 1
)
SELECT b.event_type, COUNT(*) AS n, p.p95_cents,
       CAST(SUM(LEAST(b.cents, p.p95_cents)) AS BIGINT) AS clipped_sum_cents,
       CAST(SUM(LEAST(b.cents, p.p95_cents)) AS DOUBLE) / COUNT(*) AS clipped_mean_cents
FROM base b JOIN p95 p USING (event_type)
GROUP BY 1, 3
""",
)
def winsorized_value_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    base = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type").isNotNull())
        .select(
            "event_type",
            "event_id",
            F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
        )
    )
    w = W.partitionBy("event_type").orderBy("cents", "event_id")
    ranked = base.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(W.partitionBy("event_type"))
    )
    p95 = (
        ranked.filter(F.col("rn") >= F.ceil(95 * F.col("n") / 100.0).cast("long"))
        .groupBy("event_type")
        .agg(F.min("cents").alias("p95_cents"))
    )
    clipped = base.join(F.broadcast(p95), "event_type").select(
        "event_type", "p95_cents", F.least("cents", F.col("p95_cents")).alias("cc")
    )
    return clipped.groupBy("event_type", "p95_cents").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cc").alias("clipped_sum_cents"),
        (F.sum("cc").cast("double") / F.count(F.lit(1))).alias("clipped_mean_cents"),
    ).select("event_type", "n", "p95_cents", "clipped_sum_cents", "clipped_mean_cents")


@register(
    "twap_user_value",
    doc="Time-weighted average (the TWAP/monitoring-gauge aggregate): each "
    "observation weighted by its holding interval to the next event "
    "(LEAD), exact microsecond-by-cents products accumulated in "
    "DECIMAL(38,0) — order-independent exact sums far past int64 — and "
    "ONE final exact-decimal-to-double division rounded to 4 places. "
    "One key-partitioned window exchange + one combinable aggregate; "
    "users with a single event (no interval) drop out by definition.",
    oracle="""
WITH base AS (
  SELECT user_id, event_id, epoch_ns(ts) // 1000 AS ts_us,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE user_id IS NOT NULL
), iv AS (
  SELECT user_id, cents,
         LEAD(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) - ts_us
           AS dur_us
  FROM base
)
SELECT user_id,
       COUNT(*) AS n_intervals,
       CAST(SUM(dur_us) AS BIGINT) AS total_dur_us,
       round(CAST(SUM(CAST(cents AS DECIMAL(38,0)) * CAST(dur_us AS DECIMAL(38,0))) AS DOUBLE)
             / CAST(SUM(dur_us) AS DOUBLE), 4) AS twap_cents
FROM iv WHERE dur_us IS NOT NULL AND dur_us > 0
GROUP BY 1
""",
)
def twap_user_value_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    base = (
        table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select(
            "user_id",
            "event_id",
            F.unix_micros("ts").alias("ts_us"),
            F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
        )
    )
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    iv = base.select(
        "user_id", "cents", (F.lead("ts_us").over(w) - F.col("ts_us")).alias("dur_us")
    ).filter(F.col("dur_us").isNotNull() & (F.col("dur_us") > 0))
    d38 = "decimal(38,0)"
    return iv.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum("dur_us").cast("long").alias("total_dur_us"),
        F.round(
            F.sum(F.col("cents").cast(d38) * F.col("dur_us").cast(d38)).cast("double")
            / F.sum("dur_us").cast("double"),
            4,
        ).alias("twap_cents"),
    )


@register(
    "sequence_pattern_counts",
    doc="Sequential-pattern counting (the MATCH_RECOGNIZE-lite every "
    "clickstream stack ships): each user's event-type history becomes one "
    "letter string in (ts, event_id) order — built with ONE combinable "
    "shuffle (sorted struct array -> transform -> join, all JVM higher-"
    "order functions, no Python) — and occurrences of the "
    "view->click->purchase motif count by non-overlapping left-to-right "
    "REPLACE arithmetic, the same algorithm in both engines. Per-user "
    "strings are event-count-bounded (the _copart_pairs trade, stated).",
    oracle="""
WITH base AS (
  SELECT user_id, epoch_ns(ts) // 1000 AS ts_us, event_id,
         CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
              WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's' ELSE 'e' END AS letter
  FROM events WHERE user_id IS NOT NULL
), seqs AS (
  SELECT user_id, string_agg(letter, '' ORDER BY ts_us, event_id) AS s
  FROM base GROUP BY 1
)
SELECT user_id, CAST(length(s) AS BIGINT) AS seq_len,
       CAST((length(s) - length(replace(s, 'vcp', ''))) // 3 AS BIGINT) AS n_vcp
FROM seqs
""",
)
def sequence_pattern_counts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = (
        table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select(
            "user_id",
            F.unix_micros("ts").alias("ts_us"),
            "event_id",
            F.when(F.col("event_type") == "view", "v")
            .when(F.col("event_type") == "click", "c")
            .when(F.col("event_type") == "purchase", "p")
            .when(F.col("event_type") == "signup", "s")
            .otherwise("e")
            .alias("letter"),
        )
    )
    seqs = base.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts_us", "event_id", "letter"))
                ),
                lambda x: x["letter"],
            ),
            "",
        ).alias("s")
    )
    return seqs.select(
        "user_id",
        F.length("s").cast("long").alias("seq_len"),
        ((F.length("s") - F.length(F.replace(F.col("s"), F.lit("vcp"), F.lit("")))) / 3)
        .cast("long")
        .alias("n_vcp"),
    )


@register(
    "feature_binning_ntile",
    doc="Equal-frequency feature binning (NTILE decile bins per event type "
    "over exact cents, (cents, event_id) tie order so bin edges are "
    "engine-exact) — the discretization step before target encoding or "
    "monotonic-feature models. One window exchange + one combinable "
    "rollup: per-bin count, min/max cents (the bin-edge table a scorer "
    "ships).",
    oracle="""
WITH base AS (
  SELECT event_type, event_id, CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE event_type IS NOT NULL
), binned AS (
  SELECT event_type, cents,
         NTILE(10) OVER (PARTITION BY event_type ORDER BY cents, event_id) AS bin
  FROM base
)
SELECT event_type, CAST(bin AS INT) AS bin, COUNT(*) AS n,
       MIN(cents) AS lo_cents, MAX(cents) AS hi_cents
FROM binned GROUP BY 1, 2
""",
)
def feature_binning_ntile_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    base = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type").isNotNull())
        .select(
            "event_type",
            "event_id",
            F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
        )
    )
    w = W.partitionBy("event_type").orderBy("cents", "event_id")
    return (
        base.withColumn("bin", F.ntile(10).over(w).cast("int"))
        .groupBy("event_type", "bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("cents").alias("lo_cents"),
            F.max("cents").alias("hi_cents"),
        )
    )


@register(
    "trending_parts_rank_delta",
    doc="Trending detection by rank delta: parts ranked by exact revenue "
    "cents inside each of the two most recent months present, full-outer "
    "join of the rank tables (absent = NULL, new entrants surface), delta "
    "= old_rank - new_rank. Two combinable aggregates + two "
    "month-partitioned rank windows + one key join; revenue kept in "
    "DECIMAL-exact cents so ranks cannot drift between engines.",
    oracle="""
WITH m AS (
  SELECT l_partkey,
         date_trunc('month', l_shipdate) AS mon,
         CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
  FROM lineitem GROUP BY 1, 2
), last2 AS (
  SELECT DISTINCT mon FROM m ORDER BY mon DESC LIMIT 2
), ranked AS (
  SELECT l_partkey, mon, cents,
         ROW_NUMBER() OVER (PARTITION BY mon ORDER BY cents DESC, l_partkey) AS rnk
  FROM m WHERE mon IN (SELECT mon FROM last2)
), newm AS (SELECT MAX(mon) AS mon FROM last2),
cur AS (SELECT l_partkey, cents, rnk FROM ranked WHERE mon = (SELECT mon FROM newm)),
prev AS (SELECT l_partkey, rnk FROM ranked WHERE mon < (SELECT mon FROM newm))
SELECT COALESCE(c.l_partkey, p.l_partkey) AS l_partkey,
       c.rnk AS new_rank, p.rnk AS old_rank,
       c.cents AS new_cents,
       CASE WHEN c.rnk IS NOT NULL AND p.rnk IS NOT NULL
            THEN p.rnk - c.rnk END AS rank_delta
FROM cur c FULL OUTER JOIN prev p ON c.l_partkey = p.l_partkey
""",
)
def trending_parts_rank_delta_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    li = table(spark, sf_dir, "lineitem")
    m = li.groupBy(
        "l_partkey", F.date_trunc("month", "l_shipdate").alias("mon")
    ).agg(
        F.sum(F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")).alias("cents")
    )
    last2 = m.select("mon").distinct().orderBy(F.col("mon").desc()).limit(2)
    newm = last2.agg(F.max("mon").alias("mon")).first()[0]
    months = [r["mon"] for r in last2.collect()]
    ranked = m.filter(F.col("mon").isin(months)).withColumn(
        "rnk",
        F.row_number().over(
            W.partitionBy("mon").orderBy(F.col("cents").desc(), F.col("l_partkey"))
        ),
    )
    cur = ranked.filter(F.col("mon") == newm).select(
        F.col("l_partkey").alias("ck"), F.col("cents").alias("new_cents"),
        F.col("rnk").alias("new_rank"),
    )
    prev = ranked.filter(F.col("mon") != newm).select(
        F.col("l_partkey").alias("pk"), F.col("rnk").alias("old_rank")
    )
    j = cur.join(prev, cur["ck"] == prev["pk"], "full_outer")
    return j.select(
        F.coalesce("ck", "pk").alias("l_partkey"),
        "new_rank",
        "old_rank",
        "new_cents",
        F.when(
            F.col("new_rank").isNotNull() & F.col("old_rank").isNotNull(),
            F.col("old_rank") - F.col("new_rank"),
        ).alias("rank_delta"),
    )


@register(
    "bitmap_distinct_set_algebra",
    doc="Bitmap-index distinct counting + set algebra (the roaring-bitmap "
    "device, fixed-width flavor): user ids pack into 63-bit words "
    "(word = id div 63, mask = 1 << (id mod 63) — 63 avoids checked-shift "
    "overflow on the sign bit), one map-side-combinable bit_or per "
    "(event_type, word), then EXACT distinct users = sum of popcounts, "
    "and the view-AND-purchase audience = popcount of the word-aligned "
    "bitwise AND — set intersection WITHOUT touching raw rows again. "
    "Bitmaps merge by OR, so rollups never rescan (the KMV story, exact). "
    "At 100 TB the word table is |id-space|/63 rows per segment — the "
    "compressed-bitmap trade stated honestly: dense id spaces only; "
    "sparse/hashed ids take KMV/HLL instead.",
    oracle="""
WITH base AS (
  SELECT event_type, user_id FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
), words AS (
  SELECT event_type, user_id // 63 AS word,
         bit_or(CAST(1 AS BIGINT) << CAST(user_id % 63 AS INT)) AS bits
  FROM base GROUP BY 1, 2
), per_type AS (
  SELECT event_type, CAST(SUM(bit_count(bits)) AS BIGINT) AS distinct_users
  FROM words GROUP BY 1
), both_vp AS (
  SELECT CAST(COALESCE(SUM(bit_count(v.bits & p.bits)), 0) AS BIGINT) AS n
  FROM (SELECT word, bits FROM words WHERE event_type = 'view') v
  JOIN (SELECT word, bits FROM words WHERE event_type = 'purchase') p USING (word)
)
SELECT event_type, distinct_users,
       (SELECT n FROM both_vp) AS view_and_purchase_users
FROM per_type
""",
)
def bitmap_distinct_set_algebra_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = (
        table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull() & F.col("event_type").isNotNull())
        .select("event_type", "user_id")
    )
    words = base.groupBy(
        "event_type", F.expr("user_id div 63").alias("word")
    ).agg(
        # expr: the Python shiftleft() binding takes only a literal bit count
        F.bit_or(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(user_id % 63 AS INT))")
        ).alias("bits")
    ).persist()
    per_type = words.groupBy("event_type").agg(
        F.sum(F.bit_count("bits")).cast("long").alias("distinct_users")
    )
    v = words.filter(F.col("event_type") == "view").select("word", F.col("bits").alias("vb"))
    p = words.filter(F.col("event_type") == "purchase").select(
        "word", F.col("bits").alias("pb")
    )
    both = v.join(p, "word").agg(
        F.coalesce(F.sum(F.bit_count(F.col("vb").bitwiseAND(F.col("pb")))), F.lit(0))
        .cast("long")
        .alias("n")
    )
    return per_type.crossJoin(F.broadcast(both)).select(
        "event_type", "distinct_users", F.col("n").alias("view_and_purchase_users")
    )


@register(
    "theilsen_user_trend",
    doc="Theil-Sen robust trend per user — the median of all pairwise "
    "slopes (cents per microsecond, rounded to 9 so engines agree at the "
    "last ulp), the estimator that shrugs off the outliers OLS folds in. "
    "Pair expansion is ROW-LOCAL (sorted per-user struct array + slice-"
    "past-position explode — the basket-pairs device; work is "
    "per-user-count-squared, the stated trade), and the median is "
    "VALUE-BASED over the (user, slope) count table (cumulative locate, "
    "no per-user sort of raw pairs — the MAD discipline). Zero-dt pairs "
    "are excluded by definition.",
    oracle="""
WITH base AS (
  SELECT user_id, epoch_ns(ts) // 1000 AS ts_us, event_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE user_id IS NOT NULL
), ordered AS (
  SELECT user_id, ts_us, cents,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS rn
  FROM base
), slopes AS (
  SELECT a.user_id,
         round(CAST(b.cents - a.cents AS DOUBLE) / CAST(b.ts_us - a.ts_us AS DOUBLE), 9)
           AS slope
  FROM ordered a JOIN ordered b
    ON a.user_id = b.user_id AND a.rn < b.rn AND b.ts_us > a.ts_us
), vc AS (
  SELECT user_id, slope, COUNT(*) AS c FROM slopes GROUP BY 1, 2
), ranked AS (
  SELECT *, SUM(c) OVER (PARTITION BY user_id ORDER BY slope) AS cum,
         SUM(c) OVER (PARTITION BY user_id) AS n
  FROM vc
)
SELECT user_id, CAST(MAX(n) AS BIGINT) AS n_pairs,
       MIN(CASE WHEN cum >= CAST(floor((n + 1) / 2) AS BIGINT) THEN slope END)
         AS median_slope
FROM ranked GROUP BY user_id
""",
)
def theilsen_user_trend_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    base = (
        table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select(
            "user_id",
            F.unix_micros("ts").alias("ts_us"),
            "event_id",
            F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
        )
    )
    arrs = base.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("ts_us", "event_id", "cents"))).alias("seq")
    )
    heads = arrs.select("user_id", "seq", F.posexplode("seq").alias("i", "a"))
    pairs = heads.select(
        "user_id",
        F.col("a"),
        F.explode(F.expr("slice(seq, i + 2, size(seq))")).alias("b"),
    ).filter(F.col("b.ts_us") > F.col("a.ts_us"))
    slopes = pairs.select(
        "user_id",
        F.round(
            (F.col("b.cents") - F.col("a.cents")).cast("double")
            / (F.col("b.ts_us") - F.col("a.ts_us")).cast("double"),
            9,
        ).alias("slope"),
    )
    vc = slopes.groupBy("user_id", "slope").agg(F.count(F.lit(1)).alias("c"))
    wo = W.partitionBy("user_id").orderBy("slope")
    ranked = vc.withColumn(
        "cum", F.sum("c").over(wo.rowsBetween(W.unboundedPreceding, W.currentRow))
    ).withColumn("n", F.sum("c").over(W.partitionBy("user_id")))
    return ranked.groupBy("user_id").agg(
        F.max("n").cast("long").alias("n_pairs"),
        F.min(
            F.when(
                F.col("cum") >= F.floor((F.col("n") + 1) / 2).cast("long"),
                F.col("slope"),
            )
        ).alias("median_slope"),
    )


@register(
    "aqp_revenue_estimate",
    doc="Approximate query processing (operators/sampling.py "
    "aqp_uniform_estimates): per-returnflag row-count and revenue "
    "estimates from a deterministic ~1.1% uniform sample of lineitem "
    "(hash bucket < 111 of 10007 on the line's composite key). "
    "Horvitz-Thompson scaling is EXACT integer arithmetic (DIV), and the "
    "variance ingredient sum_sq is emitted as the raw integer so any CI "
    "follows without a float commitment: SE ~ sqrt((1-p)/p * group "
    "variance) / p. The sample predicate is a narrow projection (no "
    "shuffle until the ~1% survivors aggregate), so the 100 TB version "
    "touches ~1 TB post-filter; the same sample, materialized once, "
    "amortizes across every follow-up estimate. Measures are whole "
    "dollars, not cents, so the squared sums stay in int64 at sf100.",
    oracle=f"""
WITH s AS (
  SELECT l_returnflag,
         CAST(floor(l_extendedprice) AS BIGINT) AS dollars
  FROM lineitem
  WHERE {_BUCKET.format(s="CAST(l_orderkey * 10 + l_linenumber AS VARCHAR)", n=10007)} < 111
), g AS (
  SELECT l_returnflag,
         COUNT(*) AS n_sample,
         CAST(SUM(dollars) AS BIGINT) AS sum_measure,
         CAST(SUM(dollars * dollars) AS BIGINT) AS sum_sq_measure
  FROM s GROUP BY l_returnflag
)
SELECT l_returnflag, n_sample,
       (n_sample * 10007) // 111 AS est_rows,
       sum_measure,
       (sum_measure * 10007) // 111 AS est_sum_measure,
       sum_sq_measure
FROM g
""",
)
def aqp_revenue_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from milan_spark.operators.sampling import aqp_uniform_estimates

    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("line_key"),
        F.floor("l_extendedprice").cast("long").alias("dollars"),
    )
    return aqp_uniform_estimates(
        li, "line_key", ["l_returnflag"], "dollars",
        n_buckets=10_007, keep_buckets=111,
    )


@register(
    "gap_fill_hourly_ffill",
    doc="Dense-grid time series repair (operators/timeseries.py): hourly "
    "event counts and revenue per event_type, DENSIFIED over each type's "
    "own [first, last] hour with sequence()+explode (per-key grids, no "
    "global-calendar cross join), then forward-filled. Empty buckets keep "
    "NULL counts — 'no data' stays distinct from 0 — while the ffill "
    "column carries the last observed revenue forward, the dashboard/"
    "feature-store convention. Two (key, bucket) shuffles for the "
    "densify + one single-sweep window for the fill; a key's grid is "
    "bounded by its own lifetime, so one immortal key cannot inflate "
    "every series.",
    oracle="""
WITH obs AS (
  SELECT event_type,
         to_timestamp(CAST(floor(epoch(ts)) AS BIGINT)
                      - CAST(floor(epoch(ts)) AS BIGINT) % 3600) AS bucket,
         COUNT(*) AS n_events,
         CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
), span AS (
  SELECT event_type, MIN(bucket) AS lo, MAX(bucket) AS hi FROM obs GROUP BY 1
), grid AS (
  SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
  FROM span
)
SELECT g.event_type, CAST(g.bucket AS TIMESTAMP) AS bucket,
       o.n_events, o.cents,
       LAST_VALUE(o.cents IGNORE NULLS) OVER (
         PARTITION BY g.event_type ORDER BY g.bucket
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS cents_ffill
FROM grid g LEFT JOIN obs o ON g.event_type = o.event_type AND g.bucket = o.bucket
""",
)
def gap_fill_hourly_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from milan_spark.operators.timeseries import forward_fill, gap_fill

    ev = table(spark, sf_dir, "events").select(
        "event_type", "ts",
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("cents_v"),
    )
    dense = gap_fill(
        ev, ["event_type"], "ts", 3600,
        {"n_events": F.count(F.lit(1)), "cents": F.sum("cents_v")},
    )
    return forward_fill(dense, ["event_type"], "bucket", ["cents"]).select(
        "event_type", "bucket", "n_events", "cents",
        F.col("cents_ffill").alias("cents_ffill"),
    )


@register(
    "interpolate_daily_series",
    doc="Linear interpolation over a sparse regular series "
    "(operators/timeseries.py interpolate_linear): daily per-type revenue "
    "where two of every five days are masked NULL (a deterministic "
    "day-of-epoch rule both engines replay), then filled by interpolating "
    "between the nearest surviving neighbors — two monotonic window "
    "passes (last/first IGNORE NULLS), pure column algebra, no UDF. "
    "Edges fall back one-sided. Values ride exact integer cents into the "
    "shared prev+(next-prev)*dt/span formula and compare after "
    "ROUND(.,4) (the house float discipline).",
    oracle="""
WITH daily AS (
  SELECT event_type,
         to_timestamp(CAST(floor(epoch(ts)) AS BIGINT)
                      - CAST(floor(epoch(ts)) AS BIGINT) % 86400) AS day,
         CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
), masked AS (
  SELECT event_type, day,
         CASE WHEN (CAST(floor(epoch(day)) AS BIGINT) / 86400) % 5 < 2
              THEN NULL ELSE cents END AS v
  FROM daily
), win AS (
  SELECT event_type, day, v,
         CAST(floor(epoch(day)) AS BIGINT) AS t,
         LAST_VALUE(v IGNORE NULLS) OVER (
           PARTITION BY event_type ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
         LAST_VALUE(CASE WHEN v IS NOT NULL
                         THEN CAST(floor(epoch(day)) AS BIGINT) END
                    IGNORE NULLS) OVER (
           PARTITION BY event_type ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
         FIRST_VALUE(v IGNORE NULLS) OVER (
           PARTITION BY event_type ORDER BY day
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
         FIRST_VALUE(CASE WHEN v IS NOT NULL
                          THEN CAST(floor(epoch(day)) AS BIGINT) END
                     IGNORE NULLS) OVER (
           PARTITION BY event_type ORDER BY day
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
  FROM masked
)
SELECT event_type, CAST(day AS TIMESTAMP) AS day,
       CAST(ROUND(CASE
         WHEN v IS NOT NULL THEN CAST(v AS DOUBLE)
         WHEN pv IS NULL THEN CAST(nv AS DOUBLE)
         WHEN nv IS NULL THEN CAST(pv AS DOUBLE)
         WHEN nt = pt THEN CAST(pv AS DOUBLE)
         ELSE pv + (nv - pv) * (CAST(t AS DOUBLE) - pt) / (nt - pt)
       END, 4) AS DOUBLE) AS cents_interp
FROM win
""",
)
def interpolate_daily_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    from milan_spark.operators.timeseries import (
        gap_fill,
        interpolate_linear,
    )

    ev = table(spark, sf_dir, "events").select(
        "event_type", "ts",
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("cents_v"),
    )
    daily = gap_fill(
        ev, ["event_type"], "ts", 86400, {"cents": F.sum("cents_v")}
    ).withColumnRenamed("bucket", "day")
    day_idx = (F.unix_timestamp("day") / F.lit(86400)).cast("long")
    masked = daily.withColumn(
        "v",
        F.when(day_idx % 5 < 2, F.lit(None).cast("long")).otherwise(
            F.col("cents")
        ),
    )
    out = interpolate_linear(
        masked.withColumn("v", F.col("v").cast("double")),
        ["event_type"], "day", "v",
    )
    return out.select(
        "event_type", "day",
        F.round("v_interp", 4).cast("double").alias("cents_interp"),
    )


@register(
    "dq_constraint_quarantine",
    doc="Declarative data-quality gate (operators/constraints.py): four "
    "value constraints over orders — priced in range, known status, "
    "recent order date, clerk well-formed — checked in ONE aggregate "
    "pass (50 rules would still be one scan, map-side combinable), plus "
    "a quarantine split whose failure-signature rollup groups bad rows "
    "by WHICH rules they broke (one projection, no per-rule rescan). "
    "NULL discipline: a rule that cannot prove a row valid counts it as "
    "a violation — the poisoned-join-key postmortem rule. Output unions "
    "the per-rule violation counts with per-signature quarantine counts; "
    "the oracle re-derives both with CASE sums, pinning the NULL "
    "semantics exactly.",
    oracle="""
WITH flags AS (
  SELECT
    CASE WHEN NOT COALESCE(o_totalprice > 0 AND o_totalprice < 450000, FALSE)
         THEN 1 ELSE 0 END AS v_price,
    CASE WHEN NOT COALESCE(o_orderstatus IN ('O', 'F', 'P'), FALSE)
         THEN 1 ELSE 0 END AS v_status,
    CASE WHEN NOT COALESCE(o_orderdate >= TIMESTAMP '1996-01-01', FALSE)
         THEN 1 ELSE 0 END AS v_fresh,
    CASE WHEN NOT COALESCE(substr(o_orderpriority, 2, 1) = '-', FALSE)
         THEN 1 ELSE 0 END AS v_prio
  FROM orders
), sig AS (
  SELECT CONCAT(
           CASE WHEN v_fresh = 1 THEN '+order_fresh' ELSE '' END,
           CASE WHEN v_price = 1 THEN '+price_in_range' ELSE '' END,
           CASE WHEN v_prio = 1 THEN '+prio_wellformed' ELSE '' END,
           CASE WHEN v_status = 1 THEN '+status_known' ELSE '' END
         ) AS s
  FROM flags
  WHERE v_price + v_status + v_fresh + v_prio > 0
)
SELECT 'rule:price_in_range' AS item, CAST(SUM(v_price) AS BIGINT) AS n FROM flags
UNION ALL
SELECT 'rule:status_known', CAST(SUM(v_status) AS BIGINT) FROM flags
UNION ALL
SELECT 'rule:order_fresh', CAST(SUM(v_fresh) AS BIGINT) FROM flags
UNION ALL
SELECT 'rule:prio_wellformed', CAST(SUM(v_prio) AS BIGINT) FROM flags
UNION ALL
SELECT 'sig:' || s, CAST(COUNT(*) AS BIGINT) FROM sig GROUP BY s
""",
)
def dq_constraint_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from milan_spark.operators.constraints import (
        constraint_report,
        quarantine,
    )

    orders = table(spark, sf_dir, "orders")
    rules = {
        "price_in_range": (F.col("o_totalprice") > 0)
        & (F.col("o_totalprice") < 450000),
        "status_known": F.col("o_orderstatus").isin("O", "F", "P"),
        "order_fresh": F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"),
        "prio_wellformed": F.substring("o_orderpriority", 2, 1) == "-",
    }
    report = constraint_report(orders, rules).select(
        F.concat(F.lit("rule:"), F.col("rule")).alias("item"),
        F.col("n_violations").cast("long").alias("n"),
    )
    _, invalid = quarantine(orders, rules)
    sigs = (
        invalid.select(
            F.concat(
                F.lit("sig:"),
                F.concat_ws(
                    "", F.transform(
                        F.array_sort("failed_rules"),
                        lambda r: F.concat(F.lit("+"), r),
                    )
                ),
            ).alias("item")
        )
        .groupBy("item")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    return report.unionByName(sigs)


@register(
    "wap_audited_ingest",
    doc="Write-audit-publish ingest (operators/constraints.py "
    "audited_append composed with the versioned table): orders are gated "
    "by value constraints BEFORE anything becomes visible — clean rows "
    "commit to the product table, violating rows commit to a quarantine "
    "table carrying their failure signature, so bad data is inspectable "
    "instead of shipped or dropped. One source scan covers the audit and "
    "both writes (the tagged frame persists once). Output: per-table "
    "totals plus the quarantine's per-rule violation rollup; the oracle "
    "re-derives all of it with CASE sums, pinning the NULL-is-violation "
    "discipline through the split.",
    oracle="""
WITH flags AS (
  SELECT
    CASE WHEN NOT COALESCE(o_totalprice > 0 AND o_totalprice < 450000, FALSE)
         THEN 1 ELSE 0 END AS v_price,
    CASE WHEN NOT COALESCE(o_orderdate >= TIMESTAMP '1996-01-01', FALSE)
         THEN 1 ELSE 0 END AS v_fresh
  FROM orders
)
SELECT 'published' AS item, CAST(SUM(CASE WHEN v_price + v_fresh = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n FROM flags
UNION ALL
SELECT 'quarantined', CAST(SUM(CASE WHEN v_price + v_fresh > 0 THEN 1 ELSE 0 END) AS BIGINT) FROM flags
UNION ALL
SELECT 'qrule:price_in_range', CAST(SUM(v_price) AS BIGINT) FROM flags
UNION ALL
SELECT 'qrule:order_fresh', CAST(SUM(v_fresh) AS BIGINT) FROM flags
""",
)
def wap_audited_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile as _tf

    from milan_spark.operators.constraints import audited_append
    from milan_spark.operators.versioned import read_version

    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    )
    tbl = _tf.mkdtemp(prefix="milan_wap_tbl_")
    q = _tf.mkdtemp(prefix="milan_wap_q_")
    rules = {
        "price_in_range": (F.col("o_totalprice") > 0)
        & (F.col("o_totalprice") < 450000),
        "order_fresh": F.col("o_orderdate")
        >= F.lit("1996-01-01").cast("timestamp"),
    }
    audited_append(orders, tbl, rules, quarantine_path=q)
    published = read_version(spark, tbl).agg(
        F.lit("published").alias("item"),
        F.count(F.lit(1)).alias("n"),
    )
    quar = read_version(spark, q)
    quarantined = quar.agg(
        F.lit("quarantined").alias("item"), F.count(F.lit(1)).alias("n")
    )
    per_rule = (
        quar.select(F.explode("failed_rules").alias("rule"))
        .groupBy("rule")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.concat(F.lit("qrule:"), F.col("rule")).alias("item"), "n")
    )
    return published.unionByName(quarantined).unionByName(per_rule)
