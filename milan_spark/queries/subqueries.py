"""Correlated-subquery / decorrelation shapes (TPC-H Q4/Q17/Q18/Q22 analogs).

The reference has no subqueries at all — its only join is the keyed enrichment
join (SURVEY.md §2.3, ``milan/.../JoinExpressions.scala``), so every shape here
is "exceeds-parity" relational depth: EXISTS → left-semi join, NOT EXISTS →
left-anti join, correlated scalar aggregate → aggregate-then-join. We express
the decorrelated plan directly in the DataFrame API (what Catalyst's
``RewriteCorrelatedScalarSubquery`` / ``RewritePredicateSubquery`` would emit),
which keeps the physical plan explicit and auditable: the aggregated/deduped
side is always the small side and is broadcast.

Exactness discipline: correlated comparisons against averages are rewritten to
multiply-through form (``qty * n < sum`` in DECIMAL/ BIGINT arithmetic) so both
engines compare exact quantities — no float division on the comparison path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from milan_spark import functions as mf
from milan_spark.catalog import register
from milan_spark.sources import table

DEC = "decimal(18,6)"


@register(
    "q4_priority_exists",
    doc="TPC-H Q4 shape (EXISTS → left-semi join): count orders per priority "
    "that had at least one line shipped more than 30 days after the order "
    "date. The semi join keeps at most one match per order (no fan-out), "
    "shuffles both sides once on l_orderkey, and AQE can turn it into a "
    "broadcast when the filtered orders side is small.",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey
    AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
)
GROUP BY o_orderpriority
""",
)
def q4_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    cond = (li.l_orderkey == orders.o_orderkey) & (
        li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 30 DAYS")
    )
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(mf.agg_count().alias("n_orders"))
    )


@register(
    "q17_small_quantity_revenue",
    doc="TPC-H Q17 shape (correlated scalar avg → aggregate-then-join): "
    "revenue from lines of one brand whose quantity is below half the "
    "part's average quantity. Decorrelated: per-part (sum, count) aggregate "
    "— one row per part, broadcast back to the fact side; the avg compare "
    "is multiplied through (2·qty·n < sum) so it is DECIMAL-exact on both "
    "engines. At 100 TB: the brand filter prunes the part dim AND (via a "
    "broadcast semi-join pushed below the aggregate) the per-part aggregate "
    "itself, so the broadcast carries only the ~1/25 surviving partkeys "
    "instead of all ~20M, and the map-side partial agg touches only brand "
    "lines.",
    oracle="""
WITH pq AS (
  SELECT l_partkey,
         SUM(CAST(l_quantity AS DECIMAL(18,6))) AS sum_qty,
         COUNT(*) AS n_lines
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS below_avg_revenue,
       COUNT(*) AS n_small_lines
FROM lineitem l, part p, pq
WHERE p.p_partkey = l.l_partkey
  AND pq.l_partkey = l.l_partkey
  AND p.p_brand = 'Brand#1'
  AND 2 * CAST(l.l_quantity AS DECIMAL(18,6)) * pq.n_lines < pq.sum_qty
""",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    # prune the per-part aggregate to brand partkeys BEFORE aggregating and
    # broadcasting: the unpruned aggregate would broadcast every partkey
    # (~20M rows at SF100) when only the brand's ~1/25 survive the join
    brand_keys = part.select("p_partkey")
    pq = (
        li.join(F.broadcast(brand_keys), li.l_partkey == brand_keys.p_partkey, "semi")
        .groupBy(F.col("l_partkey").alias("pq_partkey"))
        .agg(
            mf.agg_sum(F.col("l_quantity").cast(DEC)).alias("sum_qty"),
            mf.agg_count().alias("n_lines"),
        )
    )
    qty = F.col("l_quantity").cast(DEC)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(pq), li.l_partkey == F.col("pq_partkey"))
        .filter(F.lit(2) * qty * F.col("n_lines") < F.col("sum_qty"))
        .agg(
            F.round(mf.agg_sum(F.col("l_extendedprice").cast(DEC)), 2)
            .cast("double")
            .alias("below_avg_revenue"),
            mf.agg_count().alias("n_small_lines"),
        )
    )


@register(
    "q18_large_volume_orders",
    doc="TPC-H Q18 shape (HAVING subquery → aggregate-then-semi-join): orders "
    "whose total line quantity exceeds a threshold, enriched with customer "
    "name and total price. The HAVING aggregate produces few rows, so it "
    "broadcasts into the orders join; the customer dim broadcasts too — the "
    "only big shuffle is the per-order quantity aggregate.",
    oracle="""
WITH big AS (
  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,6))) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 220
)
SELECT c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       CAST(big.total_qty AS DOUBLE) AS total_qty
FROM orders o, customer c, big
WHERE o.o_orderkey = big.l_orderkey AND c.c_custkey = o.o_custkey
""",
)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(mf.agg_sum(F.col("l_quantity").cast(DEC)).alias("total_qty"))
        .filter(F.col("total_qty") > 220)
    )
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("total_qty").cast("double").alias("total_qty"),
        )
    )


@register(
    "q22_idle_rich_customers",
    doc="TPC-H Q22 shape (global scalar subquery + NOT EXISTS → broadcast "
    "scalar + left-anti join): customers with above-average account balance "
    "who have never placed a large (>300k) order, counted per nation. The "
    "global avg is a 1-row broadcast (multiply-through compare: bal·n > "
    "sum, exact DECIMAL); NOT EXISTS is a left-anti join on custkey whose "
    "orders side is filtered-then-projected to one column, so the anti "
    "join's shuffle is narrow and the filter pushes to the parquet scan.",
    oracle="""
WITH avg_bal AS (
  SELECT SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS sum_bal, COUNT(*) AS n
  FROM customer WHERE c_acctbal > 0
)
SELECT c.c_nationkey, COUNT(*) AS n_customers,
       CAST(ROUND(SUM(CAST(c.c_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_bal
FROM customer c, avg_bal
WHERE CAST(c.c_acctbal AS DECIMAL(18,6)) * avg_bal.n > avg_bal.sum_bal
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
GROUP BY c.c_nationkey
""",
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    bal = F.col("c_acctbal").cast(DEC)
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        mf.agg_sum(bal).alias("sum_bal"), mf.agg_count().alias("n")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(bal * F.col("n") > F.col("sum_bal"))
        .join(
            orders.filter(F.col("o_totalprice") > 300000).select("o_custkey"),
            cust.c_custkey == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("c_nationkey")
        .agg(
            mf.agg_count().alias("n_customers"),
            F.round(mf.agg_sum(bal), 2).cast("double").alias("total_bal"),
        )
    )


@register(
    "q21_sole_late_supplier",
    doc="TPC-H Q21 shape (double-correlated EXISTS + NOT EXISTS): suppliers "
    "who were the ONLY late shipper (> 60 days after order date) on a "
    "multi-supplier order, counted per supplier. Both correlations "
    "decorrelate into ONE per-order conditional aggregate: per (orderkey, "
    "suppkey) a bool_or late flag, then per orderkey (n_suppliers, n_late, "
    "and — exactly when n_late = 1 — THE late suppkey via max-over-when), "
    "filter n_suppliers > 1 ∧ n_late = 1. EXISTS ≡ n_suppliers > 1, "
    "NOT EXISTS ≡ n_late = 1, and the qualifying pair is recovered from "
    "the same aggregate, so the semi-join, anti-join, and both DISTINCT "
    "pair shuffles of the textbook plan vanish. Physical plan: lineitem "
    "and orders exchange once on orderkey for the join; both groupBys "
    "reuse that partitioning (grouping keys ⊇ partitioning keys ⇒ "
    "ClusteredDistribution already satisfied) — ZERO further full-size "
    "exchanges; the supplier dim broadcasts. This is the formulation "
    "whose working set genuinely carries 10× rows in weak scaling "
    "(SCALE.md) — one pass over it instead of four.",
    oracle="""
WITH pairs AS (
  SELECT DISTINCT l.l_orderkey AS ok, l.l_suppkey AS sk
  FROM lineitem l, orders o
  WHERE l.l_orderkey = o.o_orderkey
    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
),
all_pairs AS (
  SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk FROM lineitem
)
SELECT s.s_name, COUNT(*) AS numwait
FROM pairs p, supplier s
WHERE s.s_suppkey = p.sk
  AND EXISTS (SELECT 1 FROM all_pairs a WHERE a.ok = p.ok AND a.sk <> p.sk)
  AND NOT EXISTS (SELECT 1 FROM pairs p2 WHERE p2.ok = p.ok AND p2.sk <> p.sk)
GROUP BY s.s_name
""",
)
def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    supp = table(spark, sf_dir, "supplier")
    late_flag = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("sk"))
        .agg(F.max(late_flag.cast("int")).alias("late"))
    )
    per_order = pairs.groupBy("ok").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("late").alias("n_late"),
        F.max(F.when(F.col("late") == 1, F.col("sk"))).alias("late_sk"),
    )
    sole = per_order.filter((F.col("n_supp") > 1) & (F.col("n_late") == 1))
    return (
        sole.join(F.broadcast(supp), F.col("late_sk") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(mf.agg_count().alias("numwait"))
    )


@register(
    "q2_min_cost_supplier",
    doc="TPC-H Q2 shape (correlated MIN subquery → aggregate-then-join): for "
    "each STANDARD small part, the supplier(s) from one region offering the "
    "minimum supply cost. The schema has no partsupp table, so the observed "
    "minimum line price per (part, supplier) pair stands in for supply cost "
    "— the plan shape is Q2's exactly: the correlated "
    "``cost = (SELECT MIN ...)`` decorrelates to a per-part MIN aggregate "
    "joined back on (partkey, cost). Scale plan: the part filter prunes the "
    "pair aggregate BEFORE both MINs via a broadcast semi-join (q17's "
    "pruned-broadcast discipline — without it the pair aggregate would "
    "shuffle every partkey at SF100), the region filter prunes the supplier "
    "dim through the nation chain, and cost equality compares exact "
    "DECIMALs, never floats.",
    oracle="""
WITH sel_part AS (
  SELECT p_partkey, p_brand FROM part WHERE p_type = 'STANDARD' AND p_size <= 10
),
sel_supp AS (
  SELECT s.s_suppkey, s.s_name, s.s_acctbal
  FROM supplier s, nation n
  WHERE n.n_nationkey = s.s_nationkey AND n.n_regionkey = 0
),
ps AS (
  SELECT l.l_partkey, l.l_suppkey, MIN(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS cost
  FROM lineitem l
  WHERE l.l_partkey IN (SELECT p_partkey FROM sel_part)
    AND l.l_suppkey IN (SELECT s_suppkey FROM sel_supp)
  GROUP BY l.l_partkey, l.l_suppkey
),
best AS (
  SELECT l_partkey AS bk, MIN(cost) AS min_cost FROM ps GROUP BY l_partkey
)
SELECT p.p_partkey, p.p_brand, s.s_name, s.s_acctbal,
       CAST(ps.cost AS DOUBLE) AS supply_cost
FROM ps, best, sel_part p, sel_supp s
WHERE ps.l_partkey = best.bk AND ps.cost = best.min_cost
  AND p.p_partkey = ps.l_partkey
  AND s.s_suppkey = ps.l_suppkey
""",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_extendedprice")
    part = (
        table(spark, sf_dir, "part")
        .filter((F.col("p_type") == "STANDARD") & (F.col("p_size") <= 10))
        .select("p_partkey", "p_brand")
    )
    nation = table(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 0)
    supp = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey, "semi")
        .select("s_suppkey", "s_name", "s_acctbal")
    )
    ps = (
        li.join(F.broadcast(part.select("p_partkey")), li.l_partkey == F.col("p_partkey"), "semi")
        .join(F.broadcast(supp.select("s_suppkey")), li.l_suppkey == F.col("s_suppkey"), "semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(mf.agg_min(F.col("l_extendedprice").cast(DEC)).alias("cost"))
    )
    ps = ps.persist()  # feeds both the per-part MIN and the equality join;
    # one row per (part, supplier) pair — cheap to hold, saves a fact re-scan
    best = ps.groupBy(F.col("l_partkey").alias("bk")).agg(mf.agg_min("cost").alias("min_cost"))
    return (
        ps.join(F.broadcast(best), (ps.l_partkey == F.col("bk")) & (ps.cost == F.col("min_cost")))
        .join(F.broadcast(part), ps.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), ps.l_suppkey == supp.s_suppkey)
        .select(
            "p_partkey",
            "p_brand",
            "s_name",
            "s_acctbal",
            F.col("cost").cast("double").alias("supply_cost"),
        )
    )


@register(
    "q20_excess_share_suppliers",
    doc="TPC-H Q20 shape (nested IN subqueries over a correlated aggregate → "
    "pruned aggregates + semi-join chain): suppliers who shipped more than "
    "half of a 'small'-named part's total 1996-97 volume (the partsupp "
    "availability test of Q20, restated over shipped quantity). "
    "Decorrelated: per-(part, supplier) quantity and per-part total are two "
    "stacked aggregates over the SAME name-and-date-pruned scan (the pair "
    "aggregate is persisted — it feeds both the total and the share "
    "compare, and exchange reuse does not fire across the two uses); the "
    "'more than half' correlation is a "
    "DECIMAL multiply-through compare (2·pair > total) after a broadcast "
    "join of the per-part totals; qualifying suppkeys then semi-join the "
    "supplier dim. The date+name filters push to the scan, so at SF100 the "
    "only wide shuffle carries the pruned pair aggregate.",
    oracle="""
WITH scoped AS (
  SELECT l.l_partkey, l.l_suppkey, CAST(l.l_quantity AS DECIMAL(18,6)) AS q
  FROM lineitem l
  WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
    AND l.l_shipdate < TIMESTAMP '1998-01-01'
    AND l.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
),
pair AS (
  SELECT l_partkey, l_suppkey, SUM(q) AS pair_qty FROM scoped GROUP BY l_partkey, l_suppkey
),
tot AS (
  SELECT l_partkey AS tk, SUM(pair_qty) AS part_qty FROM pair GROUP BY l_partkey
)
SELECT s.s_suppkey, s.s_name, s.s_nationkey
FROM supplier s
WHERE s.s_suppkey IN (
  SELECT pair.l_suppkey FROM pair, tot
  WHERE tot.tk = pair.l_partkey AND pair.pair_qty * 2 > tot.part_qty
)
""",
)
def q20_excess_share_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    small_parts = (
        table(spark, sf_dir, "part").filter(F.col("p_name").like("small%")).select("p_partkey")
    )
    scoped = (
        table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(F.broadcast(small_parts), F.col("l_partkey") == F.col("p_partkey"), "semi")
        .select("l_partkey", "l_suppkey", F.col("l_quantity").cast(DEC).alias("q"))
    )
    pair = scoped.groupBy("l_partkey", "l_suppkey").agg(
        mf.agg_sum("q").alias("pair_qty")
    ).persist()  # read by both the per-part total and the share compare
    tot = pair.groupBy(F.col("l_partkey").alias("tk")).agg(
        mf.agg_sum("pair_qty").alias("part_qty")
    )
    excess = (
        pair.join(F.broadcast(tot), pair.l_partkey == F.col("tk"))
        .filter(F.col("pair_qty") * 2 > F.col("part_qty"))
        .select("l_suppkey")
    )
    supp = table(spark, sf_dir, "supplier")
    return supp.join(excess, supp.s_suppkey == excess.l_suppkey, "semi").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
