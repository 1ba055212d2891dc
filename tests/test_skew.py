"""Salted join / salted aggregate equivalence with unsalted plans."""

from __future__ import annotations

from pyspark.sql import functions as F

from milan_spark.operators.skew import salted_aggregate, salted_join
from milan_spark.sources import table


def test_salted_join_matches_plain_join(spark):
    orders = table(spark, "/root/testdata/sf0.001", "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = table(spark, "/root/testdata/sf0.001", "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    want = orders.join(cust, "o_custkey", "left")
    got = salted_join(orders, cust, "o_custkey", salt=4, how="left")
    cols = ["o_orderkey", "o_custkey", "o_totalprice", "c_name"]
    assert sorted(map(tuple, got.select(*cols).collect())) == sorted(
        map(tuple, want.select(*cols).collect())
    )


def test_salted_aggregate_matches_plain(spark):
    ev = table(spark, "/root/testdata/sf0.001", "events")
    want = {
        (r["event_type"], r["n"], r["users"])
        for r in ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.size(F.collect_set("user_id")).alias("users"),
        )
        .collect()
    }
    got = salted_aggregate(
        ev,
        ["event_type"],
        {"n": F.count(F.lit(1)), "users": F.collect_set("user_id")},
        salt=4,
        merge={"users": F.size(F.array_distinct(F.flatten(F.collect_list("users"))))},
    )
    got = {(r["event_type"], r["n"], r["users"]) for r in got.collect()}
    assert got == want
