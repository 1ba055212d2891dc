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


def test_hot_key_salted_join_matches_plain(spark):
    import numpy as np

    from milan_spark.operators.skew import hot_key_salted_join

    rng = np.random.default_rng(3)
    # one key carries 40% of the large side; tail spread over 500 keys
    keys = ["hot"] * 4000 + [f"k{int(v)}" for v in rng.integers(0, 500, 6000)]
    large = spark.createDataFrame(
        [(k, i) for i, k in enumerate(keys)], "k string, v long"
    ).repartition(8)
    small = spark.createDataFrame(
        [("hot", 1.0)] + [(f"k{i}", float(i)) for i in range(0, 500, 2)], "k string, w double"
    )
    got = hot_key_salted_join(large, small, "k", min_share=(1, 10), salt=4)
    want = large.join(small, "k", "inner")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    got_left = hot_key_salted_join(large, small, "k", min_share=(1, 10), salt=4, how="left")
    want_left = large.join(small, "k", "left")
    assert sorted(map(tuple, got_left.collect())) == sorted(map(tuple, want_left.collect()))
