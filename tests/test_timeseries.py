"""operators.timeseries — dense-grid gap filling, forward fill, and linear
interpolation (grid generated per key, window passes single-sweep)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from milan_spark.operators.timeseries import (
    forward_fill,
    gap_fill,
    interpolate_linear,
    time_bucket,
)


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def test_gap_fill_densifies_per_key_span(spark):
    df = spark.createDataFrame(
        [("a", _ts(0, 10), 1.0), ("a", _ts(0, 50), 2.0), ("a", _ts(3, 5), 4.0),
         ("b", _ts(2, 0), 10.0)],
        "k string, ts timestamp, v double",
    )
    out = gap_fill(
        df, ["k"], "ts", 3600,
        {"n": F.count(F.lit(1)), "total": F.sum("v")},
    ).orderBy("k", "bucket").collect()
    got = [(r["k"], r["bucket"].hour, r["n"], r["total"]) for r in out]
    # key a spans hours 0..3 (4 buckets, 1-2 empty); key b only its own hour
    assert got == [
        ("a", 0, 2, 3.0), ("a", 1, None, None), ("a", 2, None, None),
        ("a", 3, 1, 4.0), ("b", 2, 1, 10.0),
    ]


def test_time_bucket_epoch_aligned(spark):
    df = spark.createDataFrame([(dt.datetime(2024, 1, 2, 13, 59, 59),)], "ts timestamp")
    r = df.select(time_bucket("ts", 86400).alias("d"),
                  time_bucket("ts", 900).alias("q")).collect()[0]
    assert r["d"] == dt.datetime(2024, 1, 2, 0, 0)
    assert r["q"] == dt.datetime(2024, 1, 2, 13, 45)


def test_forward_fill_per_key(spark):
    df = spark.createDataFrame(
        [("a", 1, None), ("a", 2, 5.0), ("a", 3, None), ("a", 4, None),
         ("a", 5, 7.0), ("b", 1, None)],
        "k string, t long, v double",
    )
    out = forward_fill(df, ["k"], "t", ["v"]).orderBy("k", "t").collect()
    assert [r["v_ffill"] for r in out] == [None, 5.0, 5.0, 5.0, 7.0, None]


def test_interpolate_linear_interior_and_edges(spark):
    rows = [
        ("a", _ts(0), 10.0), ("a", _ts(1), None), ("a", _ts(2), None),
        ("a", _ts(3), 40.0), ("a", _ts(4), None),  # trailing edge
        ("b", _ts(0), None), ("b", _ts(1), 3.0),   # leading edge
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = interpolate_linear(df, ["k"], "ts", "v").orderBy("k", "ts").collect()
    vals = [r["v_interp"] for r in out]
    assert vals == [10.0, 20.0, 30.0, 40.0, 40.0, 3.0, 3.0]
    # observed rows pass through untouched
    assert out[0]["v"] == out[0]["v_interp"] == 10.0


def test_interpolate_single_observation_key(spark):
    df = spark.createDataFrame(
        [("c", _ts(0), None), ("c", _ts(1), 9.0), ("c", _ts(2), None)],
        "k string, ts timestamp, v double",
    )
    vals = [r["v_interp"] for r in
            interpolate_linear(df, ["k"], "ts", "v").orderBy("ts").collect()]
    assert vals == [9.0, 9.0, 9.0]


def test_gap_fill_then_interpolate_compose(spark):
    df = spark.createDataFrame(
        [("a", _ts(0), 1.0), ("a", _ts(4), 9.0)],
        "k string, ts timestamp, v double",
    )
    dense = gap_fill(df, ["k"], "ts", 3600, {"v": F.sum("v")})
    out = interpolate_linear(dense, ["k"], "bucket", "v")
    assert [r["v_interp"] for r in out.orderBy("bucket").collect()] == [
        1.0, 3.0, 5.0, 7.0, 9.0
    ]
