"""Plan IR JSON round-trip — the engine analog of the reference's
TreeParser round-trip tests (program/TestTreeParser.scala, SURVEY.md §5 tier 1)."""

from __future__ import annotations

from milan_spark import Stream
from milan_spark.plans import compile_node, from_json, to_json


def test_roundtrip_filter_aggregate(spark):
    s = (
        Stream.from_parquet(spark, "/root/testdata/sf0.001/lineitem.parquet")
        .where("l_quantity > 25")
        .group_by("l_returnflag")
        .select(n="count(*)", total="sum(l_quantity)")
    )
    text = to_json(s.node)
    rebuilt = from_json(text)
    df2 = compile_node(rebuilt, spark)
    orig = {tuple(r) for r in s.to_list()}
    again = {tuple(r) for r in df2.collect()}
    assert orig == again
    assert to_json(rebuilt) == text


def test_roundtrip_enrichment_join(spark):
    ev = "/root/testdata/sf0.001/events.parquet"
    # events.ts is nanos in parquet; use event_id/value only for this plan test
    left = Stream.from_parquet(spark, ev).where("event_type = 'purchase'").map(
        "user_id", "event_id", "value", "event_id AS __seq"
    )
    right = Stream.from_parquet(spark, ev).where("event_type = 'signup'").map(
        "user_id", "event_id", "value", "event_id AS __seq"
    )
    joined = left.left_join(right, on="user_id")
    text = to_json(joined.node)
    df2 = compile_node(from_json(text), spark)
    assert {tuple(r) for r in df2.collect()} == {tuple(r) for r in joined.to_list()}


def test_non_serializable_plan_rejected(spark):
    from pyspark.sql import functions as F

    import pytest

    s = Stream.from_list(spark, [(1,)], "i int").where(F.col("i") > 0)
    assert not s.node.is_serializable
    with pytest.raises(ValueError):
        to_json(s.node)


def test_roundtrip_asof_join(spark):
    ev = "/root/testdata/sf0.001/events.parquet"
    left = Stream.from_parquet(spark, ev).where("event_type = 'purchase'").map(
        "user_id", "event_id", "event_id * 10 AS t"
    )
    right = Stream.from_parquet(spark, ev).where("event_type = 'view'").map(
        "user_id", "event_id", "event_id * 10 AS t"
    )
    joined = left.asof_join(right, on="user_id", left_ord="t", right_ord="t", tolerance=500)
    text = to_json(joined.node)
    df2 = compile_node(from_json(text), spark)
    assert {tuple(r) for r in df2.collect()} == {tuple(r) for r in joined.to_list()}
    assert to_json(from_json(text)) == text
