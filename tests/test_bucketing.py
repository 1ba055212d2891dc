"""Bucketed-table co-located joins (operators/bucketing.py): the physical
plan must contain NO Exchange on either side of a join between tables
bucketed on the join key — the persistent-layout scale promise SCALE.md
makes. Also checks result equality with the plain (shuffling) join."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from milan_spark.operators.bucketing import colocated_join, write_bucketed
from milan_spark.sources import table
from tests.conftest import SF_SMOKE


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


class _no_broadcast:
    """Disable auto-broadcast so the planner exercises the co-located
    sort-merge path (at real scale both sides exceed the threshold anyway —
    shuffle-free SMJ is exactly the plan bucketing exists to buy)."""

    def __init__(self, spark):
        self.spark = spark

    def __enter__(self):
        self.prev = self.spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        self.spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.autoBroadcastJoinThreshold", self.prev)


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    ev = table(spark, SF_SMOKE, "events").select("event_id", "user_id", "value")
    purchases = ev.filter(F.col("value") > 100)
    write_bucketed(
        purchases, "t_purch_b", ["user_id"], 8, path=str(tmp_path / "purch")
    )
    write_bucketed(ev, "t_all_b", ["user_id"], 8, path=str(tmp_path / "all"))
    try:
        with _no_broadcast(spark):
            joined = colocated_join(spark, "t_purch_b", "t_all_b", on="user_id")
            p = _plan(joined)
            assert "Exchange" not in p, p
            assert "Bucketed: true" in p
            n = joined.count()
        # equality with the plain (broadcast/shuffle) join on the same inputs
        plain = (
            spark.table("t_purch_b")
            .withColumnRenamed("user_id", "u")
            .join(ev, F.col("u") == ev.user_id)
            .count()
        )
        assert n == plain
    finally:
        spark.sql("DROP TABLE IF EXISTS t_purch_b")
        spark.sql("DROP TABLE IF EXISTS t_all_b")


def test_bucketed_aggregate_has_no_exchange(spark, tmp_path):
    ev = table(spark, SF_SMOKE, "events").select("event_id", "user_id", "value")
    write_bucketed(ev, "t_ev_agg_b", ["user_id"], 8, path=str(tmp_path / "evagg"))
    try:
        with _no_broadcast(spark):
            agg = (
                colocated_join(spark, "t_ev_agg_b", "t_ev_agg_b", on="user_id")
                .groupBy("user_id")
                .agg(F.count(F.lit(1)).alias("n"))
            )
            assert "Exchange" not in _plan(agg)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_ev_agg_b")
