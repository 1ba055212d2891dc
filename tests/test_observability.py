"""Metrics + lineage (SURVEY §2.9) and the streaming record window."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F

from milan_spark.observability import counter, histogram, lineage_edges, observe, with_record_id
from milan_spark.operators.joins import left_enrichment_join
from milan_spark.sources import table
from milan_spark.streaming import run_to_memory
from milan_spark.streaming.stateful import record_window_apply


def test_observe_metrics_ride_the_action(spark):
    ev = table(spark, "/root/testdata/sf0.001", "events")
    df, obs = observe(
        ev, "ingest", n=counter(), p=histogram("value", [0.5]), mx=F.max("value")
    )
    df.write.format("noop").mode("overwrite").save()
    got = obs.get
    assert got["n"] == ev.count()
    assert got["mx"] == ev.agg(F.max("value")).collect()[0][0]
    assert len(got["p"]) == 1


def test_record_ids_deterministic_and_lineage_edges(spark):
    ev = table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    a = with_record_id(ev, "event_id")
    b = with_record_id(ev, "event_id")
    assert a.join(b, "event_id").filter(a["__record_id"] != b["__record_id"]).count() == 0

    left = (
        ev.filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "value")
        .withColumn("__seq", F.col("event_id"))
    )
    left = with_record_id(left, "event_id", alias="l_id")
    right = (
        ev.filter(F.col("event_type") == "signup")
        .select("user_id", F.col("event_id").alias("signup_id"))
        .withColumn("__seq", F.col("signup_id"))
    )
    right = with_record_id(right, "signup_id", alias="r_id")
    out = left_enrichment_join(left, right, on="user_id")
    out = with_record_id(out, "event_id", alias="out_id")
    edges = lineage_edges(out, "out_id", ["l_id", "r_id"], "left_enrichment_join")
    n_out = out.count()
    n_matched = out.filter(F.col("r_id").isNotNull()).count()
    # every output traces to its left input; matched outputs also to the right
    assert edges.count() == n_out + n_matched
    assert edges.filter(F.col("input_id").isNull()).count() == 0


def test_streaming_record_window_matches_batch(spark, tmp_path):
    rows = [(i, i % 3, float(i)) for i in range(30)]
    pdf = pd.DataFrame(rows, columns=["__seq", "k", "v"])
    (tmp_path / "in").mkdir()
    for c in range(3):
        pdf.iloc[c * 10 : (c + 1) * 10].to_parquet(tmp_path / "in" / f"{c:02d}.parquet")
    sdf = (
        spark.readStream.schema("__seq long, k long, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "in"))
    )

    def trail_sum(rows_):
        return {"k": rows_[-1]["k"], "__seq": rows_[-1]["__seq"], "t": sum(r["v"] for r in rows_)}

    got = run_to_memory(
        record_window_apply(sdf, 4, trail_sum, output_schema="k long, __seq long, t double", keys=["k"]),
        "s_recwin",
    )
    batch = spark.createDataFrame(pdf)
    from pyspark.sql import Window as W

    want = batch.withColumn(
        "t", F.sum("v").over(W.partitionBy("k").orderBy("__seq").rowsBetween(-3, 0))
    ).select("k", "__seq", "t")
    cols = ["k", "__seq", "t"]
    assert sorted(map(tuple, got.select(*cols).collect())) == sorted(
        map(tuple, want.select(*cols).collect())
    )
