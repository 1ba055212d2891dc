"""Dashboard compiler tests — mirrors the reference's golden test
(``TestDashboardCompiler.scala:10-22``: two metrics × two workers → a
CloudFormation template whose body holds a text widget + 4 line widgets)."""

import json

import pytest

from milan_spark.dashboard import (
    CompiledMetric,
    HISTOGRAM_STATS,
    MetricType,
    compile_dashboard,
    compile_dashboard_body,
    metrics_from_application,
)


METRICS = [
    CompiledMetric("meterName", "meterOp", MetricType.METER),
    CompiledMetric("counterName", "counterOp", MetricType.COUNTER),
]
WORKERS = ["ip-worker-1", "ip-worker-2"]


def _compile():
    return compile_dashboard(
        "applicationInstanceId", METRICS, WORKERS, 3,
        "eu-west-1", "Milan", "ip-master",
    )


def test_template_shape_and_name():
    doc = json.loads(_compile())
    assert doc["AWSTemplateFormatVersion"] == "2010-09-09"
    props = doc["Resources"]["Dashboard"]["Properties"]
    assert props["DashboardName"] == "milan-dashboard-applicationInstanceId"
    body = json.loads(props["DashboardBody"])  # body is an embedded JSON string
    assert set(body) == {"widgets"}


def test_meter_and_counter_widgets_match_reference_scheme():
    # TestDashboardCompiler's golden: per metric, one widget per worker;
    # meter series get the _rate suffix and Events/second axis, counters
    # keep their name with a Count axis; ids follow
    # {worker}_{appInstanceId}_{operator}_0_{series}.
    body = json.loads(
        json.loads(_compile())["Resources"]["Dashboard"]["Properties"][
            "DashboardBody"
        ]
    )
    widgets = body["widgets"]
    assert widgets[0]["type"] == "text"
    lines = widgets[1:]
    assert [w["type"] for w in lines] == ["metric"] * 4

    ids = [w["properties"]["metrics"][0][1] for w in lines]
    assert ids == [
        "ip-worker-1_applicationInstanceId_meterOp_0_meterName_rate",
        "ip-worker-2_applicationInstanceId_meterOp_0_meterName_rate",
        "ip-worker-1_applicationInstanceId_counterOp_0_counterName",
        "ip-worker-2_applicationInstanceId_counterOp_0_counterName",
    ]
    assert lines[0]["properties"]["yAxis"]["left"]["label"] == "Events/second"
    assert lines[2]["properties"]["yAxis"]["left"]["label"] == "Count"
    # p50/p90/p99 stat rows, first row carries host + gauge dimensions
    stats = lines[0]["properties"]["metrics"]
    assert stats[0][:6] == [
        "Milan",
        "ip-worker-1_applicationInstanceId_meterOp_0_meterName_rate",
        "host", "ip-master", "metric_type", "gauge",
    ]
    assert [row[-1].get("stat", "p99") for row in stats] == ["p50", "p90", "p99"]
    assert lines[0]["properties"]["period"] == 300
    assert lines[0]["properties"]["title"] == "ip-worker-1_meterOp_0_meterName_rate"


def test_histogram_expands_to_ten_stat_series():
    body = compile_dashboard_body(
        "app", [CompiledMetric("lat", "op", MetricType.HISTOGRAM)],
        ["w1"], "us-east-1", "Milan", "m1",
    )
    lines = body["widgets"][1:]
    assert len(lines) == len(HISTOGRAM_STATS) == 10
    assert [w["properties"]["metrics"][0][1] for w in lines] == [
        f"w1_app_op_0_lat_{s}" for s in HISTOGRAM_STATS
    ]


def test_unknown_metric_type_raises():
    with pytest.raises(ValueError, match="unknown metric type"):
        compile_dashboard_body(
            "app", [CompiledMetric("x", "op", "Gauge")],
            ["w1"], "r", "ns", "m",
        )


def test_metrics_from_application_bundle():
    from milan_spark.application import Application
    from milan_spark.plans.nodes import Node

    app = Application(
        app_id="orders_rollup",
        plan=Node("external_stream", {"stream_id": "orders"}),
        sources={"orders": {"kind": "parquet", "path": "/tmp/x"}},
        sink={"kind": "memory", "name": "t", "output_mode": "append"},
        metrics={"n_rows": "count(1)", "price_dist": "o_totalprice"},
    )
    compiled = metrics_from_application(app)
    assert compiled == [
        CompiledMetric("n_rows", "orders_rollup", MetricType.COUNTER),
        CompiledMetric("price_dist", "orders_rollup", MetricType.HISTOGRAM),
    ]
    # and the full pipeline produces a parseable template
    doc = json.loads(
        compile_dashboard("orders_rollup", compiled, ["w1"], 1, "r", "ns", "m")
    )
    body = json.loads(
        doc["Resources"]["Dashboard"]["Properties"]["DashboardBody"]
    )
    # counter → 1 widget, histogram → 10, + text widget
    assert len(body["widgets"]) == 1 + 1 + 10
