"""Dashboard compiler — metric definitions → a deployable dashboard
template, the analog of the reference's CloudWatch dashboard generator
(``milan-lang/.../aws/metrics/DashboardCompiler.scala:31-57``,
``WidgetGeneratorFactory.scala:28-103``, ``DashboardJsonGenerator.scala``;
golden test ``TestDashboardCompiler.scala:10-22``).

The reference compiles each ``CompiledMetric(name, operatorName,
metricType)`` into one time-series line widget per worker host (subtask 0
only, its own documented simplification), wraps them in a dashboard body,
and embeds that body in a CloudFormation template. Nothing in the pipeline
calls AWS — it is pure JSON generation, which is why it is testable here.

This module keeps the reference's semantics (metric-name scheme
``{worker}_{appInstanceId}_{operator}_0_{metric}``, Meter → ``_rate`` +
"Events/second" axis, Counter → "Count" axis, Histogram → the ten
max/min/mean/stddev/p50/p75/p95/p98/p99/p999 sub-series) but builds the
document with structured dicts + ``json.dumps`` instead of string
templates, so the output is always well-formed JSON.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Iterable, Sequence


class MetricType:
    """DashboardCompiler.scala:4-8 — the three Flink metric kinds."""

    COUNTER = "Counter"  # running record count
    METER = "Meter"  # 1-minute EWMA throughput (reported as <name>_rate)
    HISTOGRAM = "Histogram"  # value distribution (percentile sub-series)


#: Histogram sub-series suffixes (WidgetGeneratorFactory.scala:97-99).
HISTOGRAM_STATS = (
    "max", "min", "mean", "stddev", "p50", "p75", "p95", "p98", "p99", "p999",
)

_AUTODASH_TEXT = (
    "This dashboard was generated from the application's metric "
    "definitions and should not be edited by hand."
)


@dataclass(frozen=True)
class CompiledMetric:
    """One metric emitted by one operator (ref: CompiledMetric.scala:3)."""

    name: str
    operator_name: str
    metric_type: str


def _text_widget(markdown: str) -> dict:
    return {
        "type": "text",
        "width": 6,
        "height": 6,
        "properties": {"markdown": markdown},
    }


def _line_widget(
    namespace: str,
    metric_id: str,
    title: str,
    axis_label: str,
    region: str,
    master_host: str,
    period_sec: int,
    live_data: bool,
    stacked: bool,
    gauge_type: str,
) -> dict:
    """One time-series widget with p50/p90/p99 lines over a single metric
    stream (LineWidgetJsonGenerator's shape: first row carries the full
    dimension set, continuation rows are ``...`` with a different stat)."""
    return {
        "type": "metric",
        "x": 0,
        "y": 0,
        "width": 6,
        "height": 6,
        "properties": {
            "metrics": [
                [namespace, metric_id, "host", master_host,
                 "metric_type", gauge_type, {"label": "p50", "stat": "p50"}],
                ["...", {"stat": "p90", "label": "p90"}],
                ["...", {"label": "p99"}],
            ],
            "view": "timeSeries",
            "stacked": stacked,
            "region": region,
            "liveData": live_data,
            "stat": "p99",
            "period": period_sec,
            "title": title,
            "yAxis": {
                "left": {"showUnits": False, "label": axis_label},
                "right": {"label": ""},
            },
        },
    }


def _metric_series(metric: CompiledMetric) -> list[tuple[str, str]]:
    """Expand a metric into its (series-name, axis-label) sub-series
    (WidgetGeneratorFactory.getMetricWidget dispatch, :28-34)."""
    if metric.metric_type == MetricType.METER:
        return [(f"{metric.name}_rate", "Events/second")]
    if metric.metric_type == MetricType.COUNTER:
        return [(metric.name, "Count")]
    if metric.metric_type == MetricType.HISTOGRAM:
        return [(f"{metric.name}_{s}", "") for s in HISTOGRAM_STATS]
    raise ValueError(
        f"unknown metric type {metric.metric_type!r} "
        f"(expected one of {MetricType.COUNTER!r}, {MetricType.METER!r}, "
        f"{MetricType.HISTOGRAM!r})"
    )


def compile_dashboard_body(
    application_instance_id: str,
    compiled_metrics: Sequence[CompiledMetric],
    worker_hosts: Sequence[str],
    region: str,
    namespace: str,
    master_host: str,
    period_sec: int = 300,
    live_data: bool = False,
    stacked: bool = False,
    gauge_type: str = "gauge",
) -> dict:
    """The dashboard body: a leading text widget, then one line widget per
    (metric sub-series × worker host), in metric order
    (DashboardCompiler.getDashboardBody:70-87). Subtask index is pinned to
    0, matching the reference's "for now we will only do for subtask 0"."""
    widgets = [_text_widget(_AUTODASH_TEXT)]
    for metric in compiled_metrics:
        for series, axis_label in _metric_series(metric):
            for worker in worker_hosts:
                metric_id = (
                    f"{worker}_{application_instance_id}_"
                    f"{metric.operator_name}_0_{series}"
                )
                title = f"{worker}_{metric.operator_name}_0_{series}"
                widgets.append(
                    _line_widget(
                        namespace, metric_id, title, axis_label, region,
                        master_host, period_sec, live_data, stacked,
                        gauge_type,
                    )
                )
    return {"widgets": widgets}


def compile_dashboard(
    application_instance_id: str,
    compiled_metrics: Sequence[CompiledMetric],
    worker_hosts: Sequence[str],
    max_parallelism: int,
    region: str,
    namespace: str,
    master_host: str,
) -> str:
    """Full deployment template (DashboardCompiler.compile:31-40 →
    getTemplate:48-53): the dashboard body embedded as a JSON string inside
    a CloudFormation-shaped resource document. ``max_parallelism`` is
    accepted for signature parity; like the reference, only subtask 0 gets
    widgets."""
    del max_parallelism  # subtask 0 only — reference parity
    body = compile_dashboard_body(
        application_instance_id, compiled_metrics, worker_hosts,
        region, namespace, master_host,
    )
    template = {
        "AWSTemplateFormatVersion": "2010-09-09",
        "Resources": {
            "Dashboard": {
                "Type": "AWS::CloudWatch::Dashboard",
                "Properties": {
                    "DashboardName": (
                        f"milan-dashboard-{application_instance_id}"
                    ),
                    "DashboardBody": json.dumps(body, indent=2),
                },
            }
        },
    }
    return json.dumps(template, indent=2)


def metrics_from_application(app) -> list[CompiledMetric]:
    """Derive CompiledMetrics from an :class:`~milan_spark.application
    .Application` bundle's metric definitions. Bundle metrics are
    ``alias → SQL expression`` observations over the sink stream
    (application.py), i.e. value distributions → Histogram; a ``count(...)``
    expression is recognizably a Counter."""
    out = []
    for alias, expr in app.metrics.items():
        kind = (
            MetricType.COUNTER
            if expr.lstrip().lower().startswith("count")
            else MetricType.HISTOGRAM
        )
        out.append(CompiledMetric(alias, app.app_id, kind))
    return out
