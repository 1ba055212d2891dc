"""Application partitioner (the reference's graph/partition/package.scala:
17-86 + ApplicationPartitioner.scala:1 analog): cut-edge schema propagation,
invalid-cut named errors, and hash-equality of partitioned vs unpartitioned
runs over queue transport."""

from __future__ import annotations

import tempfile

import pytest

from milan_spark.application import Application
from milan_spark.partition import (
    MilanPartitionError,
    cut_stream_id,
    partition_application,
    run_partitioned,
)
from milan_spark.plans import Node

EV = "/root/testdata/sf0.001/events.parquet"


def _rollup_app(sink=None):
    proj = Node(
        "map",
        {"exprs": ["user_id", "CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents"]},
        [
            Node(
                "filter",
                {"condition": "event_type = 'purchase'"},
                [Node("external_stream", {"stream_id": "events"})],
            )
        ],
    )
    agg = Node(
        "aggregate",
        {"keys": ["user_id"], "aggs": {"total_cents": "sum(cents)", "n": "count(*)"}},
        [proj],
    )
    final = Node(
        "map",
        {"exprs": ["user_id", "total_cents", "n", "CAST(floor(total_cents / n) AS BIGINT) AS avg_cents"]},
        [agg],
    )
    app = Application(
        app_id="t_rollup",
        plan=final,
        sources={"events": {"kind": "parquet", "path": EV}},
        sink=sink or {"kind": "none"},
    )
    return app, proj, agg


def _collect(df):
    return sorted(tuple(r) for r in df.collect())


def test_two_part_hash_equality_batch(spark):
    app, _proj, agg = _rollup_app()
    direct, _ = Application.from_json(app.to_json()).run_batch(spark)
    parts = partition_application(
        app, [agg.node_id], spark, transport=tempfile.mkdtemp(prefix="t_cut_")
    )
    assert [p.app_id for p in parts] == [
        f"t_rollup__part_{agg.node_id}", "t_rollup__terminal"
    ]
    out = run_partitioned(parts, spark, mode="batch")
    assert _collect(out) == _collect(direct) and len(out.columns) == 4


def test_nested_cuts_three_parts(spark):
    app, proj, agg = _rollup_app()
    direct, _ = app.run_batch(spark)
    parts = partition_application(
        app, [agg.node_id, proj.node_id], spark,
        transport=tempfile.mkdtemp(prefix="t_cut_"),
    )
    # innermost cut first, terminal last
    assert [p.app_id for p in parts] == [
        f"t_rollup__part_{proj.node_id}",
        f"t_rollup__part_{agg.node_id}",
        "t_rollup__terminal",
    ]
    # the middle part consumes the inner cut's queue, not the raw source
    mid = parts[1]
    assert set(mid.sources) == {cut_stream_id(proj.node_id)}
    out = run_partitioned(parts, spark, mode="batch")
    assert _collect(out) == _collect(direct)


def test_cut_edge_schema_propagates(spark):
    app, _proj, agg = _rollup_app()
    parts = partition_application(
        app, [agg.node_id], spark, transport=tempfile.mkdtemp(prefix="t_cut_")
    )
    spec = parts[-1].sources[cut_stream_id(agg.node_id)]
    assert spec["kind"] == "kinesis" and spec["data_format"] == "json"
    # the DDL is the typechecked schema of the cut node
    assert spec["schema"] == "user_id bigint, total_cents bigint, n bigint"
    # and each part round-trips through its own portable JSON
    for p in parts:
        Application.from_json(p.to_json()).validate()


def test_parts_typecheck_with_queue_sources(spark):
    app, _proj, agg = _rollup_app()
    parts = partition_application(
        app, [agg.node_id], spark, transport=tempfile.mkdtemp(prefix="t_cut_")
    )
    schemas = parts[-1].typecheck(spark)
    assert any(s.fieldNames() == ("user_id", "total_cents", "n", "avg_cents")
               or list(s.fieldNames()) == ["user_id", "total_cents", "n", "avg_cents"]
               for s in schemas.values())


def test_invalid_cuts_named_errors(spark):
    app, proj, _agg = _rollup_app()
    tmp = tempfile.mkdtemp(prefix="t_cut_")
    with pytest.raises(MilanPartitionError, match="not in plan"):
        partition_application(app, ["nope_99"], spark, transport=tmp)
    with pytest.raises(MilanPartitionError, match="root"):
        partition_application(app, [app.plan.node_id], spark, transport=tmp)
    src = app.plan.inputs[0].inputs[0].inputs[0].inputs[0]
    assert src.op == "external_stream"
    with pytest.raises(MilanPartitionError, match="already an application boundary"):
        partition_application(app, [src.node_id], spark, transport=tmp)
    with pytest.raises(MilanPartitionError, match="duplicate"):
        partition_application(app, [proj.node_id, proj.node_id], spark, transport=tmp)
    with pytest.raises(MilanPartitionError, match="queue_kind"):
        partition_application(app, [proj.node_id], spark, transport=tmp,
                              queue_kind="dynamodb_table")
    with pytest.raises(MilanPartitionError, match="no coordinate"):
        partition_application(app, [proj.node_id], spark, transport={})


def test_cut_inside_cycle_body_rejected(spark):
    init = Node("map", {"exprs": ["user_id", "0 AS lvl"]},
                [Node("external_stream", {"stream_id": "events"})])
    body_filter = Node("filter", {"condition": "lvl < 3"}, [Node("cycle_ref")])
    body = Node("map", {"exprs": ["user_id", "lvl + 1 AS lvl"]}, [body_filter])
    cyc = Node("cycle", {"max_iterations": 3}, [init, body])
    app = Application(
        app_id="t_cyc", plan=cyc,
        sources={"events": {"kind": "parquet", "path": EV}},
    )
    with pytest.raises(MilanPartitionError, match="cycle"):
        partition_application(app, [body_filter.node_id], spark,
                              transport=tempfile.mkdtemp(prefix="t_cut_"))


def test_binary_cut_edge_rejected(spark):
    m = Node("map", {"exprs": ["id", "payload"]},
             [Node("list_source", {"rows": [], "schema": "id bigint, payload binary"})])
    app = Application(app_id="t_bin", plan=Node("filter", {"condition": "id > 0"}, [m]))
    with pytest.raises(MilanPartitionError, match="binary"):
        partition_application(app, [m.node_id], spark,
                              transport=tempfile.mkdtemp(prefix="t_cut_"))


def test_sqs_transport_two_part(spark):
    app, proj, _agg = _rollup_app()
    direct, _ = app.run_batch(spark)
    parts = partition_application(
        app, [proj.node_id], spark,
        transport=tempfile.mkdtemp(prefix="t_cut_"), queue_kind="sqs",
    )
    assert parts[0].sink["kind"] == "sqs"
    out = run_partitioned(parts, spark, mode="batch")
    assert _collect(out) == _collect(direct)


def test_intermediate_sink_attaches_to_first_part(spark):
    app, proj, agg = _rollup_app()
    app.sinks.append({"stream_id": proj.node_id, "kind": "memory", "name": "t_tap"})
    parts = partition_application(
        app, [agg.node_id], spark, transport=tempfile.mkdtemp(prefix="t_cut_")
    )
    assert parts[0].sinks and parts[0].sinks[0]["name"] == "t_tap"
    assert not parts[-1].sinks
    # a sink whose node was cut away from every part raises by name
    app2, proj2, agg2 = _rollup_app()
    app2.sinks.append({"stream_id": proj2.inputs[0].node_id, "kind": "memory", "name": "t_gone"})
    parts2 = partition_application(
        app2, [agg2.node_id], spark, transport=tempfile.mkdtemp(prefix="t_cut_")
    )
    # the filter node lives inside part 1's plan, so it IS claimed there
    assert parts2[0].sinks


def test_partition_by_stateful_one_stateful_op_per_part(spark):
    from milan_spark.partition import STATEFUL_OPS, partition_by_stateful
    from milan_spark.partition import _walk as walk_nodes

    # two stateful stages: per-user rollup, then a distinct over the derived
    # column — the automatic policy must isolate each into its own part
    app, _proj, agg = _rollup_app()
    dd = Node("distinct", {}, [app.plan])
    app2 = Application(
        app_id="t_auto", plan=dd,
        sources={"events": {"kind": "parquet", "path": EV}},
    )
    direct, _ = app2.run_batch(spark)
    parts = partition_by_stateful(
        app2, spark, transport=tempfile.mkdtemp(prefix="t_cut_")
    )
    assert len(parts) == 2  # agg part + terminal (distinct)
    for p in parts:
        n_stateful = sum(1 for n in walk_nodes(p.plan) if n.op in STATEFUL_OPS)
        assert n_stateful <= 1, p.app_id
    out = run_partitioned(parts, spark, mode="batch")
    assert _collect(out) == _collect(direct)


def test_partition_by_stateful_stateless_plan_passthrough(spark):
    from milan_spark.partition import partition_by_stateful

    plan = Node("filter", {"condition": "event_type = 'purchase'"},
                [Node("external_stream", {"stream_id": "events"})])
    app = Application(app_id="t_flat", plan=plan,
                      sources={"events": {"kind": "parquet", "path": EV}})
    parts = partition_by_stateful(app, spark, transport="/tmp/unused")
    assert parts == [app]
