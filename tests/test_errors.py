"""Build-time validation errors — the engine analog of the reference's
TypeChecker error-path tests (milan-lang/.../program/TestTypeChecker.scala:
bad graphs must fail BEFORE compiling, with messages naming the operator
and the offending expression, not a deep engine trace)."""

from __future__ import annotations

import pytest

from milan_spark import Stream
from milan_spark.errors import MilanAnalysisError

EV = "/root/testdata/sf0.001/events.parquet"


@pytest.fixture
def ev(spark):
    return Stream.from_parquet(spark, EV)


def test_where_bad_column_names_operator(ev):
    with pytest.raises(MilanAnalysisError, match=r"^where: .*nonexistent") as e:
        ev.where("nonexistent > 1")
    msg = str(e.value)
    assert "input columns" in msg and "event_id" in msg
    # condensed to one line — not a Catalyst plan dump
    assert "\n" not in msg


def test_map_bad_column_names_operator(ev):
    with pytest.raises(MilanAnalysisError, match=r"^map: "):
        ev.map("event_id", "no_such_col AS x")


def test_add_fields_bad_expression(ev):
    with pytest.raises(MilanAnalysisError, match=r"^add_fields: "):
        ev.add_fields(x="missing_col * 2")


def test_group_by_missing_key(ev):
    with pytest.raises(MilanAnalysisError, match=r"group_by: column.*'user_idd'"):
        ev.group_by("user_idd")


def test_group_select_bad_aggregate(ev):
    with pytest.raises(MilanAnalysisError, match=r"^group_by.select: "):
        ev.group_by("user_id").select(total="sum(not_a_col)")


def test_window_requires_temporal_column(ev):
    # wrong name
    with pytest.raises(MilanAnalysisError, match="tumbling_window"):
        ev.tumbling_window("no_ts", "1 day")
    # right name, wrong type (the classic silent-wrong-window bug)
    s = ev.map("event_id", "CAST(ts AS STRING) AS ts")
    with pytest.raises(MilanAnalysisError, match=r"expected one of"):
        s.tumbling_window("ts", "1 day")
    with pytest.raises(MilanAnalysisError, match="sliding_window"):
        ev.group_by("event_type").sliding_window("event_id", "1 hour", "30 minutes")


def test_join_missing_key_names_side(spark, ev):
    other = Stream.from_parquet(spark, EV).map("event_id AS r_id", "value", "event_id AS __seq")
    left = ev.map("event_id", "user_id", "event_id AS __seq")
    with pytest.raises(MilanAnalysisError, match=r"left_join \(right side\).*user_id"):
        left.left_join(other, on="user_id")
    with pytest.raises(MilanAnalysisError, match=r"full_join \(left side\).*missing_key"):
        left.full_join(other, left_on=["missing_key"], right_on=["r_id"])
    with pytest.raises(MilanAnalysisError, match=r"left_inner_join \(right side\)"):
        left.left_inner_join(other, left_on=["user_id"], right_on=["nope"])


def test_good_plans_unaffected(ev):
    out = (
        ev.where("event_type = 'purchase'")
        .map("user_id", "value")
        .group_by("user_id")
        .select(n="count(*)")
    )
    assert out.df.columns == ["user_id", "n"]


# --- graph typechecking of serialized plans (typeCheckGraph analog) ---------


def test_validate_plan_reports_failing_node(spark):
    from milan_spark.plans import Node, from_json, to_json, validate_plan

    src = Node("parquet_source", {"path": EV})
    bad = Node("map", {"exprs": ["event_id", "ghost_col AS g"]}, [
        Node("filter", {"condition": "event_type = 'purchase'"}, [src])
    ])
    plan = from_json(to_json(bad))  # typecheck the DESERIALIZED graph
    with pytest.raises(MilanAnalysisError) as e:
        validate_plan(plan, spark)
    msg = str(e.value)
    assert msg.startswith("map [") and "ghost_col" in msg
    assert "input columns" in msg and "event_id" in msg


def test_validate_plan_returns_all_schemas(spark):
    from milan_spark.plans import Node, validate_plan

    src = Node("parquet_source", {"path": EV})
    agg = Node(
        "aggregate",
        {"keys": ["event_type"], "aggs": {"n": "count(*)"}},
        [Node("filter", {"condition": "value > 0"}, [src])],
    )
    schemas = validate_plan(agg, spark)
    assert len(schemas) == 3  # every node got a schema
    out = schemas[agg.node_id]
    assert [f.name for f in out.fields] == ["event_type", "n"]


def test_validate_plan_unbound_external_stream(spark):
    from milan_spark.plans import Node, validate_plan

    plan = Node("filter", {"condition": "x > 1"}, [Node("external_stream", {"stream_id": "s1"})])
    with pytest.raises(MilanAnalysisError, match="no schema binding"):
        validate_plan(plan, spark)
    # bound by DDL string: checks without any data at all
    schemas = validate_plan(plan, spark, source_schemas={"s1": "x int, y string"})
    assert len(schemas) == 2


def test_application_typecheck_runs_no_jobs(spark):
    from milan_spark.application import Application
    from milan_spark.plans import Node

    plan = Node(
        "aggregate",
        {"keys": ["user_id"], "aggs": {"n": "count(*)"}},
        [Node("external_stream", {"stream_id": "events"})],
    )
    app = Application(
        app_id="tc",
        plan=plan,
        sources={"events": {"kind": "parquet", "path": EV}},
    )
    schemas = app.typecheck(spark)
    assert len(schemas) == 2
    out = schemas[plan.node_id]
    assert [f.name for f in out.fields] == ["user_id", "n"]

    app.plan = Node(
        "aggregate",
        {"keys": ["user_id"], "aggs": {"n": "sum(absent)"}},
        [Node("external_stream", {"stream_id": "events"})],
    )
    with pytest.raises(MilanAnalysisError, match=r"aggregate \["):
        app.typecheck(spark)
