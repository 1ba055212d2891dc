"""Serializable ApplyFunction in the Node IR — the reference carries UDFs in
its portable JSON programs as FunctionReference name pairs captured at macro
time and re-resolved by every consuming compiler (Expression.scala:407,
ConvertExpressionHost.scala:253-269, TreeParser.scala:23-120,
ScalarFunctionGenerator.scala:121). Here the name pair is a dotted import
path; these tests pin the whole lifecycle: DSL capture, JSON round-trip,
identical results from the same JSON on BOTH backends, bundle transport,
typecheck-time resolution failures named by node."""

from __future__ import annotations

import pandas as pd
import pytest

from milan_spark import Stream
from milan_spark.application import Application
from milan_spark.errors import MilanAnalysisError
from milan_spark.plans import compile_node, compile_node_streaming, from_json, to_json
from milan_spark.plans.nodes import Node, _resolve_function_ref
from milan_spark.streaming import run_to_memory

EV = "/root/testdata/sf0.001/events.parquet"
DOCS = "/root/testdata/sf0.001/documents.parquet"


def _cents_plan() -> Node:
    return Node(
        "apply_function",
        {
            "ref": "milan_spark.functions.udfs:cents",
            "return_type": "bigint",
            "cols": ["value"],
            "alias": "cents",
        },
        [
            Node(
                "map",
                {"exprs": ["event_id", "value"]},
                [
                    Node(
                        "filter",
                        {"condition": "event_type = 'purchase'"},
                        [Node("parquet_source", {"path": EV})],
                    )
                ],
            )
        ],
    )


def test_apply_function_json_roundtrip_matches_direct(spark):
    plan = _cents_plan()
    text = to_json(plan)  # would raise if the node were non-serializable
    direct = compile_node(plan, spark)
    shipped = compile_node(from_json(text), spark)
    assert sorted(map(tuple, direct.collect())) == sorted(map(tuple, shipped.collect()))
    got = {r["event_id"]: r["cents"] for r in shipped.collect()}
    exact = {
        r["event_id"]: int(r["c"])
        for r in spark.read.parquet(EV)
        .filter("event_type = 'purchase'")
        .selectExpr("event_id", "CAST(floor(value * 100 + 0.5) AS BIGINT) AS c")
        .collect()
    }
    assert got == exact and len(got) > 0


def test_same_json_batch_and_streaming_identical(spark):
    text = to_json(_cents_plan())
    batch = compile_node(from_json(text), spark)
    stream = compile_node_streaming(from_json(text), spark)
    mem = run_to_memory(stream, "ir_apply_function_both")
    assert sorted(map(tuple, batch.collect())) == sorted(map(tuple, mem.collect()))


def test_dsl_dotted_path_is_serializable_live_callable_is_not(spark):
    s = Stream.from_parquet(spark, EV).where("event_type = 'purchase'").map(
        "event_id", "value"
    )
    portable = s.apply_function(
        "milan_spark.functions.udfs:cents", "bigint", "value", alias="cents"
    )
    assert portable.node.is_serializable
    rebuilt = compile_node(from_json(to_json(portable.node)), spark)
    assert sorted(map(tuple, rebuilt.collect())) == sorted(
        map(tuple, portable.df.collect())
    )

    def live(v: pd.Series) -> pd.Series:
        return v * 2

    opaque = s.apply_function(live, "double", "value", alias="doubled")
    assert not opaque.node.is_serializable
    with pytest.raises(ValueError, match="non-serializable"):
        to_json(opaque.node)
    assert opaque.df.count() > 0  # still executes eagerly


def test_bundle_roundtrip_carries_udf_and_typechecks(spark):
    plan = Node(
        "apply_function",
        {
            "ref": "milan_spark.functions.udfs:char_fold",
            "return_type": "bigint",
            "cols": ["source"],
            "alias": "src_hash",
        },
        [Node("external_stream", {"stream_id": "docs"})],
    )
    app = Application(
        app_id="udf_bundle",
        plan=plan,
        sources={"docs": {"kind": "parquet", "path": DOCS}},
    )
    shipped = Application.from_json(app.to_json())
    schemas = shipped.typecheck(spark)  # resolves the ref with zero jobs
    out = schemas[plan.node_id]
    assert out["src_hash"].dataType.simpleString() == "bigint"
    df, _ = shipped.run_batch(spark)
    rows = df.select("source", "src_hash").distinct().collect()
    assert len(rows) > 0 and all(r["src_hash"] is not None for r in rows)


def test_unresolvable_ref_raises_named_analysis_error(spark):
    bad = Node(
        "apply_function",
        {"ref": "milan_spark.functions.udfs:no_such_fn", "return_type": "bigint",
         "cols": ["value"], "alias": "x"},
        [Node("parquet_source", {"path": EV})],
    )
    with pytest.raises(MilanAnalysisError, match=bad.node_id):
        compile_node(bad, spark)
    with pytest.raises(MilanAnalysisError, match="malformed"):
        _resolve_function_ref("nodots", "n1")
    with pytest.raises(MilanAnalysisError, match="not callable"):
        _resolve_function_ref("milan_spark.functions.udfs:pd", "n2")
