"""Cycle as a portable IR node — parity with the reference's serialized
cycles (StreamExpressions.scala:141; the Flink compiler builds the feedback
edge from the deserialized node, GeneratorContext.scala:122-130,349-357,
TestFlinkGenCycle.scala) and with the event compiler's by-name rejection
(EventHandlerClassGenerator.scala:23)."""

from __future__ import annotations

import pytest

from milan_spark import Stream
from milan_spark.errors import MilanAnalysisError
from milan_spark.plans import compile_node, compile_node_streaming, from_json, to_json
from milan_spark.plans.nodes import Node
from milan_spark.plans.validate import validate_plan

EV = "/root/testdata/sf0.001/events.parquet"


def _doubling_cycle(limit: int, iters: int) -> Node:
    """state: one (n) row per seed; body doubles n while under limit and
    keeps the rest — a schema-preserving fixpoint with a closed form."""
    seed = Node("list_source", {"rows": [[1], [3]], "schema": "n long"})
    state = Node("cycle_ref")
    body = Node(
        "map",
        {"exprs": [f"CASE WHEN n < {limit} THEN n * 2 ELSE n END AS n"]},
        [state],
    )
    return Node("cycle", {"max_iterations": iters}, [seed, body])


def test_cycle_json_roundtrip_batch_fixpoint(spark):
    plan = _doubling_cycle(limit=100, iters=10)
    out = compile_node(from_json(to_json(plan)), spark)
    # 1 -> 128, 3 -> 192: first value >= 100 reached, then held
    assert sorted(r["n"] for r in out.collect()) == [128, 192]


def test_streaming_compiler_rejects_cycle_by_name(spark):
    plan = _doubling_cycle(limit=100, iters=3)
    with pytest.raises(MilanAnalysisError, match="cycles are not supported"):
        compile_node_streaming(from_json(to_json(plan)), spark)


def test_stream_iterate_captures_portable_cycle_node(spark):
    s = Stream.from_parquet(spark, EV).where("event_type = 'purchase'").map(
        "user_id", "CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents"
    )
    # body halves every cents value still above 100 — serializable DSL ops
    it = s.iterate(
        lambda cur: cur.map("user_id", "CASE WHEN cents > 100 THEN CAST(cents / 2 AS BIGINT) ELSE cents END AS cents"),
        max_iterations=4,
    )
    assert it.node.op == "cycle" and it.node.is_serializable
    replayed = compile_node(from_json(to_json(it.node)), spark)
    assert sorted(map(tuple, replayed.collect())) == sorted(map(tuple, it.df.collect()))

    # a convergence predicate keeps the eager-only (non-serializable) path
    eager = s.iterate(
        lambda cur: cur.map("user_id", "cents"),
        max_iterations=2,
        converged=lambda a, b: True,
    )
    assert eager.node.op == "cycle" and not eager.node.is_serializable


def test_typecheck_rejects_schema_changing_body(spark):
    seed = Node("list_source", {"rows": [[1]], "schema": "n long"})
    bad_body = Node("map", {"exprs": ["n", "n * 2 AS extra"]}, [Node("cycle_ref")])
    plan = Node("cycle", {"max_iterations": 2}, [seed, bad_body])
    with pytest.raises(MilanAnalysisError, match="schema-preserving"):
        validate_plan(plan, spark)
    # the well-formed twin typechecks and reports the fixpoint schema
    good = _doubling_cycle(limit=10, iters=2)
    schemas = validate_plan(good, spark)
    assert [f.name for f in schemas[good.node_id].fields] == ["n"]


def test_cycle_ref_outside_cycle_and_nesting_rejected(spark):
    loose = Node("map", {"exprs": ["n"]}, [Node("cycle_ref")])
    with pytest.raises(ValueError, match="outside"):
        compile_node(loose, spark)
    inner = _doubling_cycle(limit=10, iters=2)
    seed = Node("list_source", {"rows": [[1]], "schema": "n long"})
    outer_body = Node("union", {}, [Node("cycle_ref"), inner])
    nested = Node("cycle", {"max_iterations": 2}, [seed, outer_body])
    with pytest.raises(ValueError, match="nested cycles"):
        compile_node(nested, spark)


def _growing_cycle(iters: int, converge=None) -> Node:
    """Grow-only set state: seed {1}; body adds n+1 for n < 5 and dedups —
    fixpoint {1..5} after 4 effective rounds, count-stable afterwards."""
    seed = Node("list_source", {"rows": [[1]], "schema": "n long"})
    state = Node("cycle_ref")
    grown = Node(
        "map", {"exprs": ["n + 1 AS n"]},
        [Node("filter", {"condition": "n < 5"}, [state])],
    )
    body = Node("distinct", {"subset": None},
                [Node("union", {}, [state, grown])])
    params = {"max_iterations": iters}
    if converge:
        params["converge"] = converge
    return Node("cycle", params, [seed, body])


def test_converge_unchanged_count_reaches_fixpoint(spark):
    # 25 budgeted rounds, converged after 5 (4 growth + 1 stable probe):
    # same answer as the fixed-round twin, from the same JSON round-trip
    fast = compile_node(
        from_json(to_json(_growing_cycle(25, converge="unchanged_count"))), spark
    )
    fixed = compile_node(from_json(to_json(_growing_cycle(6))), spark)
    want = [1, 2, 3, 4, 5]
    assert sorted(r["n"] for r in fast.collect()) == want
    assert sorted(r["n"] for r in fixed.collect()) == want


def test_converge_unknown_value_rejected(spark):
    plan = _growing_cycle(3, converge="values_stable")
    with pytest.raises(ValueError, match="unchanged_count"):
        compile_node(from_json(to_json(plan)), spark)
