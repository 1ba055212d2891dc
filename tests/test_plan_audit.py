"""audit_shared_subtrees: the HITS-blowup detector over Node plans.

Pure plan analysis — no SparkSession needed."""

from __future__ import annotations

from milan_spark.plans.nodes import Node, from_json, to_json
from milan_spark.plans.validate import audit_shared_subtrees


def _src():
    return Node("parquet_source", {"path": "/tmp/x.parquet"})


def test_linear_chain_is_clean():
    plan = Node("filter", {"condition": "a > 1"}, [Node("map", {"exprs": ["a"]}, [_src()])])
    assert audit_shared_subtrees(plan) == []


def test_two_consumer_fanout_flagged_topmost_only():
    # raw feeds both an aggregate and a projection (the HITS shape);
    # raw's own child must NOT be reported separately
    inner = Node("map", {"exprs": ["a"]}, [_src()])
    raw = Node("aggregate", {"keys": ["a"], "aggs": {"s": "sum(a)"}}, [inner])
    mx = Node("aggregate", {"keys": [], "aggs": {"m": "max(s)"}}, [raw])
    plan = Node("relational_join", {"on": ["m"]}, [raw, mx])
    out = audit_shared_subtrees(plan)
    assert len(out) == 1
    assert out[0].startswith("aggregate") and "feeds 2 consumers" in out[0]


def test_cache_boundary_suppresses():
    inner = Node("map", {"exprs": ["a"]}, [_src()])
    raw = Node("cache", {}, [Node("aggregate", {"keys": ["a"], "aggs": {"s": "sum(a)"}}, [inner])])
    mx = Node("aggregate", {"keys": [], "aggs": {"m": "max(s)"}}, [raw])
    plan = Node("relational_join", {"on": ["m"]}, [raw, mx])
    assert audit_shared_subtrees(plan) == []


def test_shared_source_is_exempt():
    s = _src()
    plan = Node("union", {}, [Node("map", {"exprs": ["a"]}, [s]), Node("map", {"exprs": ["b"]}, [s])])
    assert audit_shared_subtrees(plan) == []


def test_structural_duplicate_across_round_trip():
    # JSON round-trip rebuilds shared objects as distinct instances with the
    # same structure; the audit must still see the sharing
    shared = Node("filter", {"condition": "a > 1"}, [Node("map", {"exprs": ["a"]}, [_src()])])
    plan = Node("union", {}, [shared, shared])
    rt = from_json(to_json(plan))
    out = audit_shared_subtrees(rt)
    assert len(out) == 1 and "feeds 2 consumers" in out[0]


def test_cycle_ref_exempt():
    state = Node("cycle_ref")
    body = Node("union", {}, [state, Node("filter", {"condition": "u <> v"}, [state])])
    plan = Node("cycle", {"max_iterations": 3}, [_src(), body])
    assert audit_shared_subtrees(plan) == []


def test_hits_cycle_ir_body_is_checkpoint_clean():
    # the real catalog plan: every multi-consumer subtree sits under a
    # checkpoint/cache node, so the audit reports nothing
    from milan_spark.queries.advanced import _hits_ir_plan

    assert audit_shared_subtrees(_hits_ir_plan("/tmp/sf")) == []


def test_unchecked_hits_shape_is_flagged():
    # strip one checkpoint from the HITS half-step shape and the audit
    # names the doubled raw-score aggregate
    edges = Node("cache", {}, [Node("map", {"exprs": ["u", "v"]}, [_src()])])
    scores = Node("map", {"exprs": ["node", "s"]}, [_src()])
    raw = Node(  # NOT checkpointed: feeds max + rescale
        "aggregate",
        {"keys": ["v AS node"], "aggs": {"s": "sum(s)"}},
        [Node("relational_join", {"on": ["u"]}, [edges, scores])],
    )
    mx = Node("aggregate", {"keys": ["1 AS k"], "aggs": {"mx": "max(s)"}}, [raw])
    plan = Node(
        "relational_join",
        {"on": ["k"]},
        [Node("map", {"exprs": ["node", "s", "1 AS k"]}, [raw]), mx],
    )
    out = audit_shared_subtrees(plan)
    assert len(out) == 1 and out[0].startswith("aggregate") and "feeds 2" in out[0]


def test_checkpoint_node_batch_compile_and_roundtrip(spark):
    from milan_spark.plans.nodes import compile_node, from_json, to_json

    plan = Node(
        "aggregate",
        {"keys": ["a"], "aggs": {"n": "count(1)"}},
        [Node("checkpoint", {}, [Node(
            "list_source",
            {"rows": [(1,), (1,), (2,)], "schema": "a long"},
        )])],
    )
    rt = from_json(to_json(plan))  # checkpoint must survive serialization
    got = {r["a"]: r["n"] for r in compile_node(rt, spark).collect()}
    assert got == {1: 2, 2: 1}


def test_checkpoint_node_streaming_passthrough(spark):
    # streaming backend treats checkpoint as a no-op pass-through: the
    # compiled frame is still a streaming DataFrame and the op doesn't raise
    from milan_spark.plans.backend_streaming import compile_node_streaming
    from milan_spark.plans.nodes import Node as N

    import tempfile, os
    d = tempfile.mkdtemp(prefix="milan_ckpt_stream_")
    spark.createDataFrame([(1, "x")], "a long, b string").write.parquet(os.path.join(d, "t.parquet"))
    plan = N("checkpoint", {}, [N("parquet_source", {"path": os.path.join(d, "t.parquet")})])
    sdf = compile_node_streaming(plan, spark)
    assert sdf.isStreaming
