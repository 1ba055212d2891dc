"""Application partitioning — split one program DAG into queue-connected
sub-applications.

The reference splits an application's dataflow graph into connected
subgraphs whose cut edges become ``ExternalStream``s, then deploys each
subgraph separately with queue transport between them
(``milan-lang/.../graph/partition/package.scala:17-86`` computes the
subgraphs; ``milan-aws-serverless/.../compiler/ApplicationPartitioner.scala:1``
turns each into its own deployable with the cut edges bound to Kinesis;
``LambdaHandlerGenerator.scala:1`` emits one handler per part). The Spark
twin here is cloud-neutral: :func:`partition_application` takes an
:class:`~milan_spark.application.Application` plus the node ids to cut at,
and returns one Application per part in execution (dependency) order —

- each cut node's subtree becomes an upstream part whose head sink is a
  queue sink (``sources.queues`` descriptors: emulated locally, real
  connectors when the environment has them);
- every consumer of a cut node sees an ``external_stream`` placeholder
  bound to the matching queue *source*, with the cut edge's schema derived
  by the graph typechecker (``plans.validate.validate_plan`` — metadata
  only, no data I/O), so schema propagation across the cut is checked at
  partition time, not discovered at run time;
- the terminal part keeps the original application's sink, metrics, and
  state-store configuration.

:func:`run_partitioned` executes the parts in order, each in its OWN Spark
session (``spark.newSession()`` — separate conf/temp-view/listener
namespaces over one shared context: the in-sandbox analog of the
reference's separately deployed Flink jobs / Lambda handlers), on either
backend: batch parts publish their head to the queue with one bounded
``publish_batch``; streaming parts run the queue sink as a real
StreamingQuery.

Scale note (the 100 TB lens): a queue is a control-plane transport — the
reference's partitioner exists so a LOW-VOLUME boundary (alerts, aggregates,
reference updates) can cross deployment units, while bulk data stays on
object-store sources inside each part. Cut where the data is already
reduced; the emulation's per-microbatch cap (``queues.EMULATION_BATCH_CAP``)
turns a mis-placed bulk cut into a named error instead of an OOM.
"""

from __future__ import annotations

import os
from typing import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import ArrayType, BinaryType, MapType, StructType

from milan_spark.application import Application
from milan_spark.errors import MilanAnalysisError
from milan_spark.plans.nodes import Node
from milan_spark.sources.queues import LOCAL_PREFIX


class MilanPartitionError(MilanAnalysisError):
    """An invalid partitioning request, named at analysis time: unknown or
    duplicate cut ids, cuts on sources/the root/inside a cycle body, or a
    cut edge whose schema cannot ride the queue's JSON transport."""


_SOURCE_OPS = frozenset(
    {"external_stream", "parquet_source", "file_source", "list_source"}
)

#: queue kinds usable as cut transport (dynamodb pairs a table sink with a
#: change-stream source — a KV store, not a FIFO edge — so it is excluded)
_TRANSPORT_KINDS = ("kinesis", "sqs")


def cut_stream_id(node_id: str) -> str:
    """The external-stream id a cut node's consumers bind to."""
    return f"cut_{node_id}"


def _schema_ddl(schema: StructType) -> str:
    return ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in schema.fields)


def _contains_binary(dt) -> bool:
    if isinstance(dt, BinaryType):
        return True
    if isinstance(dt, ArrayType):
        return _contains_binary(dt.elementType)
    if isinstance(dt, MapType):
        return _contains_binary(dt.keyType) or _contains_binary(dt.valueType)
    if isinstance(dt, StructType):
        return any(_contains_binary(f.dataType) for f in dt.fields)
    return False


def _walk(n: Node, seen: set[str] | None = None):
    seen = set() if seen is None else seen
    if n.node_id in seen:
        return
    seen.add(n.node_id)
    yield n
    for i in n.inputs:
        yield from _walk(i, seen)


def _cuts_under(n: Node, cut_set: set[str], *, skip_self: bool = True) -> set[str]:
    """Cut ids strictly inside ``n``'s subtree (excluding ``n`` itself when
    ``skip_self``); does NOT recurse below another cut — those belong to the
    nested cut's own part."""
    found: set[str] = set()

    def rec(m: Node, is_root: bool) -> None:
        if not is_root and m.node_id in cut_set:
            found.add(m.node_id)
            return
        for i in m.inputs:
            rec(i, False)

    rec(n, skip_self)
    return found


def _replace_cuts(n: Node, cut_set: set[str], *, is_root: bool = True) -> Node:
    """Copy of ``n``'s subtree with every (non-root) cut node replaced by an
    ``external_stream`` placeholder. Node ids are preserved so intermediate
    sink/lineage bindings keep resolving and memoization still coalesces
    shared subgraphs."""
    if not is_root and n.node_id in cut_set:
        return Node(
            "external_stream",
            {"stream_id": cut_stream_id(n.node_id)},
            node_id=f"es__{n.node_id}",
        )
    return Node(
        n.op,
        n.params,
        [_replace_cuts(i, cut_set, is_root=False) for i in n.inputs],
        node_id=n.node_id,
        serializable=n.serializable,
    )


def _queue_source_spec(kind: str, coord: str, schema_ddl: str) -> dict:
    if kind == "kinesis":
        return {"kind": "kinesis", "stream_name": coord, "region": "local",
                "schema": schema_ddl, "data_format": "json"}
    return {"kind": "sqs", "queue_url": coord, "schema": schema_ddl}


def _queue_sink_spec(kind: str, coord: str, sink_id: str) -> dict:
    if kind == "kinesis":
        return {"kind": "kinesis", "sink_id": sink_id, "stream_name": coord,
                "region": "local"}
    return {"kind": "sqs", "sink_id": sink_id, "queue_url": coord}


def partition_application(
    app: Application,
    cut_node_ids: Sequence[str],
    spark: SparkSession,
    *,
    transport: str | Mapping[str, str],
    queue_kind: str = "kinesis",
) -> list[Application]:
    """Split ``app`` at ``cut_node_ids`` into queue-connected sub-apps.

    ``transport`` is either a directory root (each cut gets the emulated
    coordinate ``local:<root>/<node_id>``) or an explicit
    ``{node_id: coordinate}`` mapping (real stream names / queue URLs when
    the environment has connectors). Returns the parts in execution order —
    innermost cuts first, the terminal part (original sink/metrics) last.

    Raises :class:`MilanPartitionError` for cuts that cannot be realized:
    unknown/duplicate ids, the plan root (an empty terminal part), source
    nodes (already a boundary), nodes inside a cycle body (a feedback edge
    cannot be severed by a FIFO), and cut edges carrying binary columns
    (the queue transport is JSON).
    """
    if queue_kind not in _TRANSPORT_KINDS:
        raise MilanPartitionError(
            f"queue_kind {queue_kind!r} cannot carry a cut edge "
            f"(expected one of {_TRANSPORT_KINDS})"
        )
    cuts = list(cut_node_ids)
    if len(set(cuts)) != len(cuts):
        raise MilanPartitionError(f"duplicate cut node ids: {sorted(cuts)}")
    cut_set = set(cuts)
    by_id = {n.node_id: n for n in _walk(app.plan)}
    unknown = cut_set - set(by_id)
    if unknown:
        raise MilanPartitionError(
            f"cut node ids not in plan: {sorted(unknown)} "
            f"(plan nodes: {sorted(by_id)})"
        )
    if app.plan.node_id in cut_set:
        raise MilanPartitionError(
            f"cut at the plan root {app.plan.node_id!r} would leave an empty "
            "terminal application; cut below the root"
        )
    for cid in sorted(cut_set):
        if by_id[cid].op in _SOURCE_OPS:
            raise MilanPartitionError(
                f"cut at {cid!r} ({by_id[cid].op}) is already an application "
                "boundary; cut at a computed stream"
            )
    for n in _walk(app.plan):
        if n.op == "cycle":
            inside = {m.node_id for m in _walk(n.inputs[1])} & cut_set
            if inside:
                raise MilanPartitionError(
                    f"cut(s) {sorted(inside)} inside the body of cycle "
                    f"{n.node_id!r}: a feedback edge cannot be severed by a "
                    "queue (the reference's partitioner also only cuts "
                    "forward edges)"
                )

    # cut-edge schemas from the graph typechecker — metadata only, no jobs
    schemas = app.typecheck(spark)
    edge_ddl: dict[str, str] = {}
    for cid in cuts:
        schema = schemas[cid]
        bad = [f.name for f in schema.fields if _contains_binary(f.dataType)]
        if bad:
            raise MilanPartitionError(
                f"cut at {cid!r}: columns {bad} contain binary data, which "
                "the queue's JSON transport cannot carry faithfully; project "
                "them away before the cut or keep the edge in-application"
            )
        edge_ddl[cid] = _schema_ddl(schema)

    def coord_for(cid: str) -> str:
        if isinstance(transport, Mapping):
            try:
                return transport[cid]
            except KeyError:
                raise MilanPartitionError(
                    f"transport mapping has no coordinate for cut {cid!r}"
                ) from None
        root = transport[len(LOCAL_PREFIX):] if transport.startswith(LOCAL_PREFIX) else transport
        return LOCAL_PREFIX + os.path.join(root, cid)

    # dependency order: a part whose subtree contains another cut runs after it
    nested = {cid: _cuts_under(by_id[cid], cut_set) for cid in cuts}
    ordered: list[str] = []
    remaining = set(cuts)
    while remaining:
        ready = sorted(c for c in remaining if nested[c] <= set(ordered))
        if not ready:  # cannot happen on a DAG; defensive
            raise MilanPartitionError(f"cyclic cut dependency among {sorted(remaining)}")
        ordered.extend(ready)
        remaining -= set(ready)

    def build_part(plan: Node, app_id: str, sink: dict, *, terminal: bool) -> Application:
        ext_ids = {
            n.params["stream_id"] for n in _walk(plan) if n.op == "external_stream"
        }
        sources: dict[str, dict] = {}
        for sid in ext_ids:
            if sid in app.sources:
                sources[sid] = app.sources[sid]
            else:
                cid = sid[len("cut_"):]
                sources[sid] = _queue_source_spec(queue_kind, coord_for(cid), edge_ddl[cid])
        part = Application(
            app_id=app_id,
            plan=plan,
            sources=sources,
            sink=sink,
            metrics=dict(app.metrics) if terminal else {},
            state_store=app.state_store,
        )
        return part

    parts: list[Application] = []
    claimed: set[str] = set()  # node ids whose intermediate sinks are attached
    for cid in ordered:
        plan = _replace_cuts(by_id[cid], cut_set)
        part = build_part(
            plan,
            f"{app.app_id}__part_{cid}",
            _queue_sink_spec(queue_kind, coord_for(cid), cut_stream_id(cid)),
            terminal=False,
        )
        _attach_intermediate(app, part, claimed)
        parts.append(part)
    terminal = build_part(
        _replace_cuts(app.plan, cut_set),
        f"{app.app_id}__terminal",
        dict(app.sink),
        terminal=True,
    )
    _attach_intermediate(app, terminal, claimed)
    parts.append(terminal)
    leftover = {e["stream_id"] for e in app.sinks + app.lineage_sinks} - claimed
    if leftover:
        raise MilanPartitionError(
            f"intermediate sinks bound to {sorted(leftover)} fall on no part "
            "(their nodes were cut away); re-bind them inside a part"
        )
    return parts


def _attach_intermediate(app: Application, part: Application, claimed: set[str]) -> None:
    """Assign the original app's intermediate sinks/lineage sinks to the
    FIRST part (execution order) whose plan still contains their node — a
    shared subtree recomputed in a later part must not fire its tap twice."""
    ids = {n.node_id for n in _walk(part.plan)}
    for entry in app.sinks:
        if entry["stream_id"] in ids and entry["stream_id"] not in claimed:
            part.sinks.append(entry)
            claimed.add(entry["stream_id"])
    for entry in app.lineage_sinks:
        if entry["stream_id"] in ids and entry["stream_id"] not in claimed:
            part.lineage_sinks.append(entry)
            claimed.add(entry["stream_id"])


#: ops that materialize cross-record state — the reference's
#: ``StreamExpression.stateful`` flag, which its automatic partitioner keys
#: on (ApplicationPartitioner.scala: ``getNodeIdIfStateful`` labels each
#: stateful node as its own partition; stateless nodes inherit the parent's)
STATEFUL_OPS = frozenset(
    {
        "aggregate", "time_window_aggregate", "session_window_aggregate",
        "record_window", "left_enrichment_join", "full_enrichment_join",
        "left_inner_enrichment_join", "relational_join", "left_windowed_join",
        "asof_join", "cum_window", "running_sum_by", "stream_max_by",
        "stream_min_by", "scan_fold", "last", "distinct", "cycle",
        "rollup", "cube", "grouping_sets", "intersect", "except",
        "order_limit",
    }
)


def stateful_cut_ids(plan: Node) -> list[str]:
    """The cut set the reference's AUTOMATIC partitioner derives: every
    non-root stateful node whose output some other node consumes becomes a
    partition boundary, so each resulting part contains at most ONE stateful
    operation (``ApplicationPartitioner.partitionApplication`` — the Lambda
    deployment model: one stateful handler per deployable). Nodes inside
    cycle bodies are excluded (feedback edges cannot be cut)."""
    in_cycle: set[str] = set()
    for n in _walk(plan):
        if n.op == "cycle":
            in_cycle |= {m.node_id for m in _walk(n.inputs[1])}
    return sorted(
        n.node_id
        for n in _walk(plan)
        if n.op in STATEFUL_OPS
        and n.node_id != plan.node_id
        and n.node_id not in in_cycle
    )


def partition_by_stateful(
    app: Application,
    spark: SparkSession,
    *,
    transport: str | Mapping[str, str],
    queue_kind: str = "kinesis",
) -> list[Application]:
    """The reference's automatic partitioning policy: split so that every
    part holds at most one stateful operation (``ApplicationPartitioner.
    scala:44-70``). Returns ``[app]`` unchanged when the plan has no
    interior stateful node to cut at."""
    cuts = stateful_cut_ids(app.plan)
    if not cuts:
        return [app]
    return partition_application(
        app, cuts, spark, transport=transport, queue_kind=queue_kind
    )


def run_partitioned(
    parts: Sequence[Application], spark: SparkSession, *, mode: str = "batch"
):
    """Execute queue-connected parts in dependency order, each in its own
    Spark session (``SparkSession.newSession`` — isolated conf, temp views,
    and listener state over the shared context; the in-sandbox analog of
    the reference deploying each partition as its own job). Returns the
    terminal part's result: batch → its head DataFrame, streaming → the
    memory-sink table / StreamingQuery its sink kind produces."""
    if mode not in ("batch", "streaming"):
        raise ValueError(f"mode {mode!r} (expected batch|streaming)")
    result = None
    for part in parts:
        sess = spark.newSession()
        if mode == "batch":
            result, _obs = part.run_batch(sess)
        else:
            result = part.run_streaming(sess)
    return result
