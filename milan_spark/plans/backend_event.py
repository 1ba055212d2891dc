"""In-process per-record event backend — the THIRD compiler over the Node IR.

The reference compiles the same serialized program three ways: a Flink job,
an AWS deployment, and a plain in-process event handler used for embedding
and fast tests (``milan-scala-compiler/.../event/EventHandlerClassGenerator
.scala:36-80`` generates a class whose ``processRecord`` methods walk the
graph one record at a time; ``ScalaStreamCompiler.scala:18-43`` drives it).
This module is that third target for the engine's IR: :func:`compile_event`
turns a serializable plan into an :class:`EventHandler` — call
``handler.process(record)`` and get the records the plan's root emits, no
SparkSession, no job, microsecond latency.

Scalar expressions are evaluated by ``milan_spark.expr`` (the documented SQL
subset, parsed once at compile time); stateful operators replicate the
``streaming.stateful`` state machines exactly — per-key value state for
enrichment joins, accumulators for cumulative folds, strict-improvement
emission for MaxBy/MinBy — so the three backends agree on the same JSON
plan (``tests/test_event_backend.py`` pins this three-way).

Supported ops: ``external_stream`` / sources (entry points; leaf schemas
supplied by the caller), ``filter``, ``map``, ``add_fields``, ``union``,
``left/full/left_inner_enrichment_join``, ``cum_window``,
``running_sum_by``, ``stream_max_by`` / ``stream_min_by``, and ``scan_fold``
(associative form lowered through the optimizer rule; opaque form resolved
from its ``fold_ref`` FunctionReference). Everything else raises a
:class:`~milan_spark.errors.MilanAnalysisError` naming the op — cycles are
rejected by name exactly like the reference's event compiler
(``EventHandlerClassGenerator.scala:23`` "Cycles are not supported").

Ordering contract: the caller's call order IS the arrival order (the
reference's processing-order-equals-arrival-order rule,
``doc/Milan Operations.md:27-51``). To reproduce the batch/streaming
backends' results, feed records in ``(seq, right-before-left)`` order — the
tie rule their state machines sort by.

Scale note: this backend is deliberately NOT the 100 TB path — it exists so
a pipeline can be embedded (a sidecar scoring one record, a unit test
running without a JVM). The same JSON plan deploys unchanged to the batch or
streaming compiler when the data outgrows one process.
"""

from __future__ import annotations

from types import SimpleNamespace
from typing import Callable, Mapping, Sequence

from milan_spark.errors import MilanAnalysisError
from milan_spark.expr import compile_expr, compile_projection
from milan_spark.operators.joins import _prefixed
from milan_spark.plans.nodes import Node, _resolve_function_ref

_SOURCE_OPS = frozenset({"external_stream", "parquet_source", "file_source", "list_source"})

_JOIN_OPS = frozenset(
    {"left_enrichment_join", "full_enrichment_join", "left_inner_enrichment_join"}
)


def _schema_cols(spec) -> list[str]:
    if isinstance(spec, str):
        # DDL string: "a bigint, b string" (struct nesting unsupported here)
        return [part.strip().split()[0] for part in spec.split(",") if part.strip()]
    return list(spec)


class _Op:
    """One compiled operator: ``step(input_idx, record_dict) -> [records]``."""

    def __init__(self, columns: list[str], step: Callable[[int, dict], list[dict]]):
        self.columns = columns
        self.step = step


def _identity_op(columns: list[str]) -> _Op:
    return _Op(columns, lambda idx, rec: [rec])


def _compile_filter(n: Node, ins: list[_Op]) -> _Op:
    cond = compile_expr(n.params["condition"])
    return _Op(ins[0].columns, lambda idx, rec: [rec] if cond(rec) is True else [])


def _compile_map(n: Node, ins: list[_Op]) -> _Op:
    in_cols = ins[0].columns
    items: list[tuple[str, Callable]] = []
    for text in n.params["exprs"]:
        if text.strip() == "*":
            items.extend((c, (lambda env, c=c: env[c])) for c in in_cols)
            continue
        alias, fn = compile_projection(text)
        if alias is None:
            raise MilanAnalysisError(
                f"map [{n.node_id}]: computed column {text!r} needs an "
                "explicit AS alias on the event backend"
            )
        items.append((alias, fn))
    cols = [a for a, _ in items]
    return _Op(cols, lambda idx, rec: [{a: fn(rec) for a, fn in items}])


def _compile_add_fields(n: Node, ins: list[_Op]) -> _Op:
    in_cols = ins[0].columns
    fields = [(name, compile_expr(e)) for name, e in n.params["fields"].items()]
    cols = list(in_cols)
    for name, _ in fields:
        if name not in cols:
            cols.append(name)

    def step(idx, rec):
        out = dict(rec)
        for name, fn in fields:
            out[name] = fn(out)  # withColumn semantics: later fields see earlier
        return [out]

    return _Op(cols, step)


def _null_or_nan(v) -> bool:
    return v is None or (isinstance(v, float) and v != v)


def _compile_join(n: Node, ins: list[_Op]) -> _Op:
    p = n.params
    if p.get("residual"):
        raise MilanAnalysisError(
            f"{n.op} [{n.node_id}]: residual conditions have no event-backend "
            "realization; evaluate on the batch/streaming compilers"
        )
    left_on = list(p["left_on"])
    right_on = list(p["right_on"])
    lcols, rcols = ins[0].columns, ins[1].columns
    rename = _prefixed(lcols, rcols, p.get("right_prefix", "r_"))
    out_cols = list(lcols) + [rename[c] for c in rcols]
    lkey, rkey = set(left_on), set(right_on)

    def emit(key: tuple, l: dict | None, r: dict | None) -> dict:
        out = {}
        for c in lcols:
            if c in lkey:
                out[c] = key[left_on.index(c)]
            else:
                out[c] = None if l is None else l[c]
        for c in rcols:
            name = rename[c]
            if c in rkey:
                out[name] = key[right_on.index(c)]
            else:
                out[name] = None if r is None else r[c]
        return out

    state: dict[tuple, list] = {}

    if n.op == "left_enrichment_join":
        def step(idx, rec):
            key = (
                tuple(rec[c] for c in left_on) if idx == 0
                else tuple(rec[c] for c in right_on)
            )
            if idx == 1:  # right arrival updates state, emits nothing
                state[key] = [rec]
                return []
            st = state.get(key)
            return [emit(key, rec, st[0] if st else None)]
    elif n.op == "full_enrichment_join":
        def step(idx, rec):
            key = (
                tuple(rec[c] for c in left_on) if idx == 0
                else tuple(rec[c] for c in right_on)
            )
            st = state.setdefault(key, [None, None])
            st[idx] = rec
            return [emit(key, st[0], st[1])]
    else:  # left_inner_enrichment_join: buffer lefts until the first right
        def step(idx, rec):
            if idx == 0:
                key = tuple(rec[c] for c in left_on)
                st = state.setdefault(key, [None, []])
                if st[0] is not None:
                    return [emit(key, rec, st[0])]
                st[1].append(rec)
                return []
            key = tuple(rec[c] for c in right_on)
            st = state.setdefault(key, [None, []])
            st[0] = rec
            buffered, st[1] = st[1], []
            return [emit(key, l, rec) for l in buffered]

    return _Op(out_cols, step)


# init ⊕ cum, matching the batch realization (operators.scans.cum_fold):
# SQL + propagates NULL; greatest/least SKIP NULLs
_CUM_INIT_COMBINE = {
    "sum": lambda i, c: None if i is None or c is None else i + c,
    "max": lambda i, c: c if i is None else (i if c is None else max(i, c)),
    "min": lambda i, c: c if i is None else (i if c is None else min(i, c)),
}


def _compile_cum(n: Node, ins: list[_Op], folds: dict[str, tuple[str, str, str | None]], keys: list[str]) -> _Op:
    """Shared core of cum_window / running_sum_by: per-key accumulators with
    SQL null-skipping; a non-identity init folds in post-scan as init ⊕ cum
    (bit-matching the batch window realization and the streaming fold)."""
    in_cols = ins[0].columns
    names = list(folds)
    compiled = {
        # identity init ("0"/None) skips the combine entirely — the same
        # COMPILE-time test the batch realization applies to the init SQL
        name: (
            kind,
            compile_expr(arg),
            compile_expr(init) if (init is not None and init.strip() != "0") else None,
        )
        for name, (kind, arg, init) in folds.items()
    }
    cols = list(in_cols) + [nm for nm in names if nm not in in_cols]
    state: dict[tuple, list] = {}

    def step(idx, rec):
        key = tuple(rec[c] for c in keys)
        acc = state.setdefault(key, [None] * len(names))
        out = dict(rec)
        for i, name in enumerate(names):
            kind, argfn, initfn = compiled[name]
            v = argfn(rec)
            if not _null_or_nan(v):
                cur = acc[i]
                if cur is None:
                    acc[i] = v
                elif kind == "sum":
                    acc[i] = cur + v
                elif kind == "max":
                    acc[i] = max(cur, v)
                else:
                    acc[i] = min(cur, v)
            val = acc[i]
            if initfn is not None:
                val = _CUM_INIT_COMBINE[kind](initfn(rec), val)
            out[name] = val
        return [out]

    return _Op(cols, step)


def _compile_arg_compare(n: Node, ins: list[_Op], maximize: bool) -> _Op:
    argfn = compile_expr(n.params["arg"])
    keys = list(n.params.get("keys", []))
    best: dict[tuple, object] = {}

    def step(idx, rec):
        v = argfn(rec)
        if _null_or_nan(v):
            return []
        key = tuple(rec[c] for c in keys)
        cur = best.get(key)
        if cur is None or (v > cur if maximize else v < cur):
            best[key] = v
            return [dict(rec)]
        return []

    return _Op(ins[0].columns, step)


def _compile_scan_ref(n: Node, ins: list[_Op]) -> _Op:
    p = n.params
    fold = _resolve_function_ref(p["fold_ref"], n.node_id)
    keys = list(p.get("keys", []))
    out_cols = _schema_cols(p["output_schema"])
    init = p.get("initial_state")
    state: dict[tuple, object] = {}

    def step(idx, rec):
        key = tuple(rec[c] for c in keys)
        st, out = fold(state.get(key, init), SimpleNamespace(**rec))
        state[key] = st
        return [dict(out)] if out is not None else []

    return _Op(out_cols, step)


class EventHandler:
    """Push-based per-record executor over a compiled plan.

    ``process(record, stream=None)`` injects one record (a mapping of column
    name → value) at the named entry stream and returns the list of records
    the plan root emits for it, as dicts in ``columns`` order. ``stream`` may
    be an ``external_stream`` id, a source node's id, or a source path; it is
    optional when the plan has exactly one entry.
    """

    def __init__(self, root_op: _Op, entries: dict[str, str],
                 parents: dict[str, list[tuple[str, int]]],
                 ops: dict[str, _Op], root_id: str):
        self._root = root_op
        self._entries = entries
        self._parents = parents
        self._ops = ops
        self._root_id = root_id

    @property
    def columns(self) -> list[str]:
        return list(self._root.columns)

    def entry_streams(self) -> list[str]:
        return sorted(self._entries)

    def process(self, record: Mapping, stream: str | None = None) -> list[dict]:
        if stream is None:
            ids = set(self._entries.values())
            if len(ids) != 1:
                raise MilanAnalysisError(
                    f"plan has {len(ids)} entry streams {self.entry_streams()}; "
                    "pass stream=..."
                )
            nid = next(iter(ids))
        else:
            try:
                nid = self._entries[stream]
            except KeyError:
                raise MilanAnalysisError(
                    f"unknown entry stream {stream!r}; plan entries: "
                    f"{self.entry_streams()}"
                ) from None
        out: list[dict] = []
        self._pump(nid, dict(record), out)
        return out

    def process_many(self, records) -> list[dict]:
        """Drive ``(stream, record)`` pairs (or bare records for single-entry
        plans) in order; returns all emitted records."""
        out: list[dict] = []
        for item in records:
            if isinstance(item, tuple) and len(item) == 2 and isinstance(item[0], str):
                out.extend(self.process(item[1], stream=item[0]))
            else:
                out.extend(self.process(item))
        return out

    def _pump(self, nid: str, rec: dict, out: list[dict]) -> None:
        if nid == self._root_id:
            out.append(rec)
        for parent_id, idx in self._parents.get(nid, ()):
            for emitted in self._ops[parent_id].step(idx, rec):
                self._pump(parent_id, emitted, out)


def compile_event(
    node: Node,
    *,
    schemas: Mapping[str, Sequence[str] | str] | None = None,
) -> EventHandler:
    """Compile a serializable plan to an :class:`EventHandler`.

    ``schemas`` provides each entry point's column list (or DDL string),
    keyed by ``external_stream`` id, source node id, or source path — the
    caller-supplied half the other two backends read from file metadata.
    """
    schemas = dict(schemas or {})
    ops: dict[str, _Op] = {}
    parents: dict[str, list[tuple[str, int]]] = {}
    entries: dict[str, str] = {}

    def leaf_schema(n: Node) -> list[str]:
        for key in (
            n.params.get("stream_id"), n.node_id, n.params.get("path"),
        ):
            if key is not None and key in schemas:
                return _schema_cols(schemas[key])
        if n.op == "list_source" and n.params.get("schema"):
            return _schema_cols(n.params["schema"])
        raise MilanAnalysisError(
            f"{n.op} [{n.node_id}]: no schema provided for this entry; pass "
            "schemas={stream_id_or_node_id_or_path: [columns...]}"
        )

    def build(n: Node) -> _Op:
        if n.node_id in ops:
            return ops[n.node_id]
        if n.op in _SOURCE_OPS:
            op = _identity_op(leaf_schema(n))
            for label in (n.params.get("stream_id"), n.node_id, n.params.get("path")):
                if label is not None:
                    entries[label] = n.node_id
        elif n.op == "cycle" or n.op == "cycle_ref":
            # the reference's event compiler rejects cycles by name too
            # (EventHandlerClassGenerator.scala:23)
            raise MilanAnalysisError(
                f"{n.op} [{n.node_id}]: cycles are not supported by the event "
                "backend; compile with plans.nodes.compile_node (batch)"
            )
        else:
            ins = [build(i) for i in n.inputs]
            for idx, child in enumerate(n.inputs):
                parents.setdefault(child.node_id, []).append((n.node_id, idx))
            op = _build_op(n, ins)
        ops[n.node_id] = op
        return op

    def _build_op(n: Node, ins: list[_Op]) -> _Op:
        p = n.params
        if n.op == "filter":
            return _compile_filter(n, ins)
        if n.op == "map":
            return _compile_map(n, ins)
        if n.op == "add_fields":
            return _compile_add_fields(n, ins)
        if n.op == "union":
            cols = ins[0].columns
            return _Op(list(cols), lambda idx, rec: [{c: rec[c] for c in cols}])
        if n.op in _JOIN_OPS:
            return _compile_join(n, ins)
        if n.op == "cum_window":
            return _compile_cum(
                n, ins,
                {name: (s["kind"], s["arg"], s.get("init")) for name, s in p["cols"].items()},
                list(p.get("keys", [])),
            )
        if n.op == "running_sum_by":
            return _compile_cum(
                n, ins,
                {p.get("alias", "running_sum"): ("sum", p["arg"], None)},
                list(p.get("keys", [])),
            )
        if n.op in ("stream_max_by", "stream_min_by"):
            return _compile_arg_compare(n, ins, maximize=(n.op == "stream_max_by"))
        if n.op == "scan_fold":
            if p.get("fold_ref"):
                return _compile_scan_ref(n, ins)
            from milan_spark.plans.rewrite import rule_scan_fold_to_window

            # associative form: same lowering the other two backends use
            # (map? -> filter? -> cum_window over the ORIGINAL input node);
            # the chain bottoms out at the already-compiled input op, found
            # by object identity
            lowered = rule_scan_fold_to_window(n)
            orig_input = n.inputs[0]
            chain: list[Node] = []
            m = lowered
            while m is not orig_input:
                chain.append(m)
                m = m.inputs[0]
            chain.reverse()  # bottom-up: cum_window, then filter/map if any
            sub_ops: list[_Op] = []
            cur = ins[0]
            for m in chain:
                cur = _build_op(m, [cur])
                sub_ops.append(cur)

            def step(idx, rec, _subs=sub_ops):
                recs = [rec]
                for op in _subs:
                    recs = [r2 for r in recs for r2 in op.step(0, r)]
                return recs

            return _Op(cur.columns, step)
        raise MilanAnalysisError(
            f"op {n.op!r} [{n.node_id}] has no event-backend realization; "
            "compile with the batch or streaming compiler"
        )

    root_op = build(node)
    return EventHandler(root_op, entries, parents, ops, node.node_id)
