"""Plan-level rewrite rules — the engine's optimizer pass over the Node IR.

The reference's "optimizer" is a handful of syntactic rewrites applied during
code generation (SURVEY.md §4): join-precondition extraction
(``milan-scala-compiler/.../trees/JoinPreconditionExtractor.scala:7-73``),
aggregate decomposition, select simplification. On Spark, Catalyst supplies
almost all of that for free — predicate pushdown, column pruning, partial
aggregation, join reordering — so this module only implements the rewrites
Catalyst *cannot* do because they involve this engine's own logical nodes or
Python-opaque stateful operators:

``rule_scan_fold_to_window``
    The one custom rule SURVEY §4 calls out as worth having: a declarative
    per-key fold (``scan_fold`` node) whose state updates are associative
    (sum / greatest / least) is rewritten into cumulative window aggregates —
    pure JVM window exec instead of an ordered ``applyInPandas`` Python fold.
    The reference special-cases exactly these folds too ("because many
    compilation targets support these higher-level operations",
    ``doc/Milan Operations.md:134-140``).

``rule_grouped_rank_to_window``
    The second half of the same SURVEY §4 rewrite: a rank-shaped grouped
    flat-map (per-group arrival index, the ``grouped_rank`` node) lowers to
    a ``row_number()`` window projection — JVM window exec instead of an
    ``applyInPandas`` grouped-map.

``rule_push_filter_into_left_enrichment``
    Predicate pushdown *through the enrichment join*. The batch enrichment
    join is an opaque composite (window-over-union) and its streaming twin is
    ``applyInPandas`` — Catalyst will not move a filter below either. A
    predicate that references only left-side columns is safe to evaluate
    before the join for the Left variant: left rows never update the
    right-side state, so dropping them early cannot change any other row's
    enrichment. This is the analog of the reference's
    ``JoinPreconditionExtractor`` pre-join conjunct split; the Full /
    LeftInner variants are deliberately excluded (their left arrivals *do*
    affect state / buffering, SURVEY §4 caveat).

``rule_broadcast_small_join_side``
    Cost-based broadcast: ask Catalyst for the optimized-plan size estimate of
    each side of a relational join and hint the small side. AQE can convert a
    shuffle join at runtime, but a plan-time hint skips planning the shuffle
    at all. Sizes come from Catalyst statistics, not guesses.

Rules run bottom-up to a fixpoint via :func:`optimize`. Rules that need a
schema or statistics take a ``SparkSession`` and are skipped when ``optimize``
is called without one (pure plan → plan rewrites still apply).
"""

from __future__ import annotations

import re
from typing import Callable

from milan_spark.plans.nodes import Node, compile_node

SEQ_COL = "__seq"

# --- scan_fold → cumulative window -----------------------------------------

_SUPPORTED = (
    "supported update grammar (state field s): 's + <expr>', '<expr> + s', "
    "'greatest(s, <expr>)', 'least(s, <expr>)' where <expr> references only "
    "record columns; use Stream.scan for general folds"
)


class ScanRewriteError(ValueError):
    pass


def _balanced(expr: str) -> bool:
    depth = 0
    for ch in expr:
        depth += ch == "("
        depth -= ch == ")"
        if depth < 0:
            return False
    return depth == 0


def _mentions(name: str, expr: str) -> bool:
    return re.search(rf"\b{re.escape(name)}\b", expr) is not None


def recognize_update(state: str, all_states: set[str], update: str) -> tuple[str, str]:
    """Classify one state-update expression as (kind, argument-expression).

    kind ∈ {sum, max, min}. Raises :class:`ScanRewriteError` when the update
    is not in the associative grammar — the caller should fall back to the
    general ``Stream.scan`` Python fold.
    """
    u = update.strip()
    s = re.escape(state)
    for fn, kind in (("greatest", "max"), ("least", "min")):
        m = re.fullmatch(rf"{fn}\(\s*{s}\s*,(.+)\)", u, re.IGNORECASE | re.DOTALL)
        if m and _balanced(m.group(1)):
            arg = m.group(1).strip()
            if not any(_mentions(t, arg) for t in all_states):
                return kind, arg
    for pat in (rf"{s}\s*\+(.+)", rf"(.+)\+\s*{s}"):
        m = re.fullmatch(pat, u, re.DOTALL)
        if m and _balanced(m.group(1)):
            arg = m.group(1).strip()
            if not any(_mentions(t, arg) for t in all_states):
                return "sum", arg
    raise ScanRewriteError(f"cannot rewrite update {update!r} for state {state!r}; {_SUPPORTED}")


def rule_scan_fold_to_window(node: Node, spark=None) -> Node | None:
    if node.op != "scan_fold":
        return None
    p = node.params
    if p.get("fold_ref"):
        # opaque fold carried by FunctionReference — both backends dispatch
        # it to the ordered scan directly; there is nothing to lower
        return None
    states = set(p["state"])
    folds = {}
    for name, update in p["update"].items():
        kind, arg = recognize_update(name, states, update)
        folds[name] = {"kind": kind, "arg": arg, "init": p["state"][name]}
    out: Node = Node(
        "cum_window",
        {"cols": folds, "keys": p.get("keys", []), "seq": p.get("seq", SEQ_COL)},
        [node.inputs[0]],
    )
    if p.get("emit_when"):
        out = Node("filter", {"condition": p["emit_when"]}, [out])
    if p.get("output"):
        out = Node("map", {"exprs": [f"{e} AS {a}" for a, e in p["output"].items()]}, [out])
    return out


# --- grouped arrival-index → row_number window -------------------------------


def rule_grouped_rank_to_window(node: Node, spark=None) -> Node | None:
    """Lower a rank-shaped grouped flat-map (``grouped_rank`` node — per-group
    arrival index) to a ``row_number()`` window projection: JVM window exec
    with whole-stage codegen instead of an ``applyInPandas`` Python
    grouped-map. This is the second half of SURVEY §4's optional rewrite
    rule (the first half is ``rule_scan_fold_to_window``): the reference's
    GroupedStream FlatMap examples are almost all rank/arrival-index folds
    that a window function expresses exactly."""
    if node.op != "grouped_rank":
        return None
    p = node.params
    part = ", ".join(p["keys"])
    order = ", ".join(p["order_by"])
    expr = f"row_number() OVER (PARTITION BY {part} ORDER BY {order}) AS {p['alias']}"
    return Node("map", {"exprs": ["*", expr]}, [node.inputs[0]])


# --- predicate pushdown through the enrichment join -------------------------

_SQL_KEYWORDS = frozenset(
    """and or not in is null true false between like rlike case when then else
    end cast as div distinct interval date timestamp double float int bigint
    long string boolean decimal asc desc escape""".split()
)

_IDENT = re.compile(r"\b[A-Za-z_][A-Za-z0-9_]*\b")
_STRING_LIT = re.compile(r"'(?:[^'\\]|\\.)*'")
_CALL = re.compile(r"\b([A-Za-z_][A-Za-z0-9_]*)\s*\(")


def extract_identifiers(condition: str) -> set[str]:
    """Column identifiers referenced by a SQL predicate: all bare words minus
    string literals, function-call names, and SQL keywords."""
    text = _STRING_LIT.sub("''", condition)
    calls = {m.group(1).lower() for m in _CALL.finditer(text)}
    return {
        w
        for w in _IDENT.findall(text)
        if w.lower() not in _SQL_KEYWORDS and w.lower() not in calls and not w.isdigit()
    }


def rule_push_filter_into_left_enrichment(node: Node, spark=None) -> Node | None:
    if node.op != "filter" or spark is None or not isinstance(node.params.get("condition"), str):
        return None
    child = node.inputs[0]
    if child.op != "left_enrichment_join":
        return None
    left, right = child.inputs
    if not (left.is_serializable and right.is_serializable):
        return None
    try:
        left_cols = set(compile_node(left, spark).columns)
        right_cols = set(compile_node(right, spark).columns)
    except Exception:
        return None
    prefix = child.params.get("right_prefix", "r_")
    prefixed_right = {prefix + c for c in right_cols}
    ids = extract_identifiers(node.params["condition"])
    if not ids or not ids <= left_cols or ids & prefixed_right:
        return None
    new_left = Node("filter", {"condition": node.params["condition"]}, [left])
    return Node(child.op, dict(child.params), [new_left, right])


# --- cost-based broadcast hint ----------------------------------------------

DEFAULT_BROADCAST_THRESHOLD = 32 << 20  # bytes; conservative vs executor memory


def _catalyst_size(df) -> int | None:
    try:
        return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        return None


def rule_broadcast_small_join_side(node: Node, spark=None, threshold: int = DEFAULT_BROADCAST_THRESHOLD) -> Node | None:
    if node.op != "relational_join" or spark is None:
        return None
    if any(i.op == "hint" for i in node.inputs):
        return None
    how = node.params.get("how", "inner")
    # Which sides may legally be broadcast for this join type.
    allowed = {"inner": (0, 1), "cross": (0, 1), "left": (1,), "left_outer": (1,), "right": (0,), "right_outer": (0,)}
    if how not in allowed:
        return None
    sizes = []
    for inp in node.inputs:
        if not inp.is_serializable:
            return None
        try:
            sizes.append(_catalyst_size(compile_node(inp, spark)))
        except Exception:
            return None
    if any(s is None for s in sizes):
        return None
    small = 0 if sizes[0] <= sizes[1] else 1
    if small not in allowed[how] or sizes[small] > threshold or sizes[1 - small] <= threshold:
        return None
    inputs = list(node.inputs)
    inputs[small] = Node("hint", {"name": "broadcast"}, [inputs[small]])
    return Node(node.op, dict(node.params), inputs)


# --- driver -----------------------------------------------------------------

RULES: list[Callable[[Node, object], Node | None]] = [
    rule_scan_fold_to_window,
    rule_grouped_rank_to_window,
    rule_push_filter_into_left_enrichment,
    rule_broadcast_small_join_side,
]


def optimize(node: Node, spark=None, rules=None, max_passes: int = 10) -> Node:
    """Apply rewrite rules bottom-up to a fixpoint. Pure plan → plan; the
    input tree is never mutated. Rules needing schemas/statistics are skipped
    when ``spark`` is None."""
    rules = RULES if rules is None else rules

    def one_pass(n: Node) -> tuple[Node, bool]:
        changed = False
        new_inputs = []
        for i in n.inputs:
            ni, ci = one_pass(i)
            changed = changed or ci
            new_inputs.append(ni)
        if changed or any(a is not b for a, b in zip(new_inputs, n.inputs)):
            n = Node(n.op, dict(n.params), new_inputs, serializable=n.serializable)
        for rule in rules:
            out = rule(n, spark)
            if out is not None:
                return out, True
        return n, changed

    for _ in range(max_passes):
        node, changed = one_pass(node)
        if not changed:
            break
    return node
