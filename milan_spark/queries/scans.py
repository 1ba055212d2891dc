"""Running-scan queries (SURVEY.md §2.6) with DuckDB oracles.

Arrival order = ``event_id`` (the driver data's monotonic id), mirroring the
reference's per-record sequence numbers.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, functions as F

from milan_spark.catalog import REGISTRY, register
from milan_spark.operators.scans import last, running_sum_by, scan, stream_max_by, stream_min_by
from milan_spark.sources import table

DEC = "decimal(18,6)"


@register(
    "running_sum_by",
    doc="Milan SumBy (StreamExpressions.scala:670, ScanOperations.scala:17-47): "
    "per-user running sum of value in arrival order; cumulative window "
    "aggregate instead of the reference's sequential keyed fold.",
    oracle="""
SELECT event_id, user_id, value,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))) OVER
         (PARTITION BY user_id ORDER BY event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS running_sum
FROM events
""",
)
def running_sum_by_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").withColumn("__dec_value", F.col("value").cast(DEC))
    out = running_sum_by(ev, "__dec_value", keys=["user_id"], seq="event_id", alias="__rs")
    return out.select(
        "event_id", "user_id", "value", F.round(F.col("__rs"), 2).cast("double").alias("running_sum")
    )


@register(
    "stream_max_by",
    doc="Milan MaxBy emit-on-improvement (doc/Milan Operations.md:106-111, "
    "ScanOperations.scala:49-103): per-user, emit an event only when its value "
    "strictly beats every earlier value.",
    oracle="""
SELECT event_id, user_id, value
FROM (
  SELECT event_id, user_id, value,
         MAX(value) OVER (PARTITION BY user_id ORDER BY event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_best
  FROM events
)
WHERE prev_best IS NULL OR value > prev_best
""",
)
def stream_max_by_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return stream_max_by(ev, "value", keys=["user_id"], seq="event_id").select("event_id", "user_id", "value")


@register(
    "stream_min_by_global",
    doc="Milan MinBy, unkeyed: global running minimum improvements. The "
    "reference would pin this to one task; here the prev-window scan still "
    "parallelizes the pre-aggregation.",
    oracle="""
SELECT event_id, user_id, value
FROM (
  SELECT event_id, user_id, value,
         MIN(value) OVER (ORDER BY event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_best
  FROM events
)
WHERE prev_best IS NULL OR value < prev_best
""",
)
def stream_min_by_global_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return stream_min_by(ev, "value", seq="event_id").select("event_id", "user_id", "value")


@register(
    "last_per_key",
    doc="Milan Last keyed (LastOperators.scala:85): final event per user by "
    "sequence number — map-side-combinable max_by.",
    oracle="""
SELECT user_id,
       MAX(event_id) AS event_id,
       arg_max(event_type, event_id) AS event_type,
       arg_max(value, event_id) AS value
FROM events
GROUP BY user_id
""",
)
def last_per_key_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("user_id", "event_id", "event_type", "value")
    return last(ev, keys=["user_id"], seq="event_id").select("user_id", "event_id", "event_type", "value")


@register(
    "scan_threshold",
    doc="Milan Scan — general stateful fold with Option output "
    "(doc/Milan Operations.md:122-133): per-user cents accumulator emitting "
    "once the running total crosses 5000.00; executed as an ordered "
    "applyInPandas fold (the UDF slow path the Scan op is specified to be).",
    oracle="""
SELECT event_id, user_id, CAST(acc_cents AS BIGINT) AS acc_cents
FROM (
  SELECT event_id, user_id,
         SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER
           (PARTITION BY user_id ORDER BY event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS acc_cents
  FROM events
)
WHERE acc_cents > 500000
""",
)
def scan_threshold_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("event_id", "user_id", "value")

    def fold(state, rec):
        state = state + int(math.floor(rec.value * 100 + 0.5))
        if state > 500000:
            return state, {"event_id": rec.event_id, "user_id": rec.user_id, "acc_cents": state}
        return state, None

    return scan(
        ev,
        fold,
        initial_state=0,
        output_schema="event_id long, user_id long, acc_cents long",
        keys=["user_id"],
        seq="event_id",
    )


@register(
    "scan_threshold_rewritten",
    doc="The optimizer's scan-to-window rule end-to-end (SURVEY §4 'optional "
    "Rule[LogicalPlan]'): the same threshold fold as scan_threshold, declared "
    "as a serializable scan_fold plan node, JSON round-tripped, then lowered "
    "by plans.rewrite.optimize to cumulative window aggregates — no Python "
    "fold in the physical plan. Same oracle as the applyInPandas version.",
    oracle="""
SELECT event_id, user_id, CAST(acc_cents AS BIGINT) AS acc_cents
FROM (
  SELECT event_id, user_id,
         SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER
           (PARTITION BY user_id ORDER BY event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS acc_cents
  FROM events
)
WHERE acc_cents > 500000
""",
)
def scan_threshold_rewritten_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from milan_spark.plans.nodes import Node, compile_node, from_json, to_json
    from milan_spark.plans.rewrite import optimize

    plan = Node(
        "scan_fold",
        {
            "state": {"acc": "CAST(0 AS BIGINT)"},
            "update": {"acc": "acc + CAST(floor(value * 100 + 0.5) AS BIGINT)"},
            "output": {"event_id": "event_id", "user_id": "user_id", "acc_cents": "acc"},
            "emit_when": "acc > 500000",
            "keys": ["user_id"],
            "seq": "event_id",
        },
        [
            Node(
                "map",
                {"exprs": ["event_id", "user_id", "value"]},
                [Node("parquet_source", {"path": f"{sf_dir}/events.parquet"})],
            )
        ],
    )
    plan = from_json(to_json(plan))  # portability: the logical plan survives serialization
    return compile_node(optimize(plan, spark), spark)


@register(
    "running_mean_by",
    doc="Milan's documented-but-unimplemented MeanBy "
    "(doc/Milan Operations.md:134-140) via the declarative scan_fold DSL: "
    "two associative state fields (cents sum + count) lowered by the "
    "optimizer to one cumulative window; the mean is floor(acc/n) on exact "
    "integers (engine-independent, same argument as the k-means centroids).",
    oracle="""
SELECT event_id, user_id, n,
       CAST(floor(CAST(acc AS DOUBLE) / n) AS BIGINT) AS mean_cents
FROM (
  SELECT event_id, user_id,
         SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER
           (PARTITION BY user_id ORDER BY event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS acc,
         COUNT(*) OVER
           (PARTITION BY user_id ORDER BY event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n
  FROM events
)
""",
)
def running_mean_by_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from milan_spark.stream import Stream

    ev = table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    return (
        Stream.from_dataframe(ev)
        .scan_fold(
            state={"acc": None, "n": None},
            update={"acc": "acc + CAST(floor(value * 100 + 0.5) AS BIGINT)", "n": "n + 1"},
            output={
                "event_id": "event_id",
                "user_id": "user_id",
                "n": "n",
                "mean_cents": "CAST(floor(CAST(acc AS DOUBLE) / n) AS BIGINT)",
            },
            keys=["user_id"],
            seq="event_id",
        )
        .to_df()
    )


@register(
    "ewma_smoothing",
    doc="Per-user EWMA time-series smoothing as a Milan Scan (the genuinely "
    "sequential fold the Scan op exists for — EWMA is NOT associative, so "
    "no window rewrite applies): alpha = 1/8 realized as the integer "
    "update s += floor((x - s) / 8) over exact cents, so the trajectory "
    "is bit-identical across engines and partitionings. Executed as the "
    "ordered per-key mapInPandas fold; the oracle replays the recurrence "
    "with a DuckDB recursive CTE.",
    oracle="""
WITH RECURSIVE ev AS (
  SELECT event_id, user_id, CAST(floor(value * 100 + 0.5) AS BIGINT) AS x,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
  FROM events
), rec(user_id, rn, event_id, s) AS (
  SELECT user_id, rn, event_id, x FROM ev WHERE rn = 1
  UNION ALL
  SELECT e.user_id, e.rn, e.event_id,
         r.s + CAST(floor((e.x - r.s) / 8.0) AS BIGINT)
  FROM rec r JOIN ev e ON e.user_id = r.user_id AND e.rn = r.rn + 1
)
SELECT event_id, user_id, s AS ewma_cents FROM rec
""",
)
def ewma_smoothing_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("event_id", "user_id", "value")

    def fold(state, rec):
        x = int(math.floor(rec.value * 100 + 0.5))
        state = x if state is None else state + (x - state) // 8
        return state, {"event_id": rec.event_id, "user_id": rec.user_id, "ewma_cents": state}

    return scan(
        ev,
        fold,
        initial_state=None,
        output_schema="event_id long, user_id long, ewma_cents long",
        keys=["user_id"],
        seq="event_id",
    )


@register(
    "ewma_smoothing_from_ir",
    doc="The same non-associative EWMA fold, but carried THROUGH the portable "
    "JSON IR as a dotted-path FunctionReference (scan_fold.fold_ref — the "
    "reference ships Scan step functions in its serialized programs the "
    "same way, StreamExpressions.scala:505 / Expression.scala:407): the "
    "plan is serialized, re-parsed, and compiled by the batch backend, so "
    "this entry proves an opaque fold survives the define/ship/run-"
    "elsewhere lifecycle. Same recursive-CTE oracle as the direct twin.",
    oracle=REGISTRY["ewma_smoothing"].oracle,
)
def ewma_smoothing_from_ir_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from milan_spark.plans.nodes import compile_node, from_json, to_json
    from milan_spark.stream import Stream

    s = (
        Stream.from_parquet(spark, f"{sf_dir}/events.parquet")
        .map("event_id", "user_id", "value")
        .scan(
            "milan_spark.functions.folds:ewma_cents_fold",
            initial_state=None,
            output_schema="event_id long, user_id long, ewma_cents long",
            keys=["user_id"],
            seq="event_id",
        )
    )
    return compile_node(from_json(to_json(s.node)), spark)


@register(
    "ewma_smoothing_event_backend",
    doc="The SAME serialized EWMA plan on the THIRD compiler: the in-process "
    "per-record EventHandler (plans.backend_event — the analog of the "
    "reference's EventHandlerClassGenerator.scala:36-80 embedding target). "
    "Deliberately driver-side: this backend exists to embed a pipeline as "
    "a plain function (a sidecar scoring one record at a time); the "
    "bounded collect IS the point, not a distributed-path defect — the "
    "same JSON plan deploys unchanged to the batch/streaming compilers "
    "when data outgrows one process. The demo runs on a BOUNDED slice "
    "(event_id <= 100000 — every row at the correctness/bench scale "
    "factors, a fixed slice beyond) because an embedded handler's cost is "
    "per-record single-process BY DESIGN: benching it on an unbounded "
    "corpus measures the collect, not the handler; production routes bulk "
    "volume to the distributed backends. Fed in event_id order (arrival "
    "order = processing order, doc/Milan Operations.md:27-51); same "
    "recursive-CTE shape as the other backends' twins, slice-filtered.",
    oracle=REGISTRY["ewma_smoothing"].oracle.replace(
        "FROM events", "FROM events WHERE event_id <= 100000"
    ),
)
def ewma_smoothing_event_backend_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from milan_spark.plans.backend_event import compile_event
    from milan_spark.plans.nodes import from_json, to_json
    from milan_spark.stream import Stream

    path = f"{sf_dir}/events.parquet"
    s = (
        Stream.from_parquet(spark, path)
        .map("event_id", "user_id", "value")
        .scan(
            "milan_spark.functions.folds:ewma_cents_fold",
            initial_state=None,
            output_schema="event_id long, user_id long, ewma_cents long",
            keys=["user_id"],
            seq="event_id",
        )
    )
    handler = compile_event(
        from_json(to_json(s.node)),
        schemas={path: ["event_id", "user_id", "ts", "event_type", "value"]},
    )
    rows = (
        spark.read.parquet(path)
        .filter("event_id <= 100000")  # the bounded demo slice (see doc)
        .select("event_id", "user_id", "value")
        .orderBy("event_id")
        .collect()
    )
    out = handler.process_many(r.asDict() for r in rows)
    return spark.createDataFrame(
        [(d["event_id"], d["user_id"], d["ewma_cents"]) for d in out],
        schema="event_id long, user_id long, ewma_cents long",
    )
