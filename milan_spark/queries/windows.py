"""Time/record/session window queries (SURVEY.md §2.5) with DuckDB oracles.

Window-start semantics: Spark's ``F.window`` is epoch-aligned with optional
offset — the oracles reproduce the assignment with date_trunc / epoch
arithmetic. The window start is the output key, matching the reference's
"group key = window start" rule (doc/Streams in Milan and streaming
operations.md:70-71).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from milan_spark.catalog import register
from milan_spark.operators.windows import record_window, session_window_agg, sliding_window, tumbling_window
from milan_spark.sources import table

DEC = "decimal(18,6)"


@register(
    "tumbling_window_daily",
    doc="Milan TumblingWindow (GroupingExpressions.scala:173): daily event "
    "counts and exact sums per event_type.",
    oracle="""
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
       event_type,
       COUNT(*) AS n,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS total
FROM events
GROUP BY 1, 2
""",
)
def tumbling_window_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return tumbling_window(
        ev,
        "ts",
        "1 day",
        keys=["event_type"],
        aggs=[
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value").cast(DEC)), 2).cast("double").alias("total"),
        ],
    )


@register(
    "tumbling_window_offset",
    doc="TumblingWindow with offset (GroupingExpressions.scala:173 'offset "
    "allows one to shift windows in time'): 1-day windows shifted by 6h.",
    oracle="""
SELECT to_timestamp(CAST(floor((epoch(ts) - 21600) / 86400) AS BIGINT) * 86400 + 21600) AT TIME ZONE 'UTC' AS window_start,
       COUNT(*) AS n
FROM events
GROUP BY 1
""",
)
def tumbling_window_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return tumbling_window(ev, "ts", "1 day", offset="6 hours", aggs=[F.count(F.lit(1)).alias("n")])


@register(
    "sliding_window_hourly",
    doc="Milan SlidingWindow (GroupingExpressions.scala:245, doc/Milan "
    "Operations.md:18-25): 2-hour windows sliding hourly; each record lands "
    "in 2 windows.",
    oracle="""
WITH assigned AS (
  SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) - k * INTERVAL 1 HOUR AS window_start, value
  FROM events, UNNEST([0, 1]) AS t(k)
)
SELECT window_start,
       COUNT(*) AS n,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS total
FROM assigned
GROUP BY 1
""",
)
def sliding_window_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return sliding_window(
        ev,
        "ts",
        size="2 hours",
        slide="1 hour",
        aggs=[
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value").cast(DEC)), 2).cast("double").alias("total"),
        ],
    )


@register(
    "record_window_trailing",
    doc="Milan SlidingRecordWindow (GroupingExpressions.scala:104, "
    "RecordWindowGenerator.scala:19): per-user trailing-5-event aggregate on "
    "every arrival, arrival order = event_id.",
    oracle="""
SELECT event_id, user_id,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))) OVER
         (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS trail_sum,
       COUNT(*) OVER
         (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS trail_n
FROM events
""",
)
def record_window_trailing(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    out = record_window(
        ev,
        5,
        {
            "__trail_sum_dec": F.sum(F.col("value").cast(DEC)),
            "trail_n": F.count(F.lit(1)),
        },
        keys=["user_id"],
        seq="event_id",
    )
    return out.select(
        "event_id",
        "user_id",
        F.round(F.col("__trail_sum_dec"), 2).cast("double").alias("trail_sum"),
        "trail_n",
    )


@register(
    "session_window_gap",
    doc="Session windows (exceeds-parity, SURVEY §2.5 'absent — free if "
    "exposed'): per-user sessions with a 30-minute inactivity gap.",
    oracle="""
WITH e AS (
  -- truncate TIMESTAMP_NS to Spark's microsecond timestamps
  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events
), d AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN LAG(ts) OVER w IS NULL
                   OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM d
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       COUNT(*) AS n_events
FROM s
GROUP BY user_id, sid
""",
)
def session_window_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return session_window_agg(
        ev, "ts", "30 minutes", keys=["user_id"], aggs=[F.count(F.lit(1)).alias("n_events")]
    ).select("user_id", "session_start", "session_end", "n_events")


@register(
    "tumbling_window_event_backend",
    doc="The round-9 event-backend widening exercised end-to-end: a "
    "serialized tumbling-window aggregate plan (group_by(event_type)."
    "tumbling_window(ts, 1 day).select(count, sum)) compiled by the "
    "in-process per-record EventHandler, which replays Catalyst's "
    "TimeWindowing assignment per record and emits refinements; the final "
    "snapshot per (window_start, event_type) is returned and hash-matched "
    "against plain GROUP BY SQL — training emission cadence AND window "
    "math pinned at once. Deliberately driver-side on the bounded demo "
    "slice (event_id <= 100000), like ewma_smoothing_event_backend: this "
    "backend embeds a pipeline as a plain function; bulk volume routes to "
    "the batch/streaming compilers from the SAME JSON.",
    oracle="""
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
       event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents
FROM events
WHERE event_id <= 100000
GROUP BY 1, 2
""",
)
def tumbling_window_event_backend_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from milan_spark.plans.backend_event import compile_event
    from milan_spark.plans.nodes import from_json, to_json
    from milan_spark.stream import Stream

    path = f"{sf_dir}/events.parquet"
    s = (
        Stream.from_parquet(spark, path)
        .map(
            "event_type",
            "CAST(ts AS TIMESTAMP) AS ts",
            "CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents",
        )
        .group_by("event_type")
        .tumbling_window("ts", "1 day")
        .select(n="count(*)", total_cents="sum(cents)")
    )
    handler = compile_event(
        from_json(to_json(s.node)),
        schemas={path: ["event_id", "user_id", "ts", "event_type", "value"]},
    )
    rows = (
        table(spark, sf_dir, "events")  # nanos-safe ts read
        .filter("event_id <= 100000")  # the bounded demo slice (see doc)
        .select("event_id", "ts", "event_type", "value")
        .orderBy("event_id")
        .collect()
    )
    # per-record refinement emissions; the LAST per group is the answer
    final: dict[tuple, dict] = {}
    for d in handler.process_many(r.asDict() for r in rows):
        final[(d["window_start"], d["event_type"])] = d
    return spark.createDataFrame(
        [
            (d["window_start"], d["event_type"], d["n"], d["total_cents"])
            for d in final.values()
        ],
        schema="window_start timestamp, event_type string, n long, total_cents long",
    )
