"""Data sources (SURVEY.md §2.1).

The reference models sources as config objects attached per stream id
(``milan-lang/.../application/sources/*.scala``); here each maps to the
idiomatic Spark reader. Unlike the reference — which pins every source to
parallelism 1 (``flink/runtime/DataSourceUtil.scala:58-60``) — Spark readers
parallelize natively; we deliberately do not reproduce that bottleneck.

| reference                              | here                         |
|----------------------------------------|------------------------------|
| ListDataSource (ListDataSource.scala:22)   | :func:`list_source`      |
| DelayedListDataSource (testing/DelayedListDataSource.scala:68) | :class:`DelayedListSourceBuilder` |
| FileDataSource Once (FileDataSource.scala:22) | :func:`file_source`   |
| FileDataSource Continuous (:60-75)     | :func:`file_stream_source`   |
| S3DataSource (S3DataSource.scala:21)   | same readers on ``s3a://``   |
| CsvDataInputFormat (CsvDataInputFormat.scala:42-48) | fmt="csv" opts  |
| JsonDataInputFormat (JsonDataInputFormat.scala:21)  | fmt="json"      |
| Kinesis/DynamoDb/Sqs sources           | :mod:`milan_spark.sources.queues` (descriptors + local emulation) |
"""

from __future__ import annotations

from typing import Iterable, Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

from milan_spark.session import SEQ_COL

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def list_source(
    spark: SparkSession,
    rows: Iterable,
    schema=None,
    with_seq: bool = False,
) -> DataFrame:
    """In-memory fixed record list (ref: ListDataSource.scala:22).

    ``with_seq`` appends a monotonic ``__seq`` column capturing list order,
    which order-sensitive operators (scans, enrichment joins) key on — the
    analog of the reference's per-record sequence numbers.
    """
    rows = list(rows)
    if with_seq:
        if schema is not None and isinstance(schema, str):
            schema = f"{schema}, {SEQ_COL} long"
            rows = [tuple(r) + (i,) for i, r in enumerate(rows)]
            return spark.createDataFrame(rows, schema=schema)
        df = spark.createDataFrame(rows, schema=schema)
        # zipWithIndex preserves input order deterministically for local lists
        from pyspark.sql.types import LongType, StructField, StructType

        new_schema = StructType(list(df.schema.fields) + [StructField(SEQ_COL, LongType(), False)])
        rdd = df.rdd.zipWithIndex().map(lambda t: tuple(t[0]) + (t[1],))
        return spark.createDataFrame(rdd, schema=new_schema)
    return spark.createDataFrame(rows, schema=schema)


class DelayedListSourceBuilder:
    """Timed in-memory streaming source — the reference's
    ``DelayedListDataSource`` (testing/DelayedListDataSource.scala:68: a list
    of item-or-delay entries built with ``.add(item)`` / ``.wait(delay)``).

    What a streaming job can *observe* from the timed source is which records
    arrive together and in what order — the delays exist to split the list
    into separate arrivals. The default realization is therefore
    deterministic: each delay-separated segment becomes one file in a staged
    directory (mtimes strictly increasing, ``maxFilesPerTrigger=1``), so the
    running query sees exactly one segment per microbatch, in list order —
    the same batch boundaries the wall-clock delays would induce, without
    sleeping. ``real_time=True`` keeps the actual sleeps: a feeder thread
    writes each segment after its recorded delay while the query runs.
    """

    def __init__(self):
        self._segments: list[list] = [[]]
        self._delays: list[float] = []  # seconds to wait BEFORE segment i+1

    def add(self, item) -> "DelayedListSourceBuilder":
        self._segments[-1].append(item)
        return self

    def wait(self, delay_sec: float) -> "DelayedListSourceBuilder":
        self._segments.append([])
        self._delays.append(float(delay_sec))
        return self

    def build(
        self,
        spark: SparkSession,
        schema,
        *,
        staging_dir: str | None = None,
        with_seq: bool = False,
        real_time: bool = False,
    ) -> DataFrame:
        import glob
        import os
        import shutil
        import tempfile
        import threading
        import time

        stage = staging_dir or tempfile.mkdtemp(prefix="milan_delayed_src_")
        os.makedirs(stage, exist_ok=True)
        # Collapse empty segments (consecutive .wait() calls) while summing
        # their delays into the next non-empty segment's wait, so real_time
        # pairs each kept segment with the full accumulated delay before it.
        segments: list[list] = []
        delays: list[float] = []  # delays[i] = seconds to wait BEFORE segments[i]
        acc = 0.0
        for i, seg in enumerate(self._segments):
            if i > 0:
                acc += self._delays[i - 1] if i - 1 < len(self._delays) else 0.0
            if seg:
                segments.append(seg)
                delays.append(acc)
                acc = 0.0
        if with_seq and isinstance(schema, str):
            schema = f"{schema}, {SEQ_COL} long"
        seq = 0

        def write_segment(i: int, seg: list) -> None:
            nonlocal seq
            rows = seg
            if with_seq:
                rows = [tuple(r) + (seq + j,) for j, r in enumerate(seg)]
            sdf = spark.createDataFrame(rows, schema=schema)
            tmpd = os.path.join(stage, f"_tmp_{i}")
            sdf.coalesce(1).write.mode("overwrite").parquet(tmpd)
            part = glob.glob(os.path.join(tmpd, "part-*.parquet"))[0]
            final = os.path.join(stage, f"seg_{i:05d}.parquet")
            os.rename(part, final)
            shutil.rmtree(tmpd)
            # strictly increasing mtimes fix the file-source processing order
            os.utime(final, times=(1_000_000_000 + i, 1_000_000_000 + i))
            seq += len(seg)

        if real_time:
            def feed():
                for i, seg in enumerate(segments):
                    if delays[i]:
                        time.sleep(delays[i])
                    write_segment(i, seg)

            threading.Thread(target=feed, daemon=True).start()
        else:
            for i, seg in enumerate(segments):
                write_segment(i, seg)

        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage)
        )


def delayed_list_source() -> DelayedListSourceBuilder:
    """ref: DelayedListDataSource.builder() (testing/DelayedListDataSource.scala:47)."""
    return DelayedListSourceBuilder()


def file_source(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema=None,
    options: Mapping[str, str] | None = None,
) -> DataFrame:
    """Batch file/directory read (ref: FileDataSource ReadMode.Once).

    CSV options mirror CsvDataInputFormat's ``skipHeader``/``columnSeparator``/
    ``nullIdentifier`` via Spark's ``header``/``sep``/``nullValue``.
    """
    ensure_read_conf(spark)
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    if options:
        reader = reader.options(**options)
    return reader.load(path)


def file_stream_source(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema=None,
    options: Mapping[str, str] | None = None,
) -> DataFrame:
    """Continuous directory monitor (ref: FileDataSource ReadMode.Continuous)."""
    ensure_read_conf(spark)
    reader = spark.readStream.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    if options:
        reader = reader.options(**options)
    return reader.load(path)


def ensure_read_conf(spark: SparkSession) -> SparkSession:
    """Make any SparkSession able to read the driver's parquet, idempotently.

    ``events.parquet`` stores TIMESTAMP(NANOS), which Spark rejects outright
    unless ``spark.sql.legacy.parquet.nanosAsLong`` is set. Our own session
    builder sets it, but callers (the correctness driver, a user's notebook)
    build their own sessions — so every read path re-asserts it at runtime.
    The conf is runtime-settable; setting it twice is a no-op.
    """
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # pinned-static in some builds; session builder already set it
    return spark


def load_tables(spark: SparkSession, sf_dir: str, tables: Sequence[str] = TPCH_TABLES) -> dict[str, DataFrame]:
    """Load the driver-provided parquet tables for a scale factor."""
    return {t: table(spark, sf_dir, t) for t in tables}


def _normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize the events ``ts`` column to a session-tz TIMESTAMP.

    The driver's generator has stored ``ts`` two ways across rounds:
    TIMESTAMP(NANOS) — readable only as a raw long under
    ``nanosAsLong`` — and TIMESTAMP(MICROS, isAdjustedToUTC=false), which
    Spark reads as TIMESTAMP_NTZ. Both normalize to the LTZ micros
    timestamp the operators and the DuckDB oracle (naive micros, UTC
    session) were validated against; the cast is value-preserving because
    every session here runs UTC.
    """
    dt = dict(df.dtypes).get("ts")
    if dt == "bigint":
        # integer division: double division would lose precision on epoch-nanos
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif dt == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    else:
        return df
    # keep original column order
    return df.select("event_id", "ts", "user_id", "event_type", "value", "props")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver-provided table, normalizing the events timestamp."""
    ensure_read_conf(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = _normalize_events_ts(df)
    return df


def versioned_source(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    where=None,
) -> DataFrame:
    """Batch read of a versioned table (``operators.versioned``): the
    current snapshot, a time-travel ``version``, or — with ``where``, a
    list of ``(col, op, value)`` predicates — a manifest-pruned read that
    skips files driver-side via zone maps / Bloom filters and still
    applies the exact predicate."""
    from milan_spark.operators.versioned import read_pruned, read_version

    ensure_read_conf(spark)
    if where:
        return read_pruned(spark, path, where, version)
    return read_version(spark, path, version)
