"""Data sources (SURVEY.md §2.1).

The reference models sources as config objects attached per stream id
(``milan-lang/.../application/sources/*.scala``); here each maps to the
idiomatic Spark reader. Unlike the reference — which pins every source to
parallelism 1 (``flink/runtime/DataSourceUtil.scala:58-60``) — Spark readers
parallelize natively; we deliberately do not reproduce that bottleneck.

| reference                              | here                         |
|----------------------------------------|------------------------------|
| ListDataSource (ListDataSource.scala:22)   | :func:`list_source`      |
| FileDataSource Once (FileDataSource.scala:22) | :func:`file_source`   |
| FileDataSource Continuous (:60-75)     | :func:`file_stream_source`   |
| S3DataSource (S3DataSource.scala:21)   | same readers on ``s3a://``   |
| CsvDataInputFormat (CsvDataInputFormat.scala:42-48) | fmt="csv" opts  |
| JsonDataInputFormat (JsonDataInputFormat.scala:21)  | fmt="json"      |
| Kinesis/DynamoDb/Sqs sources           | out of scope (connectors)    |
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
    reader = spark.readStream.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    if options:
        reader = reader.options(**options)
    return reader.load(path)


def load_tables(spark: SparkSession, sf_dir: str, tables: Sequence[str] = TPCH_TABLES) -> dict[str, DataFrame]:
    """Load the driver-provided parquet tables for a scale factor."""
    return {t: table(spark, sf_dir, t) for t in tables}


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver-provided table, normalizing nanosecond timestamps.

    ``events.parquet`` stores TIMESTAMP(NANOS), which Spark reads only as a
    raw long (``spark.sql.legacy.parquet.nanosAsLong``); convert back to a
    microsecond timestamp so downstream semantics (and the DuckDB oracle,
    whose values are micro-precision) line up.
    """
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # integer division: double division would lose precision on epoch-nanos
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        # keep original column order
        df = df.select("event_id", "ts", "user_id", "event_type", "value", "props")
    return df
