"""milan_spark — a PySpark-native analytics engine with the query surface of amzn/milan.

The reference (amzn/milan) is a streaming DSL over Flink; this package re-expresses
its data model and operator semantics (SURVEY.md §1–2) over Spark DataFrames,
Catalyst, and Structured Streaming. Architecture is Spark-first: declarative
DataFrame plans, broadcast/AQE-aware joins, window functions for running scans,
Pandas UDFs only where built-ins cannot express the semantics.

Public API:
    from milan_spark import Stream, functions as mf
    s = Stream.from_parquet(spark, path)
    out = s.where("l_quantity > 10").group_by("l_returnflag").select(...)
"""

from milan_spark.application import Application
from milan_spark.errors import MilanAnalysisError
from milan_spark.session import get_spark, SEQ_COL
from milan_spark.stream import Stream

__all__ = ["Application", "MilanAnalysisError", "Stream", "get_spark", "SEQ_COL"]
__version__ = "0.1.0"
