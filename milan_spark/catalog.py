"""Query catalog: every implemented operator exposed as a named query with a
DuckDB oracle.

This is the correctness gate described in the driver contract
(``__spark_entry__.py``): each entry pairs a Spark builder
``(spark, sf_dir) -> DataFrame`` with the equivalent ANSI SQL that DuckDB runs
on the same parquet tables. Column names/aliases match exactly on both sides.

Determinism rules used throughout (so value hashes match bit-for-bit):
- double aggregations go through DECIMAL casts (order-independent exact sums)
  and are cast back to DOUBLE at the end — both engines round the same exact
  decimal to the same double;
- averages are computed as exact decimal sum / count in double arithmetic;
- argmin/argmax ties are broken on an explicit unique column;
- no query relies on row order (the driver compares order-insensitively).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → non-SQL-expressible; driver does rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default=())


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = "", tags: tuple[str, ...] = ()):
    def deco(fn):
        REGISTRY[name] = QuerySpec(name=name, build=fn, oracle=oracle, doc=doc, tags=tags)
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _ensure_loaded()
    return {name: spec.build for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}


_loaded = False


def _ensure_loaded():
    global _loaded
    if _loaded:
        return
    # Import for registration side effects.
    from milan_spark.queries import core  # noqa: F401

    try:
        from milan_spark.queries import windows  # noqa: F401
    except ImportError:
        pass
    try:
        from milan_spark.queries import scans  # noqa: F401
    except ImportError:
        pass
    try:
        from milan_spark.queries import joins  # noqa: F401
    except ImportError:
        pass
    try:
        from milan_spark.queries import llm_pipeline  # noqa: F401
    except ImportError:
        pass
    try:
        from milan_spark.queries import streaming  # noqa: F401
    except ImportError:
        pass
    try:
        from milan_spark.queries import advanced  # noqa: F401
    except ImportError:
        pass
    try:
        from milan_spark.queries import analytics  # noqa: F401
    except ImportError:
        pass
    try:
        from milan_spark.queries import subqueries  # noqa: F401
    except ImportError:
        pass
    _loaded = True
