"""Scalar and aggregate function surface (SURVEY.md §2.2, §2.4).

The reference's built-in aggregate set is fixed — sum/min/max/mean/any/count/
argmin/argmax (``milan-lang/.../lang/aggregation.scala:29-49``, incremental
impls ``flink/runtime/BuiltinAggregateFunctions.scala``). Its scalar algebra is
comparisons, boolean ops, +/-, null checks, if-then-else and casts
(``program/Expression.scala:556-724``); everything else goes through the
``ApplyFunction`` UDF escape hatch.

Here the aggregates map to JVM-side built-ins (``F.min_by``/``F.max_by`` for
argmin/argmax — no custom state machine needed), the scalar algebra is plain
Column operators, and the UDF escape hatch is :func:`apply_function`. We
additionally re-export the full pyspark function library (the engine's
"exceeds-parity" scalar surface).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, functions as F

# Full Spark scalar library passthrough: milan_spark.functions.upper, etc.
from pyspark.sql.functions import *  # noqa: F401,F403


def _col(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


# --- Milan built-in aggregates (lang/aggregation.scala:29-49) ---------------

def agg_sum(c) -> Column:
    return F.sum(_col(c))


def agg_min(c) -> Column:
    return F.min(_col(c))


def agg_max(c) -> Column:
    return F.max(_col(c))


def agg_mean(c) -> Column:
    return F.avg(_col(c))


def agg_count() -> Column:
    return F.count(F.lit(1))


def agg_any(c) -> Column:
    """Milan's ``any``: an arbitrary input value (BuiltinAggregateFunctions.scala:63).

    ``F.first`` over a deterministically ordered input; callers that need a
    stable choice should pre-sort or use :func:`arg_min` on ``__seq``.
    """
    return F.first(_col(c), ignorenulls=False)


def arg_max(arg, out) -> Column:
    """Milan ``argmax(arg, out)``: value of ``out`` on the record maximizing
    ``arg`` (AggregateExpressions.scala:91). Ties: Milan keeps the earliest
    arrival; pair ``arg`` with a negated ``__seq`` tiebreak when determinism
    matters (see operators.scans.arg_compare_tiebreak).
    """
    return F.max_by(_col(out), _col(arg))


def arg_min(arg, out) -> Column:
    return F.min_by(_col(out), _col(arg))


MILAN_AGGREGATES = {
    "sum": agg_sum,
    "min": agg_min,
    "max": agg_max,
    "mean": agg_mean,
    "count": agg_count,
    "any": agg_any,
    "argmax": arg_max,
    "argmin": arg_min,
}


# --- scalar helpers ---------------------------------------------------------

def if_then_else(cond: Column, then: Column, otherwise: Column) -> Column:
    """Milan IfThenElse (Expression.scala:137)."""
    return F.when(cond, then).otherwise(otherwise)


def convert_type(c, to: str) -> Column:
    """Milan ConvertType — .toInt/.toLong/.toString/... (Expression.scala:437)."""
    return _col(c).cast(to)


def apply_function(fn: Callable, return_type, vectorized: bool = True):
    """Milan's ApplyFunction UDF escape hatch (Expression.scala:407).

    The reference captures arbitrary external functions by reference and emits
    direct calls; here the analog is a (preferably pandas-vectorized) UDF.
    """
    if vectorized:
        return F.pandas_udf(fn, return_type)
    return F.udf(fn, return_type)
