"""Named vectorized scalar functions addressable by dotted-path reference.

The reference ships UDFs inside its portable IR as ``ApplyFunction`` nodes
holding a ``FunctionReference`` — a (class, method) name pair captured at
macro time (``program/Expression.scala:407``,
``program/internal/ConvertExpressionHost.scala:253-269``) and resolved again
by whichever compiler consumes the serialized program
(``TreeParser.scala:23-120``; scalar codegen
``ScalarFunctionGenerator.scala:121``). The Python analog of "a function the
deserializing side can find" is a dotted import path — ``module:attr`` —
resolved by ``plans.nodes._resolve_function_ref`` at compile time on BOTH
backends.

Functions here take/return ``pandas.Series`` (Arrow-vectorized — the only
acceptable Python hot path); each documents the exact SQL equivalent so
catalog queries using it stay DuckDB-oracle-checkable. User code can point a
plan at any importable function with the same shape — this module is just
the engine's built-in examples plus a stable home for tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def cents(v: pd.Series) -> pd.Series:
    """Half-up cent quantization of a double price column.

    SQL equivalent: ``CAST(FLOOR(value * 100 + 0.5) AS BIGINT)`` — both
    sides evaluate the same IEEE-double expression, so results are
    bit-identical across engines.
    """
    return np.floor(v * 100.0 + 0.5).astype("int64")


def char_fold(s: pd.Series) -> pd.Series:
    """Deterministic polynomial character fold of a string column:
    ``h = (h * 31 + ord(c)) mod 2147483647`` over the UTF-8 code points.

    SQL equivalent (DuckDB): ``list_reduce(list_transform(
    regexp_extract_all(s, '.'), c -> CAST(ascii(c) AS BIGINT)),
    (a, c) -> (a * 31 + c) % 2147483647)`` — the portable string-hash
    shape the sketch operators already oracle-check.
    """

    def fold(text) -> int | None:
        if text is None:
            return None
        h = 0
        for ch in text:
            h = (h * 31 + ord(ch)) % 2147483647
        return h

    return s.map(fold).astype("Int64")
