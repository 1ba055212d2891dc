"""Differential-correctness tier (SURVEY.md §5): every catalog query vs its
DuckDB oracle at sf0.001 — the fast local mirror of the driver's t2 gate."""

from __future__ import annotations

import pytest

from milan_spark.catalog import oracle_sql, queries
from tests.conftest import SF_SMOKE
from tools.check_correctness import compare, duckdb_con

_QUERIES = queries()
_ORACLES = oracle_sql()


@pytest.fixture(scope="module")
def con():
    return duckdb_con(SF_SMOKE)


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(name, spark, con):
    sdf = _QUERIES[name](spark, SF_SMOKE).toPandas()
    if name not in _ORACLES:
        assert len(sdf) >= 0  # rows-only check, mirroring the driver
        return
    odf = con.execute(_ORACLES[name]).fetchdf()
    problems = compare(name, sdf, odf)
    assert not problems, f"{name}: {problems}"
