"""Guard: no oracle SQL may emit a DuckDB HUGEINT column.

The correctness driver hashes oracle values; DuckDB widens SUM(BIGINT) to
int128, which hash-mismatches Spark's int64 even when every value agrees
(round-1 lesson: four queries lost their hash check to this). Every oracle
aggregate must CAST back to BIGINT.
"""

import os

import duckdb
import pytest

import milan_spark.catalog as cat

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def con():
    if not os.path.isdir(SF_DIR):
        pytest.skip(
            f"test data dir {SF_DIR} absent — set SPARK_GRAFT_TEST_SF_DIR to run the HUGEINT guard"
        )
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def test_no_hugeint_oracle_columns(con):
    bad = []
    for name, sql in cat.oracle_sql().items():
        rel = con.sql(sql)
        hug = [c for c, ty in zip(rel.columns, rel.types) if "HUGEINT" in str(ty).upper()]
        if hug:
            bad.append((name, hug))
    assert not bad, f"oracles emitting HUGEINT (cast to BIGINT): {bad}"
