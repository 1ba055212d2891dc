"""operators.constraints — one-pass rule reports, NULL-counts-as-violation
discipline, quarantine splitting with failure signatures."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from milan_spark.errors import MilanAnalysisError
from milan_spark.operators.constraints import (
    constraint_report,
    quarantine,
)

ROWS = [
    (1, 10.0, "O"),
    (2, -5.0, "O"),     # negative price
    (3, 7.0, "X"),      # bad status
    (4, None, "F"),     # NULL price -> violation (cannot prove valid)
    (None, 3.0, "F"),   # NULL key
]
SCHEMA = "k long, price double, status string"

def _rules():
    # built lazily: Column construction needs an active SparkContext
    return {
        "price_positive": F.col("price") > 0,
        "status_known": F.col("status").isin("O", "F", "P"),
        "key_present": F.col("k").isNotNull(),
    }


def test_constraint_report_one_pass_counts(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    rep = {r["rule"]: (r["n_violations"], r["n_rows"])
           for r in constraint_report(df, _rules()).collect()}
    assert rep == {
        "price_positive": (2, 5),  # -5 and NULL
        "status_known": (1, 5),
        "key_present": (1, 5),
    }
    with pytest.raises(MilanAnalysisError, match="no rules"):
        constraint_report(df, {})


def test_quarantine_signatures_and_complement(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    valid, invalid = quarantine(df, _rules())
    assert [r["k"] for r in valid.collect()] == [1]
    sig = {r["k"]: sorted(r["failed_rules"]) for r in invalid.collect()}
    assert sig[2] == ["price_positive"]
    assert sig[3] == ["status_known"]
    assert sig[4] == ["price_positive"]
    assert sig[None] == ["key_present"]
    assert valid.count() + invalid.count() == df.count()


def test_null_allowed_when_rule_says_so(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    rules = {"price_ok": F.col("price").isNull() | (F.col("price") > 0)}
    rep = constraint_report(df, rules).collect()[0]
    assert rep["n_violations"] == 1  # only -5 now


def test_audited_append_publishes_clean_quarantines_bad(spark, tmp_path):
    from milan_spark.operators.constraints import audited_append
    from milan_spark.operators.versioned import read_version

    df = spark.createDataFrame(ROWS, SCHEMA)
    tbl, q = str(tmp_path / "tbl"), str(tmp_path / "quarantine")
    rep = audited_append(df, tbl, _rules(), quarantine_path=q)
    assert rep["n_valid"] == 1 and rep["n_invalid"] == 4
    assert rep["version"] == 1 and rep["quarantine_version"] == 1
    assert [r["k"] for r in read_version(spark, tbl).collect()] == [1]
    quar = read_version(spark, q)
    assert quar.count() == 4 and "failed_rules" in quar.columns
    sigs = {tuple(sorted(r["failed_rules"])) for r in quar.collect()}
    assert ("status_known",) in sigs


def test_audited_append_require_clean_aborts_atomically(spark, tmp_path):
    from milan_spark.errors import MilanAnalysisError
    from milan_spark.operators.constraints import audited_append
    from milan_spark.operators.versioned import current_version

    df = spark.createDataFrame(ROWS, SCHEMA)
    tbl = str(tmp_path / "tbl")
    with pytest.raises(MilanAnalysisError, match="nothing committed"):
        audited_append(df, tbl, _rules(), require_clean=True)
    assert current_version(tbl) == 0  # truly nothing became visible


def test_audited_versioned_sink_idempotent_per_batch(spark, tmp_path):
    from milan_spark.operators.constraints import audited_versioned_sink
    from milan_spark.operators.versioned import current_version, read_version

    tbl, q = str(tmp_path / "tbl"), str(tmp_path / "quarantine")
    write = audited_versioned_sink(tbl, _rules(), quarantine_path=q)
    df = spark.createDataFrame(ROWS, SCHEMA)
    write(df, 0)
    write(spark.createDataFrame([(7, 1.0, "P")], SCHEMA), 1)
    write(df, 0)  # replayed batch: no new versions anywhere
    assert current_version(tbl) == 2
    assert current_version(q) == 1
    assert sorted(r["k"] for r in read_version(spark, tbl).collect()) == [1, 7]
    assert read_version(spark, q).count() == 4
