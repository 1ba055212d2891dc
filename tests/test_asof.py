"""As-of join: direction, tolerance, tie, and null semantics vs a
definitional model."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from milan_spark.operators.joins import asof_join

SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def _dfs(spark, lefts, rights):
    # lefts: (id, key, t); rights deduped per (key, t) keeping max id
    ded = {}
    for i, k, t in rights:
        ded[(k, t)] = max(ded.get((k, t), i), i)
    rrows = [(i, k, t) for (k, t), i in ded.items()]
    ldf = spark.createDataFrame(lefts, "id long, k long, t long")
    rdf = spark.createDataFrame(rrows or [(0, -99, 0)], "id long, k long, t long")
    if not rrows:
        rdf = rdf.filter("k >= 0")
    return ldf, rdf, rrows


def _model(lefts, rrows, tol, direction):
    out = {}
    for i, k, t in lefts:
        if direction == "backward":
            c = [(rt, ri) for ri, rk, rt in rrows if rk == k and rt <= t and (tol is None or t - rt <= tol)]
            best = max(c) if c else None
        else:
            c = [(rt, ri) for ri, rk, rt in rrows if rk == k and rt >= t and (tol is None or rt - t <= tol)]
            best = min(c) if c else None
        out[i] = best[1] if best else None
    return out


def test_asof_backward_basics(spark):
    lefts = [(1, 0, 10), (2, 0, 5), (3, 1, 7)]
    rights = [(10, 0, 5), (11, 0, 9), (12, 1, 8)]
    ldf, rdf, rrows = _dfs(spark, lefts, rights)
    out = asof_join(ldf, rdf, on="k", left_ord="t", right_ord="t")
    got = {r["id"]: r["r_id"] for r in out.collect()}
    # left 1 (t=10) -> right 11 (t=9); left 2 ties right 10 at t=5; left 3 -> none
    assert got == {1: 11, 2: 10, 3: None}


def test_asof_forward_and_tolerance(spark):
    lefts = [(1, 0, 10)]
    rights = [(10, 0, 12), (11, 0, 30)]
    ldf, rdf, _ = _dfs(spark, lefts, rights)
    fwd = asof_join(ldf, rdf, on="k", left_ord="t", right_ord="t", direction="forward")
    assert fwd.first()["r_id"] == 10
    tight = asof_join(ldf, rdf, on="k", left_ord="t", right_ord="t", direction="forward", tolerance=1)
    assert tight.first()["r_id"] is None


@given(
    st.lists(st.tuples(st.integers(0, 20), st.integers(0, 2), st.integers(0, 15)), min_size=1, max_size=12, unique_by=lambda x: x[0]),
    st.lists(st.tuples(st.integers(30, 50), st.integers(0, 2), st.integers(0, 15)), max_size=12),
    st.sampled_from([None, 0, 3]),
    st.sampled_from(["backward", "forward"]),
)
@settings(**SETTINGS)
def test_asof_matches_model(spark, lefts, rights, tol, direction):
    ldf, rdf, rrows = _dfs(spark, lefts, rights)
    out = asof_join(ldf, rdf, on="k", left_ord="t", right_ord="t", tolerance=tol, direction=direction)
    got = {r["id"]: r["r_id"] for r in out.collect()}
    assert got == _model(lefts, rrows, tol, direction)


def test_asof_fractional_ord_not_truncated(spark):
    """Regression: a long cast on the ord axis would collapse 1.5/1.9/1.95
    into one tick and pair a backward join with a FUTURE right row."""
    ldf = spark.createDataFrame([(1, 0, 1.9)], "id long, k long, t double")
    rdf = spark.createDataFrame([(10, 0, 1.5), (11, 0, 1.95)], "id long, k long, t double")
    out = asof_join(ldf, rdf, on="k", left_ord="t", right_ord="t")
    assert out.first()["r_id"] == 10
    fwd = asof_join(ldf, rdf, on="k", left_ord="t", right_ord="t", direction="forward")
    assert fwd.first()["r_id"] == 11
