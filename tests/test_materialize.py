"""operators.materialize — incrementally-maintained aggregate views over a
versioned table: O(delta)+O(view) refresh from appended directories only,
src= watermark idempotence, named error on non-append gaps."""

from __future__ import annotations

import tempfile

import pytest

from milan_spark.errors import MilanAnalysisError
from milan_spark.operators.materialize import (
    read_appends_between,
    refresh_agg_view,
)
from milan_spark.operators.versioned import (
    commit_append,
    commit_merge,
    read_version,
)

MEASURES = {
    "n": ("count", "*"),
    "total": ("sum", "v"),
    "lo": ("min", "v"),
    "hi": ("max", "v"),
}


def _df(spark, rows):
    return spark.createDataFrame(rows, "k string, v long")


def _view(spark, path):
    return {
        r["k"]: (r["n"], r["total"], r["lo"], r["hi"])
        for r in read_version(spark, path).collect()
    }


@pytest.fixture()
def paths():
    return (tempfile.mkdtemp(prefix="milan_mv_src_"),
            tempfile.mkdtemp(prefix="milan_mv_view_"))


def test_incremental_refresh_matches_full_recompute(spark, paths):
    src, view = paths
    commit_append(_df(spark, [("a", 1), ("a", 5), ("b", 2)]), src)
    r1 = refresh_agg_view(spark, src, view, ["k"], MEASURES)
    assert r1["mode"] == "full" and r1["source_version"] == 1
    assert _view(spark, view) == {"a": (2, 6, 1, 5), "b": (1, 2, 2, 2)}

    commit_append(_df(spark, [("a", 10), ("c", 7)]), src)
    commit_append(_df(spark, [("b", -4)]), src)
    r2 = refresh_agg_view(spark, src, view, ["k"], MEASURES)
    assert r2["mode"] == "incremental" and r2["source_version"] == 3
    assert _view(spark, view) == {
        "a": (3, 16, 1, 10), "b": (2, -2, -4, 2), "c": (1, 7, 7, 7),
    }
    # idempotent: up-to-date view refreshes as a no-op (no new commit)
    r3 = refresh_agg_view(spark, src, view, ["k"], MEASURES)
    assert r3["mode"] == "noop"
    assert r3["view_version"] == r2["view_version"]


def test_read_appends_between_is_only_the_delta(spark, paths):
    src, _ = paths
    commit_append(_df(spark, [("a", 1)]), src)
    commit_append(_df(spark, [("b", 2), ("c", 3)]), src)
    commit_append(_df(spark, [("d", 4)]), src)
    got = sorted(
        r["k"] for r in read_appends_between(spark, src, 1, 3).collect()
    )
    assert got == ["b", "c", "d"]


def test_non_append_gap_raises_and_full_refresh_recovers(spark, paths):
    src, view = paths
    commit_append(_df(spark, [("a", 1), ("b", 2)]), src)
    refresh_agg_view(spark, src, view, ["k"], MEASURES)
    commit_merge(spark, _df(spark, [("a", 100)]), src, ["k"])
    with pytest.raises(MilanAnalysisError, match="op='merge'"):
        refresh_agg_view(spark, src, view, ["k"], MEASURES)
    r = refresh_agg_view(spark, src, view, ["k"], MEASURES, full=True)
    assert r["mode"] == "full"
    assert _view(spark, view) == {"a": (1, 100, 100, 100), "b": (1, 2, 2, 2)}


def test_unmergeable_aggregate_named_error(spark, paths):
    src, view = paths
    commit_append(_df(spark, [("a", 1)]), src)
    with pytest.raises(MilanAnalysisError, match="not.*mergeable"):
        refresh_agg_view(
            spark, src, view, ["k"], {"m": ("avg", "v")}
        )
