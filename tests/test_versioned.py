"""operators.versioned — snapshot isolation and time travel over plain
parquet: append/overwrite/merge/compact commit kinds, reader isolation from
concurrent commits, vacuum's reference-counted cleanup, and the crash
protocol (pointer flips last)."""

from __future__ import annotations

import os
import tempfile

import pytest

from milan_spark.errors import MilanAnalysisError
from milan_spark.operators.versioned import (
    commit_append,
    commit_merge,
    commit_overwrite,
    compact,
    current_version,
    read_version,
    vacuum,
    versions,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


def _snap(df):
    return sorted((r["k"], r["v"]) for r in df.collect())


@pytest.fixture()
def tbl():
    return tempfile.mkdtemp(prefix="milan_vtab_")


def test_append_and_time_travel(spark, tbl):
    assert current_version(tbl) == 0
    v1 = commit_append(_df(spark, [(1, "a"), (2, "b")]), tbl, tag="base")
    v2 = commit_append(_df(spark, [(3, "c")]), tbl, tag="delta")
    assert (v1, v2) == (1, 2)
    assert _snap(read_version(spark, tbl)) == [(1, "a"), (2, "b"), (3, "c")]
    assert _snap(read_version(spark, tbl, 1)) == [(1, "a"), (2, "b")]
    ops = [(e["version"], e["op"], e["n_dirs"]) for e in versions(tbl)]
    assert ops == [(1, "append", 1), (2, "append", 2)]


def test_overwrite_keeps_history_readable(spark, tbl):
    commit_append(_df(spark, [(1, "a")]), tbl)
    commit_overwrite(_df(spark, [(9, "z")]), tbl)
    assert _snap(read_version(spark, tbl)) == [(9, "z")]
    assert _snap(read_version(spark, tbl, 1)) == [(1, "a")]


def test_merge_matches_coalesce_semantics(spark, tbl):
    commit_append(_df(spark, [(1, "a"), (2, "b")]), tbl)
    commit_merge(spark, _df(spark, [(2, "B"), (3, "C")]), tbl, ["k"])
    assert _snap(read_version(spark, tbl)) == [(1, "a"), (2, "B"), (3, "C")]
    # pre-merge snapshot untouched
    assert _snap(read_version(spark, tbl, 1)) == [(1, "a"), (2, "b")]


def test_snapshot_isolation_across_concurrent_commit(spark, tbl):
    commit_append(_df(spark, [(1, "a")]), tbl)
    snapshot = read_version(spark, tbl)  # resolved at version 1
    commit_overwrite(_df(spark, [(2, "b")]), tbl)  # concurrent writer
    # the earlier reader still evaluates against its immutable snapshot
    assert _snap(snapshot) == [(1, "a")]
    assert _snap(read_version(spark, tbl)) == [(2, "b")]


def test_compact_folds_dirs_result_identical(spark, tbl):
    for i in range(4):
        commit_append(_df(spark, [(i, str(i))]), tbl)
    before = _snap(read_version(spark, tbl))
    v = compact(spark, tbl)
    assert versions(tbl)[-1] == {"version": v, "op": "compact", "tag": None, "n_dirs": 1}
    assert _snap(read_version(spark, tbl)) == before


def test_vacuum_reference_counted(spark, tbl):
    commit_append(_df(spark, [(1, "a")]), tbl)
    commit_append(_df(spark, [(2, "b")]), tbl)  # v2 references v1's dir too
    commit_overwrite(_df(spark, [(3, "c")]), tbl)
    stats = vacuum(tbl, keep_from=2)
    # v1's manifest dropped, but its data dir survives: v2 references it
    assert stats == {"dirs_removed": 0, "manifests_removed": 1}
    assert _snap(read_version(spark, tbl, 2)) == [(1, "a"), (2, "b")]
    stats2 = vacuum(tbl, keep_from=3)
    assert stats2 == {"dirs_removed": 2, "manifests_removed": 1}
    assert _snap(read_version(spark, tbl)) == [(3, "c")]
    with pytest.raises(MilanAnalysisError, match="version 2 does not exist"):
        read_version(spark, tbl, 2)


def test_named_errors(spark, tbl):
    with pytest.raises(MilanAnalysisError, match="no commits"):
        read_version(spark, tbl)
    commit_append(_df(spark, [(1, "a")]), tbl)
    with pytest.raises(MilanAnalysisError, match="does not exist"):
        read_version(spark, tbl, 7)
    with pytest.raises(MilanAnalysisError, match="beyond the"):
        vacuum(tbl, keep_from=9)


def test_pointer_flips_last(spark, tbl, monkeypatch):
    """Crash protocol: if the commit dies before the pointer flip, the table
    still reads at the old version and the orphan is invisible."""
    import milan_spark.operators.versioned as V

    commit_append(_df(spark, [(1, "a")]), tbl)
    real_replace = os.replace

    def exploding_replace(src, dst):
        if dst.endswith(V._LATEST):
            raise RuntimeError("crash before pointer flip")
        return real_replace(src, dst)

    monkeypatch.setattr(V.os, "replace", exploding_replace)
    with pytest.raises(RuntimeError, match="crash"):
        commit_append(_df(spark, [(2, "b")]), tbl)
    monkeypatch.undo()
    assert current_version(tbl) == 1
    assert _snap(read_version(spark, tbl)) == [(1, "a")]
    # the next commit supersedes the orphan manifest for the same version
    commit_append(_df(spark, [(3, "c")]), tbl)
    assert _snap(read_version(spark, tbl)) == [(1, "a"), (3, "c")]


def test_versioned_sink_is_batch_id_idempotent(spark, tbl):
    from milan_spark.operators.versioned import versioned_sink

    write = versioned_sink(tbl)
    write(_df(spark, [(1, "a")]), 0)
    write(_df(spark, [(2, "b")]), 1)
    # replay of batch 0 (restart with a stale checkpoint): no new version
    write(_df(spark, [(1, "a")]), 0)
    assert current_version(tbl) == 2
    assert _snap(read_version(spark, tbl)) == [(1, "a"), (2, "b")]
    tags = [e["tag"] for e in versions(tbl)]
    assert tags == ["batch=0", "batch=1"]
