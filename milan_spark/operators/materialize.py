"""Incrementally-maintained materialized aggregate views over a versioned
table (no reference analog — Milan recomputes; this is the maintenance
discipline that makes a 100 TB fact table's rollups affordable: refresh
cost is O(new data) + O(view), never O(history)).

The source of increments is the versioned table's manifest chain
(``operators.versioned``): an ``append`` commit contributes exactly one new
data directory, so the delta between two versions is a plain union-read of
the directories added in between — no diff join, no change-tracking
columns, no full-table scan. The view itself is a versioned table whose
commit ``tag`` records the source version it reflects (``src=<v>``), which
makes refresh idempotent and crash-safe for free: a re-run sees the tag
and re-derives from the recorded watermark; a torn refresh never commits.

Aggregates must be mergeable under APPEND-ONLY sources: sum/count/min/max
(mean = sum/count at read time). A non-append commit (merge/overwrite/
compact) in the gap makes per-directory deltas unsound — the refresh then
raises a named error telling the caller to ``full_refresh`` (the same
contract Delta's streaming source exposes: appends flow incrementally,
rewrites force reprocessing).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

from milan_spark.errors import MilanAnalysisError
from milan_spark.operators.versioned import (
    _read_manifest,
    commit_overwrite,
    current_version,
    read_version,
    versions,
)

_MERGEABLE = ("sum", "count", "min", "max")


def appended_dirs_between(path: str, v0: int, v1: int) -> list[str]:
    """The data directories commits v0+1..v1 added — THE incremental read
    set. Raises if any commit in the window is not an append (its rows
    rewrote history; per-directory deltas would double- or under-count)."""
    out = []
    for v in range(v0 + 1, v1 + 1):
        m = _read_manifest(path, v)
        if m["op"] != "append":
            raise MilanAnalysisError(
                f"incremental refresh: version {v} is op={m['op']!r}; "
                f"appends-only maintenance cannot skip a rewrite — run "
                f"full_refresh"
            )
        out.append(m["dirs"][-1])
    return out


def read_appends_between(
    spark: SparkSession, path: str, v0: int, v1: int
) -> DataFrame:
    """Union-read of exactly the rows appended after v0 up to v1."""
    import os

    dirs = appended_dirs_between(path, v0, v1)
    if not dirs:
        raise MilanAnalysisError(
            f"incremental refresh: no appends between {v0} and {v1}"
        )
    return spark.read.parquet(*[os.path.join(path, d) for d in dirs])


def _agg_cols(measures: dict[str, tuple[str, str]]):
    cols = []
    for name, (kind, src) in measures.items():
        if kind not in _MERGEABLE:
            raise MilanAnalysisError(
                f"materialized view: aggregate {kind!r} for {name!r} is not "
                f"mergeable under appends; supported: {_MERGEABLE}"
            )
        fn = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}[kind]
        arg = F.lit(1) if (kind == "count" and src == "*") else src
        cols.append(fn(arg).alias(name))
    return cols


def _merge_states(
    old: DataFrame, delta: DataFrame, keys: Sequence[str],
    measures: dict[str, tuple[str, str]],
) -> DataFrame:
    # name-based (USING) join: Spark emits ONE coalesced column per key
    j = old.alias("o").join(delta.alias("d"), list(keys), "full_outer")
    out_cols = [F.col(k) for k in keys]
    for name, (kind, _src) in measures.items():
        o, d = F.col(f"o.{name}"), F.col(f"d.{name}")
        if kind in ("sum", "count"):
            merged = F.coalesce(o, F.lit(0)) + F.coalesce(d, F.lit(0))
        elif kind == "min":
            merged = F.least(o, d)  # least/greatest skip NULLs
        else:
            merged = F.greatest(o, d)
        out_cols.append(merged.alias(name))
    return j.select(*out_cols)


def _view_source_version(view_path: str) -> int:
    """The source version the view's latest commit reflects (0 = never
    refreshed). Recorded in the commit tag — the refresh watermark."""
    vs = versions(view_path)
    if not vs:
        return 0
    tag = vs[-1]["tag"] or ""
    if not tag.startswith("src="):
        raise MilanAnalysisError(
            f"materialized view {view_path}: latest commit tag {tag!r} "
            f"does not carry a src= watermark; not a maintained view?"
        )
    return int(tag[4:])


def refresh_agg_view(
    spark: SparkSession,
    source_path: str,
    view_path: str,
    keys: Sequence[str],
    measures: dict[str, tuple[str, str]],
    *,
    full: bool = False,
) -> dict:
    """Bring the materialized view up to the source's current version.

    ``measures`` maps output column -> (agg_kind, source column), agg_kind
    in sum/count/min/max. Incremental path: aggregate ONLY the directories
    appended since the recorded watermark (one small shuffle), then merge
    the partial states into the stored view with a full-outer coalesce —
    O(delta) + O(view). ``full=True`` (or a first refresh) recomputes from
    the source snapshot. Refresh is idempotent: the view commit's
    ``src=<v>`` tag is the watermark, and an up-to-date view is a no-op.
    Returns {"mode", "source_version", "view_version"}.
    """
    src_v = current_version(source_path)
    if src_v == 0:
        raise MilanAnalysisError(
            f"materialized view: source {source_path} has no commits"
        )
    have = 0 if full else _view_source_version(view_path)
    if have == src_v:
        return {"mode": "noop", "source_version": src_v,
                "view_version": current_version(view_path)}
    if have == 0:
        state = (
            read_version(spark, source_path)
            .groupBy(*keys)
            .agg(*_agg_cols(measures))
        )
        mode = "full"
    else:
        delta = (
            read_appends_between(spark, source_path, have, src_v)
            .groupBy(*keys)
            .agg(*_agg_cols(measures))
        )
        state = _merge_states(
            read_version(spark, view_path), delta, keys, measures
        )
        mode = "incremental"
    vv = commit_overwrite(state, view_path, tag=f"src={src_v}")
    return {"mode": mode, "source_version": src_v, "view_version": vv}
