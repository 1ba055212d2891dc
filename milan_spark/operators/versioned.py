"""Versioned table layout: snapshot isolation + time travel over plain
parquet — the lakehouse commit pattern (immutable data files, an
atomically-swapped pointer) without a table-format dependency. No reference
analog (Milan's sinks are fire-and-forget, ``FileDataSink``); this is the
sink discipline a long-lived 100 TB pipeline table needs: writers never
disturb readers, any historical snapshot stays reproducible, and cleanup is
an explicit, bounded operation.

Layout under ``path``:

  _versions/v<8-digit>.json   immutable manifest per commit: the list of
                              data directories visible at that version,
                              parent version, op kind, caller tag
  _latest                     one line, the current version number —
                              replaced via ``os.replace`` (atomic on POSIX),
                              the ONLY mutable object in the table
  data/<8-digit>/             immutable parquet directory written by
                              exactly one commit

Commit protocol (write things, THEN flip the pointer): (1) write the new
data directory, (2) write the new manifest, (3) ``os.replace`` `_latest`.
A reader resolves `_latest` once, then touches only immutable objects — a
concurrent commit can never tear its snapshot (snapshot isolation). A crash
before (3) leaves orphan files the next ``vacuum`` collects; the table
itself is never inconsistent.

Scale notes: an ``append`` commit is O(new data) — history accumulates as
union-read directories until ``compact`` (one rewrite commit) folds them;
``merge`` reuses the full-outer COALESCE plan of ``merge_upsert`` and
rewrites (the parquet-upsert cost model, documented there). Manifests list
directories, not files, so manifest size is O(commits since compaction),
never O(files).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

from milan_spark.errors import MilanAnalysisError

_MANIFEST_DIR = "_versions"
_LATEST = "_latest"
_DATA = "data"


def _vname(v: int) -> str:
    return f"{v:08d}"


def _manifest_path(path: str, v: int) -> str:
    return os.path.join(path, _MANIFEST_DIR, f"v{_vname(v)}.json")


def _read_manifest(path: str, v: int) -> dict:
    try:
        with open(_manifest_path(path, v)) as f:
            return json.load(f)
    except FileNotFoundError:
        raise MilanAnalysisError(
            f"versioned table {path}: version {v} does not exist"
        ) from None


def current_version(path: str) -> int:
    """The committed version `_latest` points at (0 = empty table)."""
    try:
        with open(os.path.join(path, _LATEST)) as f:
            return int(f.read().strip())
    except FileNotFoundError:
        return 0


def versions(path: str) -> list[dict]:
    """All committed manifests in version order (op, tag, dir count)."""
    mdir = os.path.join(path, _MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return []
    out = []
    for name in sorted(os.listdir(mdir)):
        if name.startswith("v") and name.endswith(".json"):
            with open(os.path.join(mdir, name)) as f:
                m = json.load(f)
            out.append(
                {"version": m["version"], "op": m["op"], "tag": m.get("tag"),
                 "n_dirs": len(m["dirs"])}
            )
    return out


def _commit(path: str, df: DataFrame, *, dirs_from_parent, op: str, tag) -> int:
    os.makedirs(os.path.join(path, _MANIFEST_DIR), exist_ok=True)
    os.makedirs(os.path.join(path, _DATA), exist_ok=True)
    parent = current_version(path)
    v = parent + 1
    data_rel = f"{_DATA}/{_vname(v)}"
    # a directory for v can only be the orphan of a commit that died before
    # its pointer flip — no committed manifest can reference a version above
    # `_latest`, so clearing it is safe and makes commits crash-recoverable
    orphan = os.path.join(path, _DATA, _vname(v))
    if os.path.isdir(orphan):
        shutil.rmtree(orphan)
    # (1) immutable data directory
    df.write.mode("errorifexists").parquet(os.path.join(path, data_rel))
    dirs = list(dirs_from_parent(parent)) + [data_rel]
    # (2) immutable manifest
    manifest = {"version": v, "parent": parent, "op": op, "tag": tag, "dirs": dirs}
    mpath = _manifest_path(path, v)
    with open(mpath + ".tmp", "w") as f:
        json.dump(manifest, f)
    os.replace(mpath + ".tmp", mpath)
    # (3) atomic pointer flip — the commit point
    lpath = os.path.join(path, _LATEST)
    with open(lpath + ".tmp", "w") as f:
        f.write(str(v))
    os.replace(lpath + ".tmp", lpath)
    return v


def commit_append(df: DataFrame, path: str, *, tag: str | None = None) -> int:
    """Append commit: the new version sees the parent's directories plus one
    new one. O(new data) write; history folds at the next ``compact``."""
    return _commit(
        path, df,
        dirs_from_parent=lambda p: _read_manifest(path, p)["dirs"] if p else [],
        op="append", tag=tag,
    )


def commit_overwrite(df: DataFrame, path: str, *, tag: str | None = None) -> int:
    """Overwrite commit: the new version sees ONLY the new directory — the
    old versions keep their directories and stay readable (time travel)."""
    return _commit(path, df, dirs_from_parent=lambda p: [], op="overwrite", tag=tag)


def commit_merge(
    spark: SparkSession,
    updates: DataFrame,
    path: str,
    key_cols: list[str],
    *,
    tag: str | None = None,
) -> int:
    """MERGE commit: full-outer COALESCE of updates over the current
    snapshot (the ``merge_upsert`` plan), rewritten as one directory."""
    base = read_version(spark, path)
    cond = [base[k].eqNullSafe(updates[k]) for k in key_cols]
    from functools import reduce
    from operator import and_

    joined = base.alias("b").join(
        updates.alias("u"), reduce(and_, cond), "full_outer"
    )
    cols = [
        F.coalesce(F.col(f"u.{c}"), F.col(f"b.{c}")).alias(c)
        for c in base.columns
    ]
    return _commit(
        path, joined.select(*cols), dirs_from_parent=lambda p: [], op="merge", tag=tag
    )


def compact(spark: SparkSession, path: str, *, tag: str | None = None) -> int:
    """Fold the current snapshot's directory list into ONE directory (an
    overwrite commit of the current read) — the maintenance pass that keeps
    append chains bounded; old versions stay readable until ``vacuum``."""
    return _commit(
        path, read_version(spark, path), dirs_from_parent=lambda p: [],
        op="compact", tag=tag,
    )


def read_version(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Snapshot read: resolve the version ONCE (default: `_latest`), then a
    plain union-read of its immutable directories — concurrent commits
    cannot tear it. ``version=N`` is time travel."""
    v = current_version(path) if version is None else int(version)
    if v == 0:
        raise MilanAnalysisError(f"versioned table {path}: no commits yet")
    m = _read_manifest(path, v)
    return spark.read.parquet(*[os.path.join(path, d) for d in m["dirs"]])


def vacuum(path: str, *, keep_from: int) -> dict:
    """Delete manifests below ``keep_from`` and every data directory no kept
    manifest references. Explicit and bounded — nothing expires implicitly.
    Returns {"dirs_removed", "manifests_removed"}."""
    cur = current_version(path)
    if keep_from > cur:
        raise MilanAnalysisError(
            f"versioned table {path}: keep_from={keep_from} is beyond the "
            f"current version {cur}"
        )
    keep_dirs: set[str] = set()
    removed_m = 0
    for entry in versions(path):
        v = entry["version"]
        if v >= keep_from:
            keep_dirs.update(_read_manifest(path, v)["dirs"])
        else:
            os.remove(_manifest_path(path, v))
            removed_m += 1
    removed_d = 0
    droot = os.path.join(path, _DATA)
    for name in sorted(os.listdir(droot)):
        rel = f"{_DATA}/{name}"
        if rel not in keep_dirs:
            shutil.rmtree(os.path.join(droot, name))
            removed_d += 1
    return {"dirs_removed": removed_d, "manifests_removed": removed_m}


def versioned_sink(path: str):
    """``foreachBatch`` writer with EXACTLY-ONCE commits into a versioned
    table: every microbatch appends under the tag ``batch=<id>``, and a
    replayed batch id — Spark re-runs the last microbatch when a restart
    finds its checkpoint behind the sink — is skipped because the manifest
    already records it. The manifest chain IS the transaction log, the
    standard batchId-idempotent transactional-sink recipe; combined with
    the pointer-flips-last commit protocol, readers see each microbatch
    exactly once or not yet."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        tag = f"batch={batch_id}"
        if any(e["tag"] == tag for e in versions(path)):
            return
        commit_append(batch_df, path, tag=tag)

    return write
