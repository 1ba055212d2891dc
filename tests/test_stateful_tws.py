"""transformWithStateInPandas backend: availability, parity with the legacy
applyInPandasWithState path, and the no-key (synthetic group) corner.

The port keeps ONE per-key ``process`` function and swaps only the state API
underneath (streaming/stateful.py::_drive), so parity here plus the oracle
suite running green on the default backend covers the whole operator family.
"""

from __future__ import annotations

import pandas as pd
import pytest

from milan_spark.session import ensure_protobuf
from milan_spark.streaming import run_to_memory, stateful

LEFT_SCHEMA = "id long, k long, v double, __seq long"
RIGHT_SCHEMA = "k long, name string, w double, __seq long"
LEFT_ROWS = [
    [(1, 10, 1.5, 0), (2, 20, 2.5, 2)],
    [(3, 10, 3.5, 10), (4, 30, 4.5, 12)],
]
RIGHT_ROWS = [
    [(10, "a0", 0.1, 1), (20, "b0", 0.2, 3)],
    [(10, "a1", 0.3, 11)],
]


def test_tws_backend_availability_and_policy(monkeypatch):
    """In this container the vendored-protobuf shim must make the modern API
    available — if this fails the whole suite silently tests only the legacy
    path. Policy: ``auto`` resolves to the legacy API unless a TWS-only
    feature (state TTL) is requested (the per-start driver cost of TWS is
    pure overhead for replay-style queries); ``tws`` forces the modern API."""
    assert ensure_protobuf()
    monkeypatch.delenv(stateful.STATE_API_ENV, raising=False)
    assert not stateful.use_tws()          # auto, no TTL -> legacy
    assert stateful.use_tws(need_ttl=True)  # auto + TTL -> modern API
    monkeypatch.setenv(stateful.STATE_API_ENV, "tws")
    assert stateful.use_tws()              # forced -> modern API


@pytest.fixture()
def sides(spark, tmp_path):
    for sub, chunks, cols in (
        ("left", LEFT_ROWS, ["id", "k", "v", "__seq"]),
        ("right", RIGHT_ROWS, ["k", "name", "w", "__seq"]),
    ):
        (tmp_path / sub).mkdir()
        for i, rows in enumerate(chunks):
            pd.DataFrame(rows, columns=cols).to_parquet(tmp_path / sub / f"{i:02d}.parquet")

    def stream(sub, schema):
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(tmp_path / sub))
        )

    return stream("left", LEFT_SCHEMA), stream("right", RIGHT_SCHEMA)


def _rows(df):
    cols = ["id", "k", "v", "name", "w"]
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_backends_agree_on_left_enrichment(spark, sides, monkeypatch):
    ls, rs = sides
    monkeypatch.setenv(stateful.STATE_API_ENV, "tws")
    got_tws = _rows(run_to_memory(stateful.left_enrichment_join(ls, rs, on="k"), "tws_le"))
    monkeypatch.setenv(stateful.STATE_API_ENV, "applyinpandas")
    got_old = _rows(run_to_memory(stateful.left_enrichment_join(ls, rs, on="k"), "old_le"))
    assert got_tws == got_old
    assert len(got_tws) == sum(len(c) for c in LEFT_ROWS)


def test_tws_scan_without_keys(spark, tmp_path, monkeypatch):
    """The synthetic-group (global) scan must run on the new API too."""
    monkeypatch.setenv(stateful.STATE_API_ENV, "tws")
    (tmp_path / "s").mkdir()
    for i, rows in enumerate([[(0, 1)], [(1, 2)], [(2, 3)]]):
        pd.DataFrame(rows, columns=["__seq", "x"]).to_parquet(tmp_path / "s" / f"{i}.parquet")
    sdf = (
        spark.readStream.schema("__seq long, x long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "s"))
    )

    def fold(st, rec):
        st = st + rec.x
        return st, {"running": st}

    out = stateful.scan(sdf, fold, initial_state=0, output_schema="running long")
    got = sorted(r.running for r in run_to_memory(out, "tws_scan").collect())
    assert got == [1, 3, 6]


@pytest.mark.slow
def test_state_ttl_expires_idle_keys(spark, tmp_path, monkeypatch):
    """Processing-time state TTL (tws backend): a right record written in one
    run reads as ABSENT after the TTL elapses across a checkpoint restart, so
    a later left arrival enriches to null — while the same scenario without a
    TTL retains the right. The retention contract a long-running enrichment
    stream needs (idle keys cannot accrete state forever)."""
    import time

    from milan_spark.streaming import file_sink

    monkeypatch.setenv(stateful.STATE_API_ENV, "tws")

    def scenario(tag, ttl):
        root = tmp_path / tag
        (root / "left").mkdir(parents=True)
        (root / "right").mkdir(parents=True)
        out, ck = str(root / "out"), str(root / "ck")

        def build():
            ls = (
                spark.readStream.schema(LEFT_SCHEMA)
                .option("maxFilesPerTrigger", 1)
                .parquet(str(root / "left"))
            )
            rs = (
                spark.readStream.schema(RIGHT_SCHEMA)
                .option("maxFilesPerTrigger", 1)
                .parquet(str(root / "right"))
            )
            return stateful.left_enrichment_join(ls, rs, on="k", state_ttl_ms=ttl)

        # run 1: only the right arrives, its value lands in state
        pd.DataFrame([(10, "a0", 0.1, 1)], columns=["k", "name", "w", "__seq"]).to_parquet(
            root / "right" / "r0.parquet"
        )
        q = file_sink(build(), out, checkpoint=ck)
        q.awaitTermination(120)
        time.sleep(1.5)  # > TTL for the ttl scenario
        # run 2 (same checkpoint): a left arrives and reads the state
        pd.DataFrame([(1, 10, 1.5, 2)], columns=["id", "k", "v", "__seq"]).to_parquet(
            root / "left" / "l0.parquet"
        )
        q = file_sink(build(), out, checkpoint=ck)
        q.awaitTermination(120)
        rows = spark.read.parquet(out).collect()
        assert len(rows) == 1
        return rows[0]

    with_ttl = scenario("ttl", 300)
    assert with_ttl.name is None, "state older than the TTL must read as absent"
    without = scenario("nottl", None)
    assert without.name == "a0", "without a TTL the right must be retained"
