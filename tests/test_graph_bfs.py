"""bfs_levels unit semantics: known topology, exact levels, unreachable
nodes absent, fixed-depth truncation."""

from __future__ import annotations

from milan_spark.operators.graph import bfs_levels


def _levels(spark, edges, source, iterations=6):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    out = bfs_levels(df, source, iterations=iterations)
    return {r["n"]: r["dist"] for r in out.collect()}


def test_path_cycle_and_disconnected(spark):
    # path 1-2-3-4, cycle 4-5-6-4, island 9-10
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 4), (9, 10)]
    got = _levels(spark, edges, source=1)
    assert got == {1: 0, 2: 1, 3: 2, 4: 3, 5: 4, 6: 4}
    # islands unreachable -> absent, not infinite


def test_depth_truncation_and_shortcut(spark):
    # two routes to 5: 1-2-3-4-5 and 1-5 — BFS must take the 1-hop route
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (1, 5)]
    got = _levels(spark, edges, source=1, iterations=2)
    assert got == {1: 0, 2: 1, 5: 1, 3: 2, 4: 2}
