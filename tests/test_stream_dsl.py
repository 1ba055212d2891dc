"""DSL behavioral tests — the engine analog of the reference's end-to-end
execute-and-assert tier (SURVEY.md §5 tier 3: small ListDataSource inputs,
set-based assertions on collected outputs — e.g. TestFlinkGenJoin.scala:31-110,
samples/GroupBySample.scala:34-64)."""

from __future__ import annotations

from pyspark.sql import functions as F

from milan_spark import Stream


def rows_set(stream, cols):
    return {tuple(r[c] for c in cols) for r in stream.to_list()}


def test_map_filter(spark):
    s = Stream.from_list(spark, [(1,), (2,), (3,), (4,)], "i int")
    out = s.where("i % 2 = 0").map("i", "i + 10 AS j")
    assert rows_set(out, ["i", "j"]) == {(2, 12), (4, 14)}


def test_group_by_select_sum(spark):
    # GroupBySample.scala:34,64 fixture: [(1,1),(1,2),(2,5),(3,6),(2,3),(3,1)]
    rows = [(1, 1), (1, 2), (2, 5), (3, 6), (2, 3), (3, 1)]
    s = Stream.from_list(spark, rows, "key int, value int")
    out = s.group_by("key").select(total="sum(value)", n="count(*)")
    assert rows_set(out, ["key", "total", "n"]) == {(1, 3, 2), (2, 8, 2), (3, 7, 2)}


def test_left_enrichment_join(spark):
    # Milan LeftJoin: left pairs with latest right at-or-before it; null if none.
    left = Stream.from_list(spark, [("k1", 10, 1), ("k1", 11, 5), ("k2", 20, 6)], "key string, lv int, __seq long")
    right = Stream.from_list(spark, [("k1", 100, 2), ("k1", 101, 4)], "key string, rv int, __seq long")
    out = left.left_join(right, on="key")
    got = rows_set(out, ["key", "lv", "rv"])
    assert got == {("k1", 10, None), ("k1", 11, 101), ("k2", 20, None)}


def test_full_enrichment_join(spark):
    left = Stream.from_list(spark, [("k1", 10, 1), ("k1", 11, 5)], "key string, lv int, __seq long")
    right = Stream.from_list(spark, [("k1", 100, 2), ("k1", 101, 6)], "key string, rv int, __seq long")
    out = left.full_join(right, on="key")
    got = rows_set(out, ["lv", "rv"])
    # seq=1: (10, null); seq=2: (10, 100); seq=5: (11, 100); seq=6: (11, 101)
    assert got == {(10, None), (10, 100), (11, 100), (11, 101)}


def test_left_inner_join_buffers(spark):
    # LeftInnerJoin: lefts buffer until a right arrives; each left emits once.
    left = Stream.from_list(
        spark, [("k1", 1, 1), ("k1", 2, 2), ("k2", 3, 3)], "key string, lv int, __seq long"
    )
    right = Stream.from_list(spark, [("k1", 100, 5), ("k1", 200, 6)], "key string, rv int, __seq long")
    out = left.left_inner_join(right, on="key")
    got = rows_set(out, ["lv", "rv"])
    # both k1 lefts arrive before any right → emit with FIRST later right (100);
    # k2 never matches → dropped
    assert got == {(1, 100), (2, 100)}

    # a left arriving after a right pairs with the latest earlier right
    left2 = Stream.from_list(spark, [("k1", 7, 10)], "key string, lv int, __seq long")
    out2 = left2.left_inner_join(right, on="key")
    assert rows_set(out2, ["lv", "rv"]) == {(7, 200)}


def test_stream_max_by_emit_on_improvement(spark):
    # doc/Milan Operations.md:106-111 — only strictly-larger values emit
    s = Stream.from_list(spark, [(3, 0), (1, 1), (5, 2), (5, 3), (7, 4)], "v int, __seq long")
    out = s.max_by("v")
    assert rows_set(out, ["v"]) == {(3,), (5,), (7,)}
    out_min = s.min_by("v")
    assert rows_set(out_min, ["v"]) == {(3,), (1,)}


def test_sum_by_running(spark):
    s = Stream.from_list(spark, [(1, 0), (2, 1), (3, 2)], "v int, __seq long")
    out = s.sum_by("v", alias="rs")
    assert rows_set(out, ["v", "rs"]) == {(1, 1), (2, 3), (3, 6)}


def test_scan_general_fold(spark):
    # Milan Scan: (state, record) -> (state, Option[out]); None suppressed
    s = Stream.from_list(spark, [(1, 0), (2, 1), (3, 2), (4, 3)], "v int, __seq long")

    def fold(state, rec):
        state = state + rec.v
        return state, {"v": rec.v, "acc": state} if state % 2 == 0 else None

    out = s.scan(fold, initial_state=0, output_schema="v int, acc int")
    assert rows_set(out, ["v", "acc"]) == {(3, 6), (4, 10)}


def test_last_keyed_and_global(spark):
    s = Stream.from_list(spark, [("a", 1, 0), ("a", 2, 1), ("b", 9, 2)], "k string, v int, __seq long")
    assert rows_set(s.last(keys=["k"]), ["k", "v"]) == {("a", 2), ("b", 9)}
    assert rows_set(s.last(), ["k", "v"]) == {("b", 9)}


def test_union_and_distinct(spark):
    a = Stream.from_list(spark, [(1,), (2,)], "i int")
    b = Stream.from_list(spark, [(2,), (3,)], "i int")
    u = a.union(b)
    assert sorted(r["i"] for r in u.to_list()) == [1, 2, 2, 3]
    assert rows_set(u.distinct(), ["i"]) == {(1,), (2,), (3,)}


def test_record_window(spark):
    rows = [(1, 1, 0), (1, 2, 1), (1, 3, 2), (1, 4, 3), (2, 10, 4)]
    s = Stream.from_list(spark, rows, "key int, v int, __seq long")
    out = s.group_by("key").record_window(3, {"win_sum": "sum(v)"})
    got = rows_set(out, ["key", "v", "win_sum"])
    assert got == {(1, 1, 1), (1, 2, 3), (1, 3, 6), (1, 4, 9), (2, 10, 10)}


def test_tumbling_window_select(spark):
    # TimeWindowSample.scala:23-32 shape: records at 1s spacing, windowed sum
    rows = [(f"2024-01-01 00:00:{s:02d}", float(v)) for s, v in [(1, 1), (2, 2), (11, 3), (12, 4), (21, 5)]]
    s = Stream.from_list(spark, rows, "ts_s string, value double").map(
        "CAST(ts_s AS TIMESTAMP) AS ts", "value"
    )
    out = s.tumbling_window("ts", "10 seconds").select(total="sum(value)")
    got = {(str(r["window_start"]), r["total"]) for r in out.to_list()}
    assert got == {
        ("2024-01-01 00:00:00", 3.0),
        ("2024-01-01 00:00:10", 7.0),
        ("2024-01-01 00:00:20", 5.0),
    }


def test_grouped_map_group(spark):
    import pandas as pd

    rows = [(1, 1), (1, 2), (2, 5)]
    s = Stream.from_list(spark, rows, "key int, v int")

    def rank_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("v")
        pdf["rank"] = range(1, len(pdf) + 1)
        return pdf

    out = s.group_by("key").map_group(rank_group, "key int, v int, rank int")
    assert rows_set(out, ["key", "v", "rank"]) == {(1, 1, 1), (1, 2, 2), (2, 5, 1)}


def test_iterate_cycle(spark):
    # Milan Cycle (beginCycle/closeCycle) batch analog: double values < 100
    s = Stream.from_list(spark, [(1,), (30,)], "i int")
    out = s.iterate(
        lambda st: st.map("CASE WHEN i < 100 THEN i * 2 ELSE i END AS i"),
        max_iterations=10,
    )
    assert rows_set(out, ["i"]) == {(128,), (120,)}


def test_apply_function_udf(spark):
    import pandas as pd

    s = Stream.from_list(spark, [(1,), (2,)], "i int")
    out = s.apply_function(lambda col: col * 3, "int", "i", alias="tripled")
    assert rows_set(out, ["i", "tripled"]) == {(1, 3), (2, 6)}


def test_order_limit_topk_dsl(spark):
    from milan_spark.stream import Stream

    rows = [(i, i % 3, float(100 - i)) for i in range(30)]
    s = Stream.from_list(spark, rows, "id long, k long, v double")
    top = s.order_by("v").limit(5).to_list()
    assert [r["id"] for r in top] == [29, 28, 27, 26, 25]
    per = s.top_k_per_group(["k"], "v", 2).to_df()
    assert per.count() == 6
    best = {(r["k"], r["id"]) for r in per.collect()}
    assert (0, 0) in best and (1, 1) in best and (2, 2) in best


def test_ewma_fold_floor_semantics_on_negative_deltas(spark):
    """EWMA integer update must FLOOR (arithmetic-shift semantics), not
    truncate toward zero, on decreasing series — the batch fold and the
    DuckDB oracle's floor((x-s)/8.0) agree only under floor division."""
    from milan_spark.operators.scans import scan

    rows = [(i + 1, 1, v) for i, v in enumerate([100.0, 0.0, 0.0, 50.0])]
    df = spark.createDataFrame(rows, "event_id long, user_id long, value double")

    def fold(state, rec):
        x = int(rec.value * 100)
        state = x if state is None else state + (x - state) // 8
        return state, {"event_id": rec.event_id, "s": state}

    got = {
        r.event_id: r.s
        for r in scan(
            df, fold, initial_state=None,
            output_schema="event_id long, s long", keys=["user_id"], seq="event_id",
        ).collect()
    }
    # s1=10000; s2 = 10000 + (-10000)//8 = 10000 - 1250 = 8750
    # s3 = 8750 + (-8750)//8 = 8750 + (-1094) = 7656   (floor, not -1093)
    # s4 = 7656 + (5000-7656)//8 = 7656 + (-332) = 7324
    assert got == {1: 10000, 2: 8750, 3: 7656, 4: 7324}
