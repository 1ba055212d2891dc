"""hard_negatives: label exclusion + hardest-first ranking on a hand-built
embedding set (exact expectations, no tolerance)."""

from __future__ import annotations

from milan_spark.operators.similarity import hard_negatives


def test_hard_negatives_excludes_same_label_and_ranks(spark):
    # query 0 (label 1) at e1; same-label near-duplicate 1 must NOT appear;
    # different-label vectors rank by cosine to e1 descending
    rows = [
        (0, [1.0, 0.0, 0.0], 1),   # query
        (1, [0.99, 0.01, 0.0], 1), # same label — excluded however similar
        (2, [0.9, 0.1, 0.0], 2),   # hardest negative
        (3, [0.5, 0.5, 0.0], 2),
        (4, [0.0, 1.0, 0.0], 3),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = hard_negatives(df, "vec_id", "embedding", "label", query_ids=[0], k=3).collect()
    assert [r["neighbor_id"] for r in sorted(got, key=lambda r: r["rank"])] == [2, 3, 4]
    assert all(r["neg_label"] != 1 for r in got)
    by_rank = sorted(got, key=lambda r: r["rank"])
    assert by_rank[0]["cosine"] > by_rank[1]["cosine"] > by_rank[2]["cosine"]


def test_hard_negatives_k_truncates_and_self_excluded(spark):
    rows = [(i, [float(i % 3 == j) + 0.1 * i for j in range(3)], i % 2) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = hard_negatives(df, "vec_id", "embedding", "label", query_ids=[0, 1], k=2).collect()
    per_q = {}
    for r in got:
        per_q.setdefault(r["query_id"], []).append(r)
        assert r["neighbor_id"] != r["query_id"]
    assert set(per_q) == {0, 1}
    assert all(len(v) == 2 for v in per_q.values())
