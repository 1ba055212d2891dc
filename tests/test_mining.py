"""Unit tests for the corpus-mining tier: BM25 retrieval, HyperLogLog, and
triangle counting (operators/retrieval.py, sketch.py HLL, graph.py)."""

from __future__ import annotations

import math

from pyspark.sql import Row, functions as F

from milan_spark.operators.graph import triangle_count
from milan_spark.operators.retrieval import bm25_topk
from milan_spark.operators.sketch import hll_distinct, hll_estimate, hll_registers


def test_bm25_ranks_matching_doc_first(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="spark join join join filter"),
            Row(doc_id=2, text="join filter"),
            Row(doc_id=3, text="filter window sort merge agg scan hash"),
            Row(doc_id=4, text="nothing relevant here at all"),
        ]
    )
    out = bm25_topk(docs, ["join", "filter"], top_n=3).collect()
    assert [r["rank"] for r in out] == [1, 2, 3]
    ids = [r["doc_id"] for r in out]
    # doc 4 has zero query terms — never retrieved
    assert 4 not in ids
    # doc 2 is shortest with both terms; doc 1 has higher tf but longer —
    # either may win, but both must beat any single-term doc
    assert set(ids[:2]) == {1, 2}
    scores = [r["bm25"] for r in out]
    assert scores == sorted(scores, reverse=True)


def test_hll_estimate_close_and_small_range_exactish(spark):
    n = 5000
    df = spark.range(n).select(F.concat(F.lit("user"), F.col("id")).alias("v"))
    est = hll_distinct(df, "v").collect()[0]["distinct_est"]
    # m=64 registers: relative error ~1.04/sqrt(64) = 13%; allow 3 sigma
    assert abs(est - n) / n < 0.4
    small = spark.range(10).select(F.concat(F.lit("u"), F.col("id")).alias("v"))
    est_small = hll_distinct(small, "v").collect()[0]["distinct_est"]
    # linear-counting regime: much tighter
    assert abs(est_small - 10) <= 3


def test_hll_registers_merge_equals_union(spark):
    a = spark.range(0, 800).select(F.col("id").cast("string").alias("v"))
    b = spark.range(500, 1300).select(F.col("id").cast("string").alias("v"))
    ra = hll_registers(a, "v")
    rb = hll_registers(b, "v")
    merged = (
        ra.unionAll(rb).groupBy("reg").agg(F.max("m").alias("m"))
    )
    direct = hll_registers(a.unionAll(b), "v")
    est_merged = hll_estimate(merged).collect()[0]
    est_direct = hll_estimate(direct).collect()[0]
    assert est_merged["sum_scaled"] == est_direct["sum_scaled"]
    assert est_merged["distinct_est"] == est_direct["distinct_est"]


def test_hll_is_duplicate_insensitive(spark):
    once = spark.range(300).select(F.col("id").cast("string").alias("v"))
    thrice = once.unionAll(once).unionAll(once)
    e1 = hll_distinct(once, "v").collect()[0]["distinct_est"]
    e3 = hll_distinct(thrice, "v").collect()[0]["distinct_est"]
    assert e1 == e3


def test_triangle_count_known_graph(spark):
    # K4 plus a pendant: C(4,3)=4 triangles, 7 edges, 5 nodes
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)]
    # feed duplicates, reversals, and a self loop — all must be ignored
    noisy = edges + [(2, 1), (3, 3), (1, 2)]
    df = spark.createDataFrame(noisy, ["src", "dst"])
    row = triangle_count(df).collect()[0]
    assert row["n_nodes"] == 5
    assert row["n_edges"] == 7
    assert row["n_triangles"] == 4


def test_triangle_count_triangle_free(spark):
    # star graph: no triangles no matter the hub degree
    df = spark.createDataFrame([(0, i) for i in range(1, 9)], ["src", "dst"])
    row = triangle_count(df).collect()[0]
    assert row["n_triangles"] == 0
    assert row["n_wedges"] == 0  # orientation points every edge at the hub


def test_dsir_prefers_target_like_docs(spark):
    from milan_spark.operators.mixing import dsir_scores, dsir_select

    target = spark.createDataFrame(
        [(i, "alpha beta gamma delta") for i in range(20)], ["doc_id", "text"]
    )
    raw = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "omega psi chi"), (3, "alpha omega")],
        ["doc_id", "text"],
    )
    scored = dsir_scores(raw, target)
    sel = dsir_select(scored, top_n=2).collect()
    # the doc made of target-domain tokens must outrank the off-domain one
    assert sel[0]["doc_id"] == 1
    assert {r["doc_id"] for r in sel} == {1, 3}
    by_id = {r["doc_id"]: r["score_micronat"] for r in scored.collect()}
    assert by_id[1] > by_id[3] > by_id[2]


def test_quality_classifier_exact_decision(spark):
    from milan_spark.operators.mixing import quality_classifier, QC_N0

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog and runs far"),
            (2, "a a a a a a a a"),
            (3, ""),
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in quality_classifier(docs).collect()}
    # stopword-rich diverse text keeps; degenerate repetition drops
    assert rows[1]["keep"] is True
    assert rows[2]["keep"] is False
    # empty doc: NULL score, labeled drop
    assert rows[3]["z_num"] is None and rows[3]["keep"] is False
    # reported score agrees with the integer decision value
    r1 = rows[1]
    assert abs(r1["z_millis"] - r1["z_num"] / (QC_N0 * r1["n_tokens"])) < 1e-3


def test_quality_classifier_long_doc_no_int32_wrap(spark):
    """The e·n² term must be evaluated in int64: at n ≥ ~12,404 tokens,
    14·n·n wraps a 32-bit int under non-ANSI Spark and flips the label."""
    from milan_spark.operators.mixing import (
        quality_classifier, QC_A, QC_B, QC_C, QC_E, QC_F, QC_N0,
    )

    n = 13000
    text = " ".join("tok%d" % (i % 50) for i in range(n))
    docs = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    row = quality_classifier(docs).collect()[0]
    L = sum(len("tok%d" % (i % 50)) for i in range(n))
    s, u = 0, 50
    expected = QC_N0 * (QC_A * L + QC_B * s + QC_C * u) + QC_E * n * n + QC_F * QC_N0 * n
    assert row["z_num"] == expected  # Python ints never wrap — the referee
    assert row["keep"] is (expected > 0)


def test_kmeans_separates_obvious_clusters(spark):
    from milan_spark.operators.clustering import kmeans_fixed

    # two tight blobs in 4-d; k=2 must split them exactly
    lo = [(i, [0.01 * (i % 3), 0.0, 0.0, 0.0]) for i in range(10)]
    hi = [(i + 10, [0.9, 0.9, 0.9, 0.9 + 0.01 * (i % 3)]) for i in range(10)]
    emb = spark.createDataFrame(lo + hi, ["vec_id", "embedding"])
    assign, cents = kmeans_fixed(emb, dim=4, k=2, iters=3)
    rows = assign.collect()
    lo_cids = {r["cid"] for r in rows if r["vec_id"] < 10}
    hi_cids = {r["cid"] for r in rows if r["vec_id"] >= 10}
    assert len(lo_cids) == 1 and len(hi_cids) == 1 and lo_cids != hi_cids
    assert cents.count() == 2


def test_kmeans_profile_partition_invariant(spark):
    from milan_spark.operators.clustering import kmeans_cluster_profile

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    p1 = kmeans_cluster_profile(emb.repartition(1), dim=64, k=4, iters=2).collect()
    p7 = kmeans_cluster_profile(emb.repartition(7), dim=64, k=4, iters=2).collect()
    assert [tuple(r) for r in p1] == [tuple(r) for r in p7]


def test_mmr_prefers_diverse_over_redundant(spark):
    from milan_spark.operators.clustering import mmr_select

    # id 0 (hash-min) becomes the query seed [.5,.5]; docs 1/2/4 form a
    # near-duplicate cluster on axis 1, doc 3 is equally relevant but lives
    # on axis 2
    emb = spark.createDataFrame(
        [
            (0, [0.5, 0.5, 0.0, 0.0]),
            (1, [0.9, 0.12, 0.0, 0.0]),
            (2, [0.89, 0.11, 0.0, 0.0]),
            (3, [0.1, 0.9, 0.0, 0.0]),
            (4, [0.88, 0.1, 0.0, 0.0]),
        ],
        ["vec_id", "embedding"],
    )
    out = mmr_select(emb, dim=4, k=3, lam=(5, 10)).collect()
    assert [r["rank"] for r in out] == [1, 2, 3]
    ids = [r["vec_id"] for r in out]
    # round 1 takes the most relevant (doc 1); with lambda=0.5 round 2 must
    # jump to the diverse doc 3, not the near-duplicates 2/4
    assert ids[:2] == [1, 3]
    # scores are the cleared-denominator integers, strictly ranked rounds
    assert out[0]["score"] == 5 * out[0]["rel"]


def test_mmr_k_exceeding_candidates_returns_shorter_set(spark):
    """k larger than the candidate pool stops at the pool size instead of
    raising on a None argmax (ADVICE r6)."""
    from milan_spark.operators.clustering import mmr_select

    emb = spark.createDataFrame(
        [(0, [0.5, 0.5]), (1, [0.9, 0.1]), (2, [0.1, 0.9])],
        ["vec_id", "embedding"],
    )
    out = mmr_select(emb, dim=2, k=10).collect()  # 2 candidates after seed
    assert [r["rank"] for r in out] == [1, 2]


def test_bpe_empty_corpus_returns_empty_merge_table(spark):
    """No learnable merge (single-symbol words / empty corpus) returns an
    empty, correctly-typed merge table instead of raising (ADVICE r6)."""
    from milan_spark.operators.bpe import bpe_train

    empty = spark.createDataFrame([], "doc_id int, text string")
    out = bpe_train(empty, merges=3)
    assert out.count() == 0
    assert out.columns == [
        "merge_rank", "left_sym", "right_sym", "merged", "pair_count",
    ]
    single = spark.createDataFrame([(1, "a b c a b")], ["doc_id", "text"])
    # every word is one symbol -> no adjacent pair anywhere
    assert bpe_train(single, merges=2).count() == 0


def test_bpe_checkpointed_trajectory_matches_lazy(spark):
    """localCheckpoint every K merges must not change the learned merges —
    only the plan depth."""
    from milan_spark.operators.bpe import bpe_train

    docs = spark.createDataFrame(
        [(1, "low low low low lower lower newest newest wider")],
        ["doc_id", "text"],
    )
    lazy = [tuple(r) for r in bpe_train(docs, merges=8, checkpoint_every=0).collect()]
    ckpt = [tuple(r) for r in bpe_train(docs, merges=8, checkpoint_every=2).collect()]
    assert lazy == ckpt and len(lazy) >= 5


def test_bpe_learns_expected_merges(spark):
    from milan_spark.operators.bpe import bpe_train

    # "low" x4, "lower" x2: pair (l,o) freq 6 wins round 1; then (lo,w) 6;
    # round 3: "low" done, "lower": (low,e) 2 vs (e,r) 2 -> lexicographic
    # tie-break picks (e,r)? compare ('e','r') < ('low','e'): 'e' < 'low'
    docs = spark.createDataFrame(
        [(1, "low low low low lower lower")], ["doc_id", "text"]
    )
    out = bpe_train(docs, merges=3).collect()
    assert [(r["left_sym"], r["right_sym"], r["pair_count"]) for r in out] == [
        ("l", "o", 6),
        ("lo", "w", 6),
        ("e", "r", 2),
    ]
    assert [r["merged"] for r in out] == ["lo", "low", "er"]


def test_bpe_greedy_merge_handles_adjacent_repeats(spark):
    from milan_spark.operators.bpe import bpe_train

    # "aaaa": round 1 pair (a,a) count 3 (overlapping adjacencies), greedy
    # left-to-right merge yields "aa aa" -> round 2 learns (aa,aa)
    docs = spark.createDataFrame([(1, "aaaa aaaa")], ["doc_id", "text"])
    out = bpe_train(docs, merges=2).collect()
    assert (out[0]["left_sym"], out[0]["right_sym"]) == ("a", "a")
    assert out[0]["pair_count"] == 6  # 3 adjacencies x 2 words
    assert (out[1]["left_sym"], out[1]["right_sym"]) == ("aa", "aa")


def test_image_dhash_ignores_off_lattice_noise(spark):
    import numpy as np

    from milan_spark.operators.multimodal import encode_bmp, image_dhash

    rng = np.random.RandomState(7)
    base = rng.randint(0, 256, size=(16, 16, 3)).astype(np.uint8)
    noisy = base.copy()
    ys = (np.arange(8) * 16) // 8
    xs = (np.arange(8) * 16) // 8
    lat_y = np.isin(np.arange(16), ys)
    lat_x = np.isin(np.arange(16), xs)
    off = ~(lat_y.reshape(16, 1) & lat_x.reshape(1, 16))
    noisy[off] = rng.randint(0, 256, size=(off.sum(), 3))
    flipped = base.copy()
    # perturb ON-lattice pixels hard -> hash must change
    flipped[ys[0], xs[0]] = 255 - flipped[ys[0], xs[0]]
    flipped[ys[3], xs[4]] = 255 - flipped[ys[3], xs[4]]
    df = spark.createDataFrame(
        [(1, bytearray(encode_bmp(base))), (2, bytearray(encode_bmp(noisy))),
         (3, bytearray(encode_bmp(flipped)))],
        ["doc_id", "payload"],
    )
    rows = {r["doc_id"]: r["dhash"] for r in image_dhash(df).collect()}
    assert rows[1] == rows[2]  # byte-different payloads, same perceptual hash
    assert rows[1] != rows[3]  # sampled-pixel change flips bits


def test_label_propagation_two_cliques(spark):
    from milan_spark.operators.graph import label_propagation

    # two 4-cliques joined by one bridge edge: LPA must keep them as two
    # communities labeled by each clique's smallest id
    k1 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    k2 = [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
    edges = k1 + k2 + [(4, 10)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    out = {r["node"]: r["label"] for r in label_propagation(df, iterations=4).collect()}
    assert {out[n] for n in (1, 2, 3)} == {1}
    assert {out[n] for n in (11, 12, 13)} == {10}
    # the bridge endpoints stay with their own cliques (3 same-clique
    # neighbors vs 1 bridge neighbor)
    assert out[4] == 1 and out[10] == 10


def test_label_propagation_partition_invariant(spark):
    from milan_spark.operators.graph import label_propagation

    edges = [(i, (i * 7) % 23 + 100) for i in range(60)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    a = sorted(map(tuple, label_propagation(df.repartition(1), iterations=3).collect()))
    b = sorted(map(tuple, label_propagation(df.repartition(9), iterations=3).collect()))
    assert a == b


def test_label_propagation_small_graph_path_agrees(spark):
    from milan_spark.operators.graph import label_propagation

    edges = [(i, (i * 11) % 17 + 200) for i in range(80)] + [(1, 2), (2, 3)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    a = sorted(map(tuple, label_propagation(df, iterations=3).collect()))
    b = sorted(
        map(tuple, label_propagation(df, iterations=3, small_graph=True).collect())
    )
    assert a == b


def test_mmr_k64_truncated_plan_keeps_greedy_prefix(spark):
    """k=64 exercises the every-16-picks localCheckpoint truncation; greedy
    selection is prefix-stable, so the k=8 trajectory must be exactly the
    first 8 picks of the k=64 one (checkpointing cannot change values)."""
    from milan_spark.operators.clustering import mmr_select

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    k64 = mmr_select(emb, dim=64, k=64).collect()
    assert [r["rank"] for r in k64] == list(range(1, 65))
    assert len({r["vec_id"] for r in k64}) == 64
    k8 = mmr_select(emb, dim=64, k=8).collect()
    assert [tuple(r) for r in k8] == [tuple(r) for r in k64[:8]]


def test_association_rules_hand_computed(spark):
    """4 baskets: {1,2,3}, {1,2}, {2,3}, {1,4} — verify pair counts,
    confidence and lift against hand arithmetic (duplicate (txn,item) rows
    must not inflate supports)."""
    from milan_spark.operators.association import association_rules, basket_pairs

    rows = [
        (10, 1), (10, 2), (10, 3), (10, 2),  # duplicate (10, 2)
        (20, 1), (20, 2),
        (30, 2), (30, 3),
        (40, 1), (40, 4),
    ]
    df = spark.createDataFrame(rows, ["txn", "item"]).repartition(4)
    pairs = {(r.item_a, r.item_b): r.n_pair for r in basket_pairs(df, min_count=1).collect()}
    assert pairs == {(1, 2): 2, (1, 3): 1, (2, 3): 2, (1, 4): 1}

    got = {
        (r.ante, r.cons): (r.n_pair, r.n_ante, r.n_cons, r.n_txn, r.confidence, r.lift)
        for r in association_rules(df, min_count=2, min_lift=(1, 1)).collect()
    }
    # supports: n_1=3, n_2=3, n_3=2; N=4
    # (1,2): lift = 2*4/(3*3) = 8/9 < 1 → filtered out both directions
    # (2,3): lift = 2*4/(3*2) = 4/3 > 1 → kept both directions
    assert set(got) == {(2, 3), (3, 2)}
    assert got[(2, 3)] == (2, 3, 2, 4, 2 / 3, 8 / 6)
    assert got[(3, 2)] == (2, 2, 3, 4, 1.0, 8 / 6)


def test_association_rules_partitioning_invariant(spark):
    from milan_spark.operators.association import association_rules

    rows = [(t, i) for t in range(30) for i in range(1, 6) if (t * i) % 3 != 1]
    a = spark.createDataFrame(rows, ["txn", "item"])
    one = sorted(map(tuple, association_rules(a, min_count=2).collect()))
    many = sorted(map(tuple, association_rules(a.repartition(16), min_count=2).collect()))
    assert one == many and len(one) > 0


def test_personalized_pagerank_mass_stays_reachable(spark):
    """Seeded restart: nodes unreachable from the seed read exactly 0; the
    seed keeps restart mass; a chain neighbor receives damped mass."""
    from milan_spark.operators.graph import pagerank_scaled

    # two disjoint chains: 1->2->3 and 10->11
    df = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], ["src", "dst"])
    got = {r.node: r.rank for r in pagerank_scaled(df, iterations=3, seeds=(1,)).collect()}
    assert got[10] == 0 and got[11] == 0
    assert got[1] == 150_000  # base only: (10^6 * 15)//100
    assert got[2] > 0 and got[3] > 0
