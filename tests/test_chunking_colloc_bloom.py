"""Unit tests for the round-4 additions: token chunking, collocation
mining, duplicate-passage spans, and the Bloom prefilter."""

from __future__ import annotations

from pyspark.sql import functions as F

from milan_spark.operators.chunking import chunk_tokens
from milan_spark.operators.dedup import duplicate_passage_spans
from milan_spark.operators.sketch import bloom_build, bloom_member
from milan_spark.operators.text import collocations


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_tokens_windows_and_tail(spark):
    df = _docs(spark, [(1, " ".join(f"w{i}" for i in range(10)))])
    out = chunk_tokens(df, window=4, stride=3).orderBy("chunk_idx").collect()
    # starts 1,4,7,10 -> chunks of 4,4,4,1 tokens
    assert [r.chunk_idx for r in out] == [0, 1, 2, 3]
    assert [r.n_chunk_tokens for r in out] == [4, 4, 4, 1]
    assert out[0].chunk_text == "w0 w1 w2 w3"
    assert out[3].chunk_text == "w9"


def test_chunk_tokens_empty_and_short_docs(spark):
    df = _docs(spark, [(1, ""), (2, "   "), (3, "solo")])
    out = chunk_tokens(df, window=8, stride=8).collect()
    assert {(r.doc_id, r.chunk_text) for r in out} == {(3, "solo")}


def test_chunk_tokens_exact_cover_no_overlap(spark):
    df = _docs(spark, [(1, "a b c d e f")])
    out = chunk_tokens(df, window=3, stride=3).orderBy("chunk_idx").collect()
    assert [r.chunk_text for r in out] == ["a b c", "d e f"]


def test_chunk_tokens_rejects_bad_params(spark):
    import pytest

    df = _docs(spark, [(1, "a")])
    with pytest.raises(ValueError):
        chunk_tokens(df, window=0, stride=1)
    with pytest.raises(ValueError):
        chunk_tokens(df, window=4, stride=0)


def test_collocations_finds_fixed_phrase(spark):
    # "new york" always together; filler words independent
    rows = [(i, f"new york alpha{i % 7} beta{i % 5} gamma{i % 3}") for i in range(40)]
    df = _docs(spark, rows)
    out = {r.gram: r for r in collocations(df, min_count=5, min_lift=(5, 4)).collect()}
    assert "new york" in out
    r = out["new york"]
    assert r.n_ab == 40 and r.n_a == 40 and r.n_b == 40
    # lift = 40*N/(40*40) = N/40 = 200/40
    assert r.lift == 5.0


def test_collocations_min_count_prunes(spark):
    df = _docs(spark, [(1, "rare pair"), (2, "other text")])
    assert collocations(df, min_count=2).count() == 0


def test_duplicate_passage_spans_known_overlap(spark):
    shared = "the quick brown fox jumps over the lazy dog tonight"
    rows = [
        (1, "aa bb cc " + shared + " dd ee"),
        (2, "xx yy " + shared + " zz"),
        (3, "totally unrelated words only here once every time"),
    ]
    out = {
        r.doc_id: r
        for r in duplicate_passage_spans(_docs(spark, rows), k=5).collect()
    }
    # 10-token shared passage -> 6 consecutive shared 5-gram positions -> one
    # run of 6 -> span of 6+4 = 10 tokens in both docs; doc 3 absent
    assert set(out) == {1, 2}
    for d in (1, 2):
        assert out[d].n_dup_runs == 1
        assert out[d].n_dup_positions == 6
        assert out[d].max_dup_span_tokens == 10


def test_duplicate_passage_within_doc_repeat_not_shared(spark):
    # the repeated 5-gram lives in ONE doc only -> cross-doc definition
    # keeps it out
    df = _docs(spark, [(1, "a b c d e a b c d e"), (2, "f g h i j")])
    assert duplicate_passage_spans(df, k=5).count() == 0


def test_bloom_no_false_negatives_and_exact_fp_audit(spark):
    build = spark.range(0, 500).select(F.col("id").alias("k"))
    bloom = bloom_build(build, "k", m_bits=4096)
    probe = spark.range(0, 2000).select(F.col("id").alias("k"))
    checked = probe.crossJoin(F.broadcast(bloom)).select(
        "k", bloom_member("k", F.col("bloom"), m_bits=4096, numeric=True).alias("hit")
    )
    rows = {r.k: r.hit for r in checked.collect()}
    # every build key passes (no false negatives)
    assert all(rows[k] for k in range(500))
    # the filter actually filters: most non-members rejected
    fp = sum(1 for k in range(500, 2000) if rows[k])
    assert fp < 400


def test_bloom_deterministic_across_runs(spark):
    build = spark.range(0, 100).select(F.col("id").alias("k"))
    a = bloom_build(build, "k", m_bits=1024).collect()[0].bloom
    b = bloom_build(build.repartition(7), "k", m_bits=1024).collect()[0].bloom
    assert a == b


def test_join_size_estimate_den1_is_exact(spark):
    """sample_den=1 keeps every key, so the 'estimate' must equal the true
    join cardinality — both for the two-table and self-join forms."""
    from milan_spark.operators.sketch import join_size_estimate

    a = spark.createDataFrame([(k,) for k in [1, 1, 2, 3, 3, 3]], ["k"])
    b = spark.createDataFrame([(k,) for k in [1, 3, 3, 4]], ["k"])
    two = join_size_estimate(a, "k", b, "k", sample_den=1).first()
    assert two.est_pairs == a.join(b, "k").count() == 8
    self_ = join_size_estimate(a, "k", sample_den=1).first()
    assert self_.est_pairs == 4 + 1 + 9
    assert self_.n_sampled_keys == 3
