"""Sequence packing & mixture sampling: algebraic invariants and the
scale-critical plan shape (the global prefix sum must never put the data
through a single-partition window)."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import Window as W, functions as F

from milan_spark.operators.packing import (
    bucketed_prefix_sum,
    pack_sequences,
    token_budget_mixture,
)
from milan_spark.operators.sampling import hash_bucket


def _docs(spark, n=300):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.col("id") * 37 + 11, F.lit(23)) + 1).alias("n_tokens"),
        F.concat(F.lit("src"), F.pmod("id", F.lit(4))).alias("source"),
    )


def test_bucketed_prefix_sum_equals_single_window(spark):
    df = _docs(spark).withColumn("__ord", hash_bucket("doc_id", 1 << 30).cast("long"))
    got = bucketed_prefix_sum(
        df, "n_tokens", [F.col("__ord"), F.col("doc_id")], F.expr("__ord div 4194304"), "e"
    )
    w = W.orderBy("__ord", "doc_id").rowsBetween(W.unboundedPreceding, -1)
    want = df.withColumn("e", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
    assert sorted(got.select("doc_id", "e").collect()) == sorted(
        want.select("doc_id", "e").collect()
    )


def test_prefix_sum_invariant_under_repartition(spark):
    df = _docs(spark).withColumn("__ord", hash_bucket("doc_id", 1 << 30).cast("long"))
    args = ("n_tokens", [F.col("__ord"), F.col("doc_id")], F.expr("__ord div 4194304"), "e")
    base = sorted(bucketed_prefix_sum(df, *args).select("doc_id", "e").collect())
    shuffled = sorted(
        bucketed_prefix_sum(df.repartition(7, "source"), *args).select("doc_id", "e").collect()
    )
    assert base == shuffled


def test_pack_sequences_layout_invariants(spark):
    budget = 64
    out = pack_sequences(_docs(spark), "doc_id", "n_tokens", budget).collect()
    total = sum(r.n_tokens for r in out)
    n_seqs = max(r.seq_id for r in out) + 1
    # the layout is a partition of the concatenated token stream
    assert n_seqs == (total + budget - 1) // budget or n_seqs == total // budget + 1
    for r in out:
        assert 0 <= r.seq_offset < budget
        # a doc crosses a cut iff its tokens don't fit the remaining room
        assert r.spans_boundary == (r.seq_offset + r.n_tokens > budget)
    # every sequence except the last is exactly full: doc starts cover all seqs
    assert {r.seq_id for r in out} == set(range(n_seqs))


def test_token_budget_mixture_quota_semantics(spark):
    docs = _docs(spark)
    kept = token_budget_mixture(docs, "source", "n_tokens", 100, key="doc_id").collect()
    by_src = {}
    for r in kept:
        by_src.setdefault(r.source, []).append(r)
    for src, rows in by_src.items():
        tot = sum(r.n_tokens for r in rows)
        # overshoot bounded by one document; dropping the hash-order-last kept
        # doc must land under quota
        assert tot - max(r.n_tokens for r in rows) < 100
    # per-domain dict: a missing domain is dropped entirely
    kept2 = token_budget_mixture(
        docs, "source", "n_tokens", {"src0": 100, "src1": 50}, key="doc_id"
    ).collect()
    assert {r.source for r in kept2} <= {"src0", "src1"}


def test_pack_plan_has_no_single_partition_data_window(spark):
    # the data-path window partitions by the range bucket; the only
    # unpartitioned window runs over the O(buckets) totals, after an
    # aggregate. Physical check: every window node that consumes the raw
    # table sits on a hashpartitioning exchange, not SinglePartition.
    df = pack_sequences(_docs(spark, 5000), "doc_id", "n_tokens", 512)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="formatted")
    p = buf.getvalue()
    import re

    assert len(re.findall(r"\(\d+\) Window\b", p)) == 2
    # exactly one single-partition exchange — the bucket-totals side
    assert p.count("SinglePartition") == 1


def test_mixture_plan_uses_composite_key_windows(spark):
    # per-domain cumsum must NOT plan a per-domain single-task window: the
    # data-path window partitions on (domain, range bucket); only the tiny
    # per-(domain,bucket) totals window partitions on domain alone, after an
    # aggregate. A giant domain therefore never serializes on one task.
    from milan_spark.operators.packing import token_budget_mixture

    df = token_budget_mixture(_docs(spark, 5000), "source", "n_tokens", 800, key="doc_id")
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="formatted")
    p = buf.getvalue()
    import re

    # two windows total (data-path cumsum + totals offsets), none single-partition
    assert len(re.findall(r"\(\d+\) Window\b", p)) == 2
    assert "SinglePartition" not in p
    # the data window's exchange hashes on the composite (domain, bucket) key —
    # Spark names the extracted bucket expression _wN in the window spec
    assert re.search(r"hashpartitioning\(source#\d+, _w\d+", p)
