"""exact_heavy_hitters: exact equality with brute force on skewed data where
the vocabulary is far larger than the Misra-Gries capacity, plus the bounds
that make it a 100 TB plan (candidate set ≤ capacity × n_partitions; no
full-domain shuffle in the physical plan)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from milan_spark.operators.heavyhitters import exact_heavy_hitters, misra_gries_summaries


@pytest.fixture(scope="module")
def zipf_df(spark):
    # ~200k draws from a zipf(1.3) over a 50k-item vocabulary: a handful of
    # items carry percent-level shares, the tail is huge — the regime where
    # groupBy-everything is the wrong plan.
    rng = np.random.default_rng(7)
    draws = rng.zipf(1.3, size=200_000)
    draws = draws[draws <= 50_000]
    df = spark.createDataFrame([(f"tok{int(v)}",) for v in draws], "item string").repartition(8)
    df.persist().count()
    return df


def brute_force(df, num, den):
    tot = df.where(F.col("item").isNotNull()).count()
    rows = (
        df.where(F.col("item").isNotNull())
        .groupBy("item")
        .count()
        .where(F.col("count") * den >= num * tot)
        .collect()
    )
    return {(r["item"], r["count"], tot) for r in rows}


@pytest.mark.parametrize("share", [(1, 50), (1, 200), (3, 100)])
def test_matches_brute_force_on_zipf(spark, zipf_df, share):
    got = {
        (r["item"], r["n"], r["n_total"])
        for r in exact_heavy_hitters(zipf_df, "item", share).collect()
    }
    assert got == brute_force(zipf_df, *share)
    assert got  # nonempty at these thresholds — the test is not vacuous


def test_candidate_set_is_bounded(spark, zipf_df):
    capacity = 100
    summ = misra_gries_summaries(zipf_df, "item", capacity).collect()
    n_parts = zipf_df.rdd.getNumPartitions()
    cands = [r for r in summ if r["item"] is not None]
    sentinels = [r for r in summ if r["item"] is None]
    assert len(cands) <= capacity * n_parts
    assert sum(r["rows"] for r in sentinels) == zipf_df.count()
    # the prefilter actually prunes: candidates are a tiny fraction of the
    # ~20k distinct items in the corpus
    assert len(cands) < 0.1 * zipf_df.select("item").distinct().count()


def test_completeness_with_tight_capacity(spark, zipf_df):
    # capacity exactly 4·den/num (the default); verify against brute force at
    # a threshold where MG eviction is constantly active (capacity 80 vs 20k+
    # distinct items)
    got = {
        (r["item"], r["n"])
        for r in exact_heavy_hitters(zipf_df, "item", (1, 20), capacity=80).collect()
    }
    want = {(i, n) for i, n, _ in brute_force(zipf_df, 1, 20)}
    assert got == want


def test_nulls_excluded_from_items_and_total(spark):
    df = spark.createDataFrame(
        [("a",)] * 6 + [("b",)] * 3 + [(None,)] * 11, "item string"
    ).repartition(3)
    rows = exact_heavy_hitters(df, "item", (1, 2)).collect()
    assert {(r["item"], r["n"], r["n_total"]) for r in rows} == {("a", 6, 9)}


def test_no_full_domain_shuffle(spark, zipf_df):
    # the only hash-partitioned exchange on the verify side keys on the
    # candidate-pruned item set; the plan must show the semi-join as a
    # BroadcastHashJoin (candidates broadcast), not a SortMergeJoin over the
    # full domain
    plan = exact_heavy_hitters(zipf_df, "item", (1, 50))._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "LeftSemi" in plan


def test_weighted_matches_brute_force(spark, zipf_df):
    # weight = deterministic per-row integer; heavy hitters by MASS differ
    # from heavy hitters by count, and must equal the brute-force weighted
    # aggregate exactly
    wdf = zipf_df.withColumn("w", (F.xxhash64("item") % 7 + 7) % 7 + 1)
    got = {
        (r["item"], r["n"], r["n_total"])
        for r in exact_heavy_hitters(wdf, "item", (1, 100), weight="w").collect()
    }
    tot = wdf.agg(F.sum("w")).first()[0]
    want = {
        (r["item"], r["s"], tot)
        for r in wdf.groupBy("item")
        .agg(F.sum("w").alias("s"))
        .where(F.col("s") * 100 >= tot)
        .collect()
    }
    assert got == want
    assert got


def test_weighted_null_weights_count_zero(spark):
    df = spark.createDataFrame(
        [("a", 10), ("a", None), ("b", 3), (None, 99)], "item string, w long"
    ).repartition(2)
    rows = exact_heavy_hitters(df, "item", (1, 2), weight="w").collect()
    assert {(r["item"], r["n"], r["n_total"]) for r in rows} == {("a", 10, 13)}
