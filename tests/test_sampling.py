"""Unit tests for the deterministic sampling/splitting operators
(operators/sampling.py) — properties the oracle hash-match can't express:
stability under repartitioning and corpus growth, and exact stratum sizes."""

from __future__ import annotations

from pyspark.sql import functions as F

from milan_spark.operators.sampling import hash_bucket, hash_split, stratified_sample
from milan_spark.sources import table
from tests.conftest import SF_SMOKE


def test_hash_split_partitions_and_sums(spark):
    docs = table(spark, SF_SMOKE, "documents")
    out = hash_split(docs, "doc_id")
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == docs.count()
    # every record got exactly one label; train is the large bucket
    assert set(counts) <= {"train", "val", "test"}
    assert counts["train"] > counts.get("val", 0)
    assert counts["train"] > counts.get("test", 0)


def test_hash_split_stable_under_repartition_and_growth(spark):
    docs = table(spark, SF_SMOKE, "documents")
    base = {r["doc_id"]: r["split"] for r in hash_split(docs, "doc_id").select("doc_id", "split").collect()}
    # repartitioning must not move any record between splits
    rep = {
        r["doc_id"]: r["split"]
        for r in hash_split(docs.repartition(7), "doc_id").select("doc_id", "split").collect()
    }
    assert rep == base
    # a subset corpus assigns identically (incremental-refresh safety)
    half = docs.filter(F.col("doc_id") % 2 == 0)
    sub = {r["doc_id"]: r["split"] for r in hash_split(half, "doc_id").select("doc_id", "split").collect()}
    assert all(base[k] == v for k, v in sub.items())


def test_hash_split_validates_widths(spark):
    docs = table(spark, SF_SMOKE, "documents")
    import pytest

    with pytest.raises(ValueError):
        hash_split(docs, "doc_id", splits={"train": 50, "test": 10})


def test_hash_split_null_key_raises_by_default(spark):
    import pytest

    df = spark.createDataFrame([(1,), (None,)], "k long")
    with pytest.raises(Exception) as ei:
        hash_split(df, "k").collect()
    assert "NULL split key" in str(ei.value)


def test_hash_split_null_key_explicit_label(spark):
    df = spark.createDataFrame([(1,), (None,)], "k long")
    out = {r["k"]: r["split"] for r in hash_split(df, "k", null_label="__null__").collect()}
    assert out[None] == "__null__"
    assert out[1] in {"train", "val", "test"}


def test_stratified_sample_exact_sizes(spark):
    ev = table(spark, SF_SMOKE, "events")
    out = stratified_sample(ev, ["event_type"], 5, "event_id")
    sizes = {r["event_type"]: r["n"] for r in out.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    per_type = {r["event_type"]: r["n"] for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    for t, n in per_type.items():
        assert sizes[t] == min(5, n)
    # deterministic: same sample on re-run
    again = stratified_sample(ev, ["event_type"], 5, "event_id")
    assert sorted(r["event_id"] for r in out.collect()) == sorted(r["event_id"] for r in again.collect())


def test_hash_bucket_range_and_spread(spark):
    ev = table(spark, SF_SMOKE, "events")
    b = ev.select(hash_bucket("event_id", 100).alias("b"))
    stats = b.agg(
        F.min("b").alias("lo"), F.max("b").alias("hi"), F.countDistinct("b").alias("nd")
    ).collect()[0]
    assert stats["lo"] >= 0 and stats["hi"] < 100
    # 1000 keys into 100 buckets should hit most buckets
    assert stats["nd"] > 80


def test_top_fraction_exact_vs_naive_window(spark):
    from pyspark.sql import Window, functions as F

    from milan_spark.operators.sampling import top_fraction_by_score

    # skewed strata: one source holds 90% of rows; scores collide heavily so
    # the boundary bucket must tie-break exactly
    rows = [(i, "big" if i % 10 else "small", (i * 37 % 50) / 50.0) for i in range(1, 901)]
    df = spark.createDataFrame(rows, "doc_id long, source string, score double")
    got = {
        (r.doc_id, r.source)
        for r in top_fraction_by_score(df, ["source"], "score", frac=(1, 5), key="doc_id").collect()
    }
    w = Window.partitionBy("source").orderBy(F.col("score").desc(), F.col("doc_id"))
    quota = df.groupBy("source").agg((F.floor(F.count(F.lit(1)) / 5)).alias("q"))
    want = {
        (r.doc_id, r.source)
        for r in df.withColumn("rk", F.row_number().over(w))
        .join(quota, "source")
        .filter(F.col("rk") <= F.col("q"))
        .collect()
    }
    assert got == want and len(got) > 0


def test_top_fraction_quota_zero_stratum_dropped(spark):
    from milan_spark.operators.sampling import top_fraction_by_score

    df = spark.createDataFrame(
        [(1, "tiny", 0.9), (2, "tiny", 0.8), (3, "tiny", 0.7)],
        "doc_id long, source string, score double",
    )
    # 3 rows / 5 -> quota 0: nothing kept, no divide-by-zero
    assert top_fraction_by_score(df, ["source"], "score", frac=(1, 5), key="doc_id").count() == 0


def test_aqp_uniform_estimates_exact_scaling_and_accuracy(spark):
    from milan_spark.operators.sampling import aqp_uniform_estimates

    n = 100_000
    df = spark.range(0, n).select(
        F.col("id").alias("k"),
        (F.col("id") % 2).cast("string").alias("g"),
        (F.col("id") % 100 + 1).alias("v"),
    )
    out = {
        r["g"]: r.asDict()
        for r in aqp_uniform_estimates(df, "k", ["g"], "v").collect()
    }
    assert set(out) == {"0", "1"}
    for g, r in out.items():
        # Horvitz-Thompson scaling is exact integer DIV of the sample sums
        assert r["est_rows"] == (r["n_sample"] * 10_007) // 111
        assert r["est_sum_measure"] == (r["sum_measure"] * 10_007) // 111
        # estimates land near the truth (rate ~1.1% of 50k rows per group
        # -> ~550 samples, relative SE ~4-5%; a 20% bound is ~4 sigma and
        # the hash is deterministic, so this never flakes)
        assert abs(r["est_rows"] - n / 2) < 0.2 * n / 2
        true_sum = sum(i % 100 + 1 for i in range(n) if i % 2 == int(g))
        assert abs(r["est_sum_measure"] - true_sum) < 0.2 * true_sum
        assert r["sum_sq_measure"] >= r["sum_measure"]


def test_aqp_uniform_estimates_is_partitioning_invariant(spark):
    from milan_spark.operators.sampling import aqp_uniform_estimates

    df = spark.range(0, 5_000).select(
        F.col("id").alias("k"), F.lit("a").alias("g"), F.lit(7).alias("v")
    )
    a = aqp_uniform_estimates(df, "k", ["g"], "v").collect()[0].asDict()
    b = aqp_uniform_estimates(df.repartition(17), "k", ["g"], "v").collect()[0].asDict()
    assert a == b
