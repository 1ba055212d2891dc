"""Weak-scaling evidence for the heavy LLM operators (SCALE.md §Measured).

Synthesizes an R×-scale corpus from a base sf dir by replicating documents
and embeddings R times in a similarity-preserving, replica-disjoint,
LENGTH-PRESERVING way:

- documents: replica k's text goes through a per-replica letter rotation
  (``translate(text, 'a..z', rot_k('a..z'))`` + same for upper case) — byte
  length, token boundaries, and within-replica shingle/token structure are
  identical to the base corpus, while cross-replica vocabulary overlap is
  (near-)zero. The scaled corpus is R independent copies of the base
  workload: candidate pairs, clusters, and survivors all scale exactly R×,
  and total text bytes scale exactly R× — so a plan whose wall time scales
  ~R× is doing O(N) work. (An earlier token-prefix scheme inflated text
  bytes 1.5×, confounding the ratios.)
- embeddings: replica k's vectors are circularly shifted by k·7 mod dim —
  norms and within-replica cosines are preserved exactly; cross-replica
  cosines decorrelate. embedding_near_dup is an all-pairs block plan, so
  its COMPUTE scales R² by design — the measurement documents that; the
  scale path for large corpora is LSH/IVF candidate generation.

Each (query, scale) measurement runs in a FRESH subprocess: long-lived
local[32] sessions accumulate localCheckpoint blocks and GC state across
queries, which contaminated same-process measurements by up to 10×.

Usage:
  PYTHONPATH=/root/repo python tools/scale_bench.py [replicas] [base_sf_dir]
  PYTHONPATH=/root/repo python tools/scale_bench.py --one <sf_dir> <query> <passes>

Writes /tmp/milan_scale{R}x and prints one JSON line + a markdown table for
SCALE.md. Per-query timing: median over `passes` after one untimed warmup
pass, same discipline as bench.py.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QUERIES = [
    "minhash_lsh_dedup",
    "ngram_jaccard_dedup",
    "simhash_dedup",
    "dedup_clusters",
    "embedding_near_dup",
    "pack_sequences_512",
    # round-4 additions over the documents table (replica-disjoint scaling:
    # shared shingles stay within-replica, so passage spans scale exactly R×;
    # collocation lift INFLATES R× by construction — n_ab·N grows R² while
    # n_a·n_b stays put — which only grows the output, not the plan shape)
    "duplicate_passage_spans",
    "collocation_pmi",
    "doc_chunking",
    # round-4: two narrow scans + candidate-only shuffle; wall should track
    # scan rate, state bounded by capacity × partitions
    "hot_token_heavy_hitters",
    # round-5 additions (semantic_dedup needs the scaled embeddings the
    # replica builder also writes; the rest are documents-table ops)
    "semantic_dedup",
    "cms_token_counts",
    "bigram_fluency_gate",
    "incremental_dedup_delta",
    # round-6 additions. Documents: rotated replicas keep byte/token volume
    # exactly R× with (near-)disjoint vocab — bm25's query-term filter then
    # matches ~only replica 0, so its wall should track the SCAN, not R×
    # match volume; dsir/bpe see R× vocabulary; the classifier is row-local.
    # Embeddings: kmeans/mmr see R× points against fixed k.
    "bm25_search",
    "dsir_selection",
    "quality_classifier_gate",
    "bpe_merge_induction",
    "kmeans_embedding_clusters",
    "mmr_diverse_selection",
]

_ALPHA = "abcdefghijklmnopqrstuvwxyz"


def build_scaled(spark, base: str, out: str, replicas: int) -> None:
    from pyspark.sql import functions as F

    if os.path.exists(out):
        shutil.rmtree(out)
    os.makedirs(out)
    rep = F.explode(F.sequence(F.lit(0), F.lit(replicas - 1))).alias("__rep")

    docs = spark.read.parquet(f"{base}/documents.parquet")
    n_docs = docs.count()
    # per-replica letter rotation: rot(k*3+1) keeps replica 0 ≡ base corpus
    # only for k=0 (shift 1 ≠ 0 — shift k*3 so k=0 is identity)
    rot = F.col("text")
    for k in range(1, replicas):
        s = (k * 3) % 26 or 1
        tgt = _ALPHA[s:] + _ALPHA[:s]
        rot_k = F.translate(F.translate("text", _ALPHA, tgt), _ALPHA.upper(), tgt.upper())
        rot = F.when(F.col("__rep") == k, rot_k).otherwise(rot)
    scaled_docs = docs.select("*", rep).select(
        (F.col("doc_id") + F.col("__rep") * n_docs).alias("doc_id"),
        rot.alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    scaled_docs.repartition(32).write.parquet(f"{out}/documents.parquet")

    emb = spark.read.parquet(f"{base}/embeddings.parquet")
    n_emb = emb.count()
    dim = len(emb.select("embedding").first()[0])
    shift = (F.col("__rep") * 7) % dim
    rotated = F.concat(
        F.slice("embedding", shift + 1, F.lit(dim) - shift),
        F.slice("embedding", 1, shift),
    )
    (
        emb.select("*", rep)
        .select(
            (F.col("vec_id") + F.col("__rep") * n_emb).alias("vec_id"),
            rotated.alias("embedding"),
            "label",
        )
        .repartition(32)
        .write.parquet(f"{out}/embeddings.parquet")
    )


TPCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q9_product_type_profit",
    "q13_customer_order_distribution",
    "q18_large_volume_orders",
    "q21_sole_late_supplier",
]


def build_scaled_tpch(spark, base: str, out: str, replicas: int) -> None:
    """Weak-scale the RELATIONAL fact tables: lineitem and orders replicate
    R times with orderkeys shifted by replica (disjoint key ranges, so join
    fan-outs and per-order aggregates stay replica-local and scale exactly
    R×); dimensions (customer/supplier/part/nation/region) and the events
    stream copy through unchanged — the classic weak-scaling setup where
    history grows against a fixed entity universe. Every per-entity
    aggregate (q13 counts, q18 order totals) sees R× rows per entity; every
    per-order shape (q3, q21) sees R× independent orders.
    """
    from pyspark.sql import functions as F

    if os.path.exists(out):
        shutil.rmtree(out)
    os.makedirs(out)
    rep = F.explode(F.sequence(F.lit(0), F.lit(replicas - 1))).alias("__rep")

    orders = spark.read.parquet(f"{base}/orders.parquet")
    off = int(orders.agg(F.max("o_orderkey")).first()[0]) + 1
    (
        orders.select("*", rep)
        .select(
            (F.col("o_orderkey") + F.col("__rep") * off).alias("o_orderkey"),
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        )
        .repartition(32)
        .write.parquet(f"{out}/orders.parquet")
    )
    li = spark.read.parquet(f"{base}/lineitem.parquet")
    (
        li.select("*", rep)
        .select(
            (F.col("l_orderkey") + F.col("__rep") * off).alias("l_orderkey"),
            *[c for c in li.columns if c != "l_orderkey"],
        )
        .repartition(32)
        .write.parquet(f"{out}/lineitem.parquet")
    )
    for t in ("customer", "supplier", "part", "nation", "region", "events"):
        spark.read.parquet(f"{base}/{t}.parquet").write.parquet(f"{out}/{t}.parquet")


def measure_one(sf_dir: str, name: str, passes: int) -> None:
    from milan_spark.catalog import queries
    from milan_spark.session import get_spark, release_cached

    spark = get_spark("milan_scale_one")
    q = queries()[name]
    samples = []
    for p in range(passes + 1):  # pass 0 = untimed warmup
        start = time.perf_counter()
        q(spark, sf_dir).write.format("noop").mode("overwrite").save()
        if p > 0:
            samples.append(time.perf_counter() - start)
        release_cached(spark)
    med = round(sorted(samples)[len(samples) // 2], 2)
    print(json.dumps({"query": name, "sf_dir": sf_dir, "median": med, "passes": [round(s, 2) for s in samples]}))


def time_queries(sf_dir: str, passes: int) -> dict[str, float]:
    out: dict[str, float] = {}
    only = os.environ.get("SCALE_BENCH_ONLY", "")
    names = [n for n in QUERIES if n in only.split(",")] if only else QUERIES
    for name in names:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", sf_dir, name, str(passes)],
            capture_output=True,
            text=True,
            env={**os.environ, "PYTHONPATH": REPO},
        )
        line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            print(f"  {sf_dir} {name}: FAILED\n{r.stderr[-2000:]}", flush=True)
            out[name] = -1.0
            continue
        out[name] = rec["median"]
        print(f"  {sf_dir} {name}: {rec['median']}s (passes: {rec['passes']})", flush=True)
    return out


# ---------------------------------------------------------------------------
# Streaming weak-scaling tier: does state track the WATERMARK HORIZON or the
# stream length? Replicas are TIME-EXTENDED (replica k shifts ts by k·span,
# same user universe, 2 files per replica → 2R mtime-ordered microbatches), so
# a 10× run is a 10×-longer stream at identical per-horizon density. A
# correctly-evicting operator then shows ~flat max-state-rows while input rows
# grow 10×; an operator accreting state per record would grow 10×.
# ---------------------------------------------------------------------------

STREAM_PROBES = ["stream_enrich_join", "stream_daily_window", "stream_interval_join"]


def build_scaled_events_stream(spark, base: str, out: str, replicas: int) -> None:
    """Stage time-extended scaled events as 2·R mtime-ordered parquet slices."""
    from pyspark.sql import functions as F

    from milan_spark.sources import table

    if os.path.exists(out):
        shutil.rmtree(out)
    os.makedirs(out)
    ev = table(spark, base, "events")
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    span_us = int((hi - lo).total_seconds() * 1_000_000) + 3_600_000_000
    max_id = int(ev.agg(F.max("event_id")).first()[0]) + 1
    mid = lo + (hi - lo) / 2
    slice_i = 0
    for k in range(replicas):
        shifted = ev.select(
            (F.col("event_id") + k * max_id).alias("event_id"),
            (F.col("ts") + F.expr(f"INTERVAL {k * span_us} MICROSECOND")).alias("ts"),
            "user_id",
            "event_type",
            "value",
        )
        for half in (
            shifted.filter(F.col("ts") < mid + F.expr(f"INTERVAL {k * span_us} MICROSECOND")),
            shifted.filter(F.col("ts") >= mid + F.expr(f"INTERVAL {k * span_us} MICROSECOND")),
        ):
            tmp = os.path.join(out, f"__tmp{slice_i}")
            half.coalesce(1).write.parquet(tmp)
            part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
            dst = os.path.join(out, f"{slice_i:03d}.parquet")
            shutil.move(os.path.join(tmp, part), dst)
            shutil.rmtree(tmp)
            os.utime(dst, (1_000_000_000 + slice_i * 1000,) * 2)
            slice_i += 1


def _stream_probe_build(spark, stage_dir: str, which: str):
    from pyspark.sql import functions as F

    from milan_spark.streaming import stateful, windowed_agg

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"

    def src():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage_dir)
        )

    if which == "stream_enrich_join":
        purchases = src().filter(F.col("event_type") == "purchase").select(
            "user_id", F.col("value").alias("amount"), F.col("event_id").alias("__seq")
        )
        signups = src().filter(F.col("event_type") == "signup").select(
            "user_id", F.col("ts").alias("signup_ts"), F.col("event_id").alias("__seq")
        )
        return stateful.left_enrichment_join(purchases, signups, on="user_id")
    if which == "stream_daily_window":
        return windowed_agg(
            src(), "ts", "1 day", aggs=[F.count(F.lit(1)).alias("n")]
        )
    if which == "stream_interval_join":
        p = (
            src().filter(F.col("event_type") == "purchase")
            .select("user_id", F.col("ts").alias("p_ts"), F.col("value").alias("amount"))
            .withWatermark("p_ts", "1 day")
        )
        v = (
            src().filter(F.col("event_type") == "view")
            .select(F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts"))
            .withWatermark("v_ts", "1 day")
        )
        return p.join(
            v,
            (F.col("user_id") == F.col("v_user"))
            & (F.col("v_ts") <= F.col("p_ts"))
            & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 DAY")),
        )
    raise ValueError(which)


def measure_stream_one(stage_dir: str, which: str) -> None:
    from milan_spark.session import get_spark
    from milan_spark.streaming import last_progress, run_to_memory

    spark = get_spark("milan_scale_stream")
    start = time.perf_counter()
    run_to_memory(_stream_probe_build(spark, stage_dir, which), f"probe_{which}")
    wall = time.perf_counter() - start
    prog = last_progress()
    state_rows = [
        sum(op.get("numRowsTotal", 0) for op in p.get("stateOperators", []))
        for p in prog
    ]
    state_bytes = [
        sum(op.get("memoryUsedBytes", 0) for op in p.get("stateOperators", []))
        for p in prog
    ]
    print(
        json.dumps(
            {
                "query": which,
                "stage": stage_dir,
                "wall": round(wall, 2),
                "batches": len(prog),
                "input_rows": sum(p.get("numInputRows", 0) for p in prog),
                "max_state_rows": max(state_rows, default=0),
                "final_state_rows": state_rows[-1] if state_rows else 0,
                "max_state_bytes": max(state_bytes, default=0),
                "batch_ms": [p.get("durationMs", {}).get("triggerExecution") for p in prog],
            }
        )
    )


def run_streaming_tier(replicas: int, base: str) -> None:
    from milan_spark.session import get_spark

    stages = {}
    gen = get_spark("milan_scale_stream_gen")
    for r, tag in ((1, "base"), (replicas, f"{replicas}x")):
        stage = f"/tmp/milan_scale_stream_{tag}"
        build_scaled_events_stream(gen, base, stage, r)
        stages[tag] = stage
    gen.stop()

    results: dict[str, dict[str, dict]] = {}
    for tag, stage in stages.items():
        for which in STREAM_PROBES:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--stream-one", stage, which],
                capture_output=True,
                text=True,
                env={**os.environ, "PYTHONPATH": REPO},
            )
            line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                print(f"  {tag} {which}: FAILED\n{r.stderr[-2000:]}", flush=True)
                continue
            results.setdefault(which, {})[tag] = rec
            print(f"  {tag} {which}: wall={rec['wall']}s batches={rec['batches']} "
                  f"in={rec['input_rows']} max_state={rec['max_state_rows']}", flush=True)

    print(json.dumps({"replicas": replicas, "streaming": results}))
    print(f"\n| probe | input rows 1x→{replicas}x | max state rows 1x→{replicas}x | "
          "wall 1x→{0}x (s) | batches |".format(replicas))
    print("|---|---|---|---|---|")
    for which in STREAM_PROBES:
        b = results.get(which, {}).get("base")
        s = results.get(which, {}).get(f"{replicas}x")
        if not b or not s:
            continue
        print(
            f"| {which} | {b['input_rows']}→{s['input_rows']} "
            f"| {b['max_state_rows']}→{s['max_state_rows']} "
            f"| {b['wall']}→{s['wall']} | {b['batches']}→{s['batches']} |"
        )


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--one":
        measure_one(sys.argv[2], sys.argv[3], int(sys.argv[4]))
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--stream-one":
        measure_stream_one(sys.argv[2], sys.argv[3])
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--streaming":
        replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
        base = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
        run_streaming_tier(replicas, base)
        return
    tpch = len(sys.argv) > 1 and sys.argv[1] == "--tpch"
    if tpch:
        sys.argv.pop(1)
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    base = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    passes = int(os.environ.get("SCALE_BENCH_PASSES", "2"))
    out_dir = f"/tmp/milan_scale{replicas}x"

    from milan_spark.session import get_spark, release_cached

    gen = get_spark("milan_scale_gen")
    if tpch:
        global QUERIES
        QUERIES = TPCH_QUERIES
        out_dir = f"/tmp/milan_scale_tpch{replicas}x"
        build_scaled_tpch(gen, base, out_dir, replicas)
    else:
        build_scaled(gen, base, out_dir, replicas)
    gen.stop()  # free the generator JVM before the measured subprocesses
    base_t = time_queries(base, passes)
    scaled_t = time_queries(out_dir, passes)

    print(json.dumps({"replicas": replicas, "base": base_t, "scaled": scaled_t}))
    print(f"\n| query | base (s) | {replicas}x (s) | ratio |")
    print("|---|---|---|---|")
    for name in QUERIES:
        if name not in base_t:
            continue
        b, s = base_t[name], scaled_t[name]
        ratio = round(s / b, 1) if b > 0 and s > 0 else None
        print(f"| {name} | {b} | {s} | {ratio}x |")


if __name__ == "__main__":
    main()
