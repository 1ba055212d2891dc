"""Recall@k A/B for the ANN family — the SCALE.md measurement script.

Ground truth = exact integer-L2 top-k per query (quantized vectors,
self excluded). Compares flat-codebook ``ann_ivfpq`` vs per-cell residual
``ann_ivfpq_residual`` at the given n_probe settings.

Usage: PYTHONPATH=/root/repo python3 tools/ann_recall.py <sf_dir> [n_probe ...]
"""

from __future__ import annotations

import sys

from pyspark.sql import Window as W, functions as F

from milan_spark.operators import similarity as S
from milan_spark.session import get_spark

K = 5
N_QUERIES = 10


def exact_topk(emb):
    ci = emb.select(F.col("vec_id").alias("__vid"), S.quantize("embedding").alias("__v"))
    qs = ci.filter(F.col("__vid") < N_QUERIES).select(
        F.col("__vid").alias("query_id"), F.col("__v").alias("__qv")
    )
    d = (
        ci.crossJoin(F.broadcast(qs))
        .filter(F.col("__vid") != F.col("query_id"))
        .withColumn("__d", S._l2_int(F.col("__v"), F.col("__qv")))
    )
    wk = W.partitionBy("query_id").orderBy("__d", "__vid")
    return (
        d.withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= K)
        .select("query_id", F.col("__vid").alias("neighbor_id"))
    )


def recall(result, truth) -> float:
    hit = result.join(truth, ["query_id", "neighbor_id"]).count()
    return hit / (N_QUERIES * K)


def main() -> None:
    sf_dir = sys.argv[1]
    probes = [int(x) for x in sys.argv[2:]] or [2, 4]
    spark = get_spark()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    truth = exact_topk(emb).cache()
    truth.count()
    for np_ in probes:
        kw = dict(query_ids=range(N_QUERIES), k=K, dim=64, n_probe=np_)
        flat = recall(S.ann_ivfpq(emb, "vec_id", "embedding", **kw), truth)
        res = recall(S.ann_ivfpq_residual(emb, "vec_id", "embedding", **kw), truth)
        print(f"RECALL sf_dir={sf_dir} n_probe={np_} flat={flat:.2f} residual={res:.2f}", flush=True)


if __name__ == "__main__":
    main()
