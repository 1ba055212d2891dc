"""Round-10 optimization equivalence pins: the fused / narrow-map ANN
internals must be BIT-IDENTICAL to the formulations they replaced.

- `_best_cell` became a broadcast array-argmin (zero corpus shuffle); the
  reference here is the old crossJoin × centroids → groupBy(min(struct))
  shape, written out explicitly.
- `pq_codebooks` / `pq_encode` train/encode all subspaces in ONE grouped
  pass; the reference is the old per-subspace loop composed from
  `kmeans_cells` + the explicit min-struct assignment.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import milan_spark.operators.similarity as S


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (i, [float(((i * 31 + d * 7) % 17) - 8) / 4.0 for d in range(8)])
        for i in range(24)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return df.select(
        F.col("vec_id").alias("__vid"), S.quantize("embedding").alias("__v")
    )


def _best_cell_reference(corpus_int, cells):
    """The pre-round-10 formulation: crossJoin × n_cells → min-struct agg."""
    d = corpus_int.crossJoin(F.broadcast(cells)).withColumn(
        "__d", S._l2_int(F.col("__v"), F.col("__cent"))
    )
    best = d.groupBy("__vid").agg(F.min(F.struct("__d", "cell", "__v")).alias("__m"))
    return best.select(
        "__vid", F.col("__m.cell").alias("cell"), F.col("__m.__v").alias("__v")
    )


def test_argmin_assignment_matches_crossjoin_groupby(spark, corpus):
    cells = corpus.filter(F.col("__vid") < 3).select(
        F.col("__vid").alias("cell"), F.col("__v").alias("__cent")
    )
    got = sorted(
        (r["__vid"], r["cell"], tuple(r["__v"]))
        for r in S._best_cell(corpus, cells).collect()
    )
    exp = sorted(
        (r["__vid"], r["cell"], tuple(r["__v"]))
        for r in _best_cell_reference(corpus, cells).collect()
    )
    assert got == exp and len(got) == 24


def test_fused_pq_matches_per_subspace_loop(spark, corpus):
    m_subs, n_cells, iters, dim = 2, 3, 2, 8
    d_sub = dim // m_subs
    books = S.pq_codebooks(corpus, m_subs, n_cells, iters, dim)
    codes = S.pq_encode(corpus, books, m_subs, dim)

    exp_books, exp_codes = [], []
    for s in range(m_subs):
        ci_s = corpus.select("__vid", F.slice("__v", s * d_sub + 1, d_sub).alias("__v"))
        b = S.kmeans_cells(ci_s, n_cells, iters, dim=d_sub)
        exp_books += [
            (s, r["cell"], tuple(r["__cent"])) for r in b.collect()
        ]
        enc = _best_cell_reference(ci_s, b)
        exp_codes += [(r["__vid"], s, r["cell"]) for r in enc.collect()]

    got_books = sorted(
        (r["sub"], r["cell"], tuple(r["__cent"])) for r in books.collect()
    )
    got_codes = sorted((r["__vid"], r["sub"], r["code"]) for r in codes.collect())
    assert got_books == sorted(exp_books)
    assert got_codes == sorted(exp_codes)
    assert len(got_codes) == 24 * m_subs
