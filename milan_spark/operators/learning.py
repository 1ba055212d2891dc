"""Trained linear classifiers in exact integer arithmetic — the missing
*trainable* tier of the quality-gate stack (SURVEY.md §7 phase 6).

``operators.mixing.quality_classifier`` applies a FIXED linear model; real
curation pipelines (FineWeb-edu, DCLM) *train* the gate on labels first.
The reference has no learning operator at all — its only feedback construct
is Cycle (lang/Stream.scala:143-147), the same gap ``pagerank_scaled`` and
``kmeans_fixed`` fill for graphs and clustering. This module fills it for
supervised learning with the house discipline: every quantity is an int64,
so the full training TRAJECTORY is bit-identical on any engine and any
partitioning, and a DuckDB oracle can replay it round for round.

Algorithm: batch perceptron with a mean gradient. Round r with weights w
(w[0] is the bias over an implicit x0 = 1):

  margin_i = w·(1, x_i)                        (int64)
  M        = {i : y_i · margin_i ≤ 0}          (the misclassified set)
  g_j      = Σ_{i∈M} y_i · x_ij                (one combinable aggregate)
  w_j     += trunc(g_j / |M|)                  (exact: (g − g mod m)/m)

The mean-gradient step (classic "batch perceptron", Duda & Hart §5.5) keeps
``|w_j| ≤ rounds · max|x_j|`` — independent of row count, so the int64
envelope holds at any corpus size. ``trunc`` is the SQL-semantics
truncating division (``%`` sign follows the dividend in both Spark and
DuckDB), replicated exactly on the driver.

Scale shape per round: weights travel INTO the plan as d+1 literal ints
(the MMR winner-literal pattern), the margin/misclassification test is
row-local, and the gradient is ONE map-side-combinable aggregate collapsing
to a single row — a bounded decision probe, the house pattern. Training at
100 TB costs ``rounds`` fact-table scans with zero row shuffles; applying
the final weights is a pure row-local map.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F


def _trunc_div(g: int, m: int) -> int:
    """SQL truncating integer division: (g - g % m) / m with %'s sign
    following the dividend — NOT Python's floor semantics."""
    q = abs(g) // m
    return q if g >= 0 else -q


def perceptron_train(
    feats: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    *,
    rounds: int = 4,
) -> list[list[int]]:
    """Train ``rounds`` mean-gradient perceptron rounds over integer features
    ``feature_cols`` and labels ``label_col`` in {+1, −1}.

    Returns the full weight trajectory ``[w_1, …, w_rounds]`` where each
    ``w_r = [bias, w_feature_1, …]`` — callers usually apply ``traj[-1]``
    via :func:`perceptron_margins`. A round with zero misclassified rows is
    a no-op (weights carry forward), so the trajectory always has exactly
    ``rounds`` entries and an unrolled SQL replay can mirror it with a
    ``CASE WHEN m > 0`` per round.

    Each round runs ONE combinable aggregate over the feature frame and
    collects a single (d+2)-int row — a bounded decision probe; the rows
    themselves never shuffle. Persist ``feats`` before calling (it is
    scanned ``rounds`` times).
    """
    cols = list(feature_cols)
    y = F.col(label_col).cast("long")
    w = [0] * (len(cols) + 1)
    traj: list[list[int]] = []
    for _ in range(rounds):
        margin = F.lit(w[0]).cast("long")
        for wj, c in zip(w[1:], cols):
            margin = margin + F.lit(wj).cast("long") * F.col(c).cast("long")
        mis = (y * margin) <= 0
        aggs = [F.count(F.lit(1)).alias("m"), F.sum(y).alias("g0")] + [
            F.sum(y * F.col(c).cast("long")).alias(f"g{j+1}")
            for j, c in enumerate(cols)
        ]
        row = feats.filter(mis).agg(*aggs).first()
        m = row["m"]
        if m and m > 0:
            g = [row[f"g{j}"] for j in range(len(cols) + 1)]
            w = [wj + _trunc_div(gj, m) for wj, gj in zip(w, g)]
        traj.append(list(w))
    return traj


def perceptron_margins(
    feats: DataFrame,
    weights: Sequence[int],
    feature_cols: Sequence[str],
    *,
    label_col: str | None = None,
    margin_alias: str = "margin",
    keep_alias: str = "keep",
) -> DataFrame:
    """Apply a trained weight vector: adds the int64 decision margin and the
    exact boolean gate (margin > 0). Row-local, zero shuffles."""
    margin = F.lit(int(weights[0])).cast("long")
    for wj, c in zip(weights[1:], feature_cols):
        margin = margin + F.lit(int(wj)).cast("long") * F.col(c).cast("long")
    out = feats.withColumn(margin_alias, margin).withColumn(
        keep_alias, margin > 0
    )
    if label_col is not None:
        out = out.withColumn(
            "correct",
            (F.col(label_col).cast("long") > 0) == F.col(keep_alias),
        )
    return out
