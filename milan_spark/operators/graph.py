"""Iterative graph operators built on the cycle surface (SURVEY.md §2.7).

The reference's only iteration construct is the feedback Cycle
(``beginCycle``/``closeCycle``, lang/Stream.scala:143-147, IR
StreamExpressions.scala:141); its event compiler rejects cycles outright.
Here iteration is the batch fixpoint loop ``Stream.iterate`` (driver-driven,
lineage-truncated per round) — the same realization the reference's Boda
sample documents as the workaround (milan-samples/.../bodaboda/BodaApp.scala:60-69).

``connected_components`` is the canonical use: collapsing near-duplicate
*pairs* into dedup *clusters* (keep one document per component) — the step a
real corpus-dedup pipeline needs after any pair generator in
``operators.dedup``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iterations: int = 50,
) -> DataFrame:
    """Min-label propagation to a fixpoint: every node ends up labeled with
    the smallest node id in its component. Returns (node, label).

    Each round is one distributed job (message aggregate + label join);
    rounds needed = graph diameter — near-duplicate clusters are dense and
    shallow (diameter ≲ 3), so this beats the O(log n) large-star/small-star
    alternation in constant factors while staying a two-line plan. The
    convergence check rides the round's own job as a ``CollectMetrics``
    observation (count of improved labels), so no separate driver-blocking
    count job runs per round. Lineage is truncated every round
    (``Stream.iterate`` localCheckpoints), so plans stay flat regardless of
    iteration count.
    """
    from pyspark.sql import Observation

    from milan_spark.stream import Stream

    fwd = pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
    edges = fwd.unionByName(
        fwd.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).persist()
    # initialize with the FIRST propagation round already applied — the
    # distinct-nodes aggregate and round 1's message aggregate are the same
    # shuffle, so starting from min(self, min neighbor) saves one full
    # iterate round (one join + one checkpoint job) for free
    labels = (
        edges.groupBy(F.col("u").alias("n"))
        .agg(F.min("v").alias("__mv"))
        .select("n", F.least("n", "__mv").alias("l"))
    )

    holder: dict[str, Observation] = {}

    def body(s: Stream) -> Stream:
        lab = s.df
        msgs = (
            edges.join(lab, edges["v"] == lab["n"])
            .groupBy(edges["u"].alias("n"))
            .agg(F.min(lab["l"]).alias("__ml"))
        )
        # least() skips nulls: nodes with no incoming message keep their label
        new = lab.join(msgs, "n", "left").select(
            "n", F.least("l", "__ml").alias("l"), (F.col("__ml") < F.col("l")).alias("__imp")
        )
        obs = Observation()
        holder["obs"] = obs
        new = new.observe(obs, F.sum(F.col("__imp").cast("long")).alias("changed"))
        return Stream.from_dataframe(new.drop("__imp"))

    def converged(old: DataFrame, new: DataFrame) -> bool:
        # the eager localCheckpoint in iterate() already ran the job; the
        # observation result is available without another action
        return (holder["obs"].get["changed"] or 0) == 0

    out = Stream.from_dataframe(labels).iterate(body, max_iterations, converged)
    return out.to_df().select(F.col("n").alias("node"), F.col("l").alias("label"))
