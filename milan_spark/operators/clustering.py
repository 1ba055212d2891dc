"""Embedding clustering in fixed-point integer arithmetic — the corpus
partitioner under SemDeDup-style semantic dedup and cluster-balanced data
mixing (SURVEY.md §7 phase 6; the reference has no numeric-iteration
operator — its only feedback construct is Cycle, lang/Stream.scala:143-147,
the same gap pagerank_scaled fills for graphs).

Float k-means is non-reproducible across engines and partitionings (partial
sums reorder; means round differently), so — like pagerank_scaled — every
quantity here is an int64:

  * coordinates quantized once: q_d = floor(x_d · scale) (exact: float →
    double is exact, double·2^k-free scale is correctly rounded the same
    everywhere, floor is exact);
  * distances are integer sums of squares;
  * centroid updates use the truncating exact division (s − s mod n)/n,
    identical in Spark (`%` sign follows the dividend) and ANSI SQL;
  * ties in the argmin break on cluster id.

The result is bit-identical on any engine and any partitioning — an
oracle-checkable Lloyd's algorithm.

Scale shape per round: ONE broadcast of the k·dim centroid table into a
map-side distance/argmin (the point set never shuffles for assignment —
`groupBy(id).min(struct(dist, cid))` collapses map-side to one row per
point), then a (k·dim)-cell map-side-combinable sum for the update. The
driver holds only the loop counter; k rounds stream the point set k times
with no quadratic term anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

_SCRAMBLE = 2_654_435_761
P31 = 2_147_483_647


def quantize_vec(col, scale: int = 1_000_000):
    """floor(x·scale) per dimension as int64 — the one float→int crossing."""
    return F.transform(
        col, lambda x: F.floor(x.cast("double") * F.lit(float(scale))).cast("long")
    )


def _sqdist(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def _assign(pts: DataFrame, centroids: DataFrame, id_col: str) -> DataFrame:
    """Nearest centroid per point (ties → smaller cid): broadcast the k-row
    centroid table, min over an integer (dist, cid) struct."""
    joined = pts.crossJoin(F.broadcast(centroids))
    d = _sqdist(F.col("q"), F.col("c")).alias("d")
    best = joined.groupBy(id_col).agg(
        F.min(F.struct(d, F.col("cid").alias("cid"))).alias("m")
    )
    return best.select(
        id_col, F.col("m.cid").alias("cid"), F.col("m.d").alias("dist")
    )


def kmeans_fixed(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
    k: int = 8,
    iters: int = 2,
    scale: int = 1_000_000,
) -> tuple[DataFrame, DataFrame]:
    """Lloyd's k-means, ``iters`` centroid-update rounds + a final
    assignment, all-integer (see module docstring).

    Seeds: the k points with the smallest (scramble(id), id) — a
    deterministic stand-in for uniform random init; cluster ids 0..k−1
    follow that order. A cluster that captures no points simply drops out
    of later rounds (classic Lloyd's empty-cluster behavior, kept because
    it is exactly reproducible).

    Returns ``(assignment, centroids)``: assignment = (id_col, cid, dist)
    under the FINAL centroids; centroids = (cid, c) int64 arrays.
    """
    pts = emb.select(
        F.col(id_col), quantize_vec(F.col(vec_col), scale).alias("q")
    ).persist()
    seeds = (
        pts.withColumn("__h", (F.col(id_col) * _SCRAMBLE) % P31)
        .orderBy("__h", id_col)
        .limit(k)
    )
    centroids = seeds.withColumn(
        "cid", F.row_number().over(W.orderBy("__h", F.col(id_col))) - 1
    ).select("cid", F.col("q").alias("c"))

    for _ in range(iters):
        assigned = _assign(pts, centroids, id_col).select(id_col, "cid")
        cells = (
            pts.join(assigned, id_col)
            .select("cid", F.posexplode("q").alias("pos", "v"))
            .groupBy("cid", "pos")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
        )
        # exact truncating division: numerator divisible by n, quotient
        # < 2^53, so the double division is exact in every engine
        dims = cells.select(
            "cid",
            "pos",
            ((F.col("s") - F.col("s") % F.col("n")) / F.col("n"))
            .cast("long")
            .alias("v"),
        )
        centroids = (
            dims.groupBy("cid")
            .agg(F.map_from_entries(F.collect_list(F.struct("pos", "v"))).alias("m"))
            .select(
                "cid",
                F.transform(
                    F.sequence(F.lit(0), F.lit(dim - 1)), lambda i: F.col("m")[i]
                ).alias("c"),
            )
        )

    final = _assign(pts, centroids, id_col)
    return final, centroids


def kmeans_cluster_profile(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
    k: int = 8,
    iters: int = 2,
    scale: int = 1_000_000,
) -> DataFrame:
    """Per-cluster summary of the fixed-point k-means run: size, integer
    inertia (Σ squared distance to the final centroid), centroid L1 mass
    and a position-weighted checksum — every column an exact int64, so the
    whole clustering is hash-comparable across engines."""
    assignment, centroids = kmeans_fixed(
        emb, id_col=id_col, vec_col=vec_col, dim=dim, k=k, iters=iters, scale=scale
    )
    sizes = assignment.groupBy("cid").agg(
        F.count(F.lit(1)).alias("size"), F.sum("dist").alias("inertia")
    )
    cstats = centroids.select(
        "cid",
        F.aggregate(
            "c", F.lit(0).cast("long"), lambda acc, v: acc + F.abs(v)
        ).alias("centroid_l1"),
        F.aggregate(
            F.zip_with(
                F.col("c"),
                F.sequence(F.lit(1), F.lit(dim)),
                lambda v, i: v * i,
            ),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ).alias("centroid_checksum"),
    )
    return sizes.join(cstats, "cid").orderBy("cid")


def mmr_select(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
    k: int = 8,
    lam: tuple[int, int] = (7, 10),
    scale: int = 1_000_000,
) -> DataFrame:
    """Maximal Marginal Relevance selection (Carbonell & Goldstein, SIGIR'98)
    — the diversity-aware subset picker for few-shot/eval-set construction:
    greedily take the item maximizing λ·rel − (1−λ)·max_{s∈S} sim(·,s).

    Query vector = the corpus item with the smallest scrambled id (the same
    deterministic seed rule kmeans_fixed uses), excluded from candidates.
    rel and sim are INTEGER dot products of the quantized vectors, and with
    λ = num/den the selection criterion clears denominators to
    num·rel − (den−num)·maxsim — every comparison exact int64, ties on id,
    so the greedy trajectory is engine- and partition-independent.

    Scale shape per round: the selected set is O(k) and BROADCAST; each
    round is one map-side max-similarity pass over the candidates plus a
    TakeOrderedAndProject argmax — the candidate set never shuffles. The
    winner row (one id) is the only thing the driver ever holds, the same
    O(k)-driver-state contract as the heavy-hitter merge.

    Output: (rank, id, rel, score) for the k selected items; score is the
    cleared-denominator criterion at selection time (round 1: num·rel).
    """
    num, den = lam
    pts = emb.select(
        F.col(id_col).alias("id"), quantize_vec(F.col(vec_col), scale).alias("q")
    ).persist()
    seed = (
        pts.withColumn("__h", (F.col("id") * _SCRAMBLE) % P31)
        .orderBy("__h", "id")
        .limit(1)
        .select(F.col("id").alias("qid"), F.col("q").alias("qv"))
    )

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )

    cand = (
        pts.crossJoin(F.broadcast(seed))
        .filter(F.col("id") != F.col("qid"))
        .select("id", "q", dot(F.col("q"), F.col("qv")).alias("rel"))
        .persist()
    )
    # incremental max-similarity: after each pick, fold ONLY the new
    # winner's similarity into a running per-candidate maxsim (the winner's
    # k·dim vector travels as a plan literal — O(dim) driver state). Each
    # round is then one narrow map over the persisted candidates + one
    # TakeOrderedAndProject argmax: O(n·dim) work per round instead of the
    # O(n·r·dim) full-selected-set recompute, and never an extra shuffle.
    chosen: list[tuple] = []  # (rank, id, rel, score)
    cur = cand.withColumn("maxsim", F.lit(None).cast("long"))
    for r in range(1, k + 1):
        score = F.when(
            F.col("maxsim").isNull(), F.lit(num) * F.col("rel")
        ).otherwise(
            F.lit(num) * F.col("rel") - F.lit(den - num) * F.col("maxsim")
        )
        win = (
            cur.withColumn("score", score)
            .orderBy(F.col("score").desc(), F.col("id"))
            .limit(1)
            .first()
        )
        if win is None:  # k exceeds the candidate count — return the shorter set
            break
        chosen.append((r, win["id"], win["rel"], win["score"]))
        qw = F.array(*[F.lit(int(v)) for v in win["q"]])
        cur = cur.filter(F.col("id") != F.lit(win["id"])).withColumn(
            "maxsim", F.greatest(F.col("maxsim"), dot(F.col("q"), qw))
        )
        if r % 16 == 0:
            # k picks stack k filter+withColumn pairs on the candidate
            # plan — truncate lineage so large k stays analyzer-flat
            # (materialized by the next round's argmax job)
            cur = cur.localCheckpoint(eager=False)
    spark = emb.sparkSession
    out = spark.createDataFrame(
        chosen, f"rank int, {id_col} long, rel long, score long"
    )
    return out.select(
        F.col("rank").cast("int"),
        F.col(id_col).cast("long"),
        F.col("rel").cast("long"),
        F.col("score").cast("long"),
    ).orderBy("rank")
