"""Association-rule mining (market-basket analysis): co-occurrence pairs,
support / confidence / lift — the Apriori pair level, which is where
production basket mining lives (higher-order itemsets explode combinatorially
and are pruned away in practice; the pair level is also the input to
item-to-item collaborative filtering, Linden et al. IEEE IC'03).

The reference has no association surface at all — its nearest constructs are
keyed aggregation + joins (lang/StreamExpressions.scala); this module exists
for the training-data/recommendation pipelines the engine targets, same tier
as operators.text.collocations (which is the SEQUENCE-bigram analog of the
SET co-occurrence computed here).

Scale shape (the 100 TB story):
- basket pair expansion is ROW-LOCAL: one map-side-combinable
  groupBy(txn) → sorted distinct item array, then an ordered-pair explode
  (slice past each position — no i×j fan-out-then-filter). Work is
  Σ|basket|², bounded by the basket-size cap a real pipeline enforces, never
  corpus².
- pair counts and item supports are combinable aggregates; supports attach
  to the (min_count-pruned) pair table by ITEM-keyed joins whose fan-out is
  the item's distinct-pair count (catalog-bounded, not corpus-bounded) — the
  same skew cap as collocations' word joins.
- the lift threshold multiplies through in DECIMAL(38,0), exact far past
  int64; reported confidence/lift are single correctly-rounded IEEE
  divisions over exact integer counts, reproducible across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

D38 = "decimal(38,0)"


def _baskets(df: DataFrame, txn_col: str, item_col: str) -> DataFrame:
    """(txn, sorted distinct item array) — the ONE shuffle the raw fact table
    pays in this module: ``collect_set`` dedupes map-side during partial
    aggregation, so no separate distinct pass (and no second raw-table
    exchange) is needed."""
    return (
        df.select(F.col(txn_col).alias("__txn"), F.col(item_col).alias("__item"))
        .groupBy("__txn")
        .agg(F.sort_array(F.collect_set("__item")).alias("items"))
    )


def _pairs_from_baskets(baskets: DataFrame, min_count: int) -> DataFrame:
    heads = baskets.select("items", F.posexplode("items").alias("i", "item_a"))
    pairs = heads.select(
        "item_a",
        F.explode(F.expr("slice(items, i + 2, size(items))")).alias("item_b"),
    )
    return (
        pairs.groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= min_count)
    )


def basket_pairs(
    df: DataFrame,
    txn_col: str = "txn",
    item_col: str = "item",
    *,
    min_count: int = 2,
) -> DataFrame:
    """Unordered co-occurrence pairs (item_a < item_b) with basket counts.

    One combinable groupBy(txn) (collect_set dedupes map-side — the raw
    table never shuffles twice), then a row-local ordered-pair explode: for
    each position i in the sorted item array, pair with the slice strictly
    past i — every unordered pair exactly once, no quadratic row fan-out
    before the pair even forms.
    """
    return _pairs_from_baskets(_baskets(df, txn_col, item_col), min_count)


def association_rules(
    df: DataFrame,
    txn_col: str = "txn",
    item_col: str = "item",
    *,
    min_count: int = 2,
    min_lift: tuple[int, int] = (1, 1),
) -> DataFrame:
    """Directed rules antecedent → consequent over every surviving pair:
    (ante, cons, n_pair, n_ante, n_cons, n_txn, confidence, lift).

    confidence = n_pair / n_ante;  lift = n_pair·n_txn / (n_ante·n_cons) —
    both emitted as one IEEE division over exact integer counts (the
    collocations discipline), with the ``min_lift`` rational threshold
    multiplied through in DECIMAL(38,0) so the FILTER never touches a float.

    Everything derives from ONE persisted basket table — the raw fact table
    shuffles exactly once (on txn), then N, supports, and pairs are all
    basket-table aggregates (supports explode the deduped arrays, not the
    raw rows).
    """
    baskets = _baskets(df, txn_col, item_col).persist()
    n_txn = baskets.agg(F.count(F.lit(1)).alias("n_txn"))
    supports = (
        baskets.select(F.explode("items").alias("item"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("n_item"))
    )
    pairs = _pairs_from_baskets(baskets, min_count)
    rules = pairs.select(
        F.col("item_a").alias("ante"), F.col("item_b").alias("cons"), "n_pair"
    ).unionByName(
        pairs.select(
            F.col("item_b").alias("ante"), F.col("item_a").alias("cons"), "n_pair"
        )
    )
    a = supports.select(F.col("item").alias("ante"), F.col("n_item").alias("n_ante"))
    c = supports.select(F.col("item").alias("cons"), F.col("n_item").alias("n_cons"))
    joined = rules.join(a, "ante").join(c, "cons").crossJoin(F.broadcast(n_txn))
    num, den = min_lift
    lift_pass = (
        F.lit(den).cast(D38) * F.col("n_pair").cast(D38) * F.col("n_txn").cast(D38)
        > F.lit(num).cast(D38) * F.col("n_ante").cast(D38) * F.col("n_cons").cast(D38)
    )
    confidence = F.col("n_pair").cast("double") / F.col("n_ante").cast("double")
    lift = (F.col("n_pair").cast("double") * F.col("n_txn").cast("double")) / (
        F.col("n_ante").cast("double") * F.col("n_cons").cast("double")
    )
    return joined.filter(lift_pass).select(
        "ante",
        "cons",
        "n_pair",
        "n_ante",
        "n_cons",
        "n_txn",
        confidence.alias("confidence"),
        lift.alias("lift"),
    )
