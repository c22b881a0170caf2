"""Market-basket association rules over event streams.

The classic co-occurrence analytics (Agrawal & Srikant '94 support/
confidence, Brin '97 lift) the reference's per-metric aggregate set
cannot express: "users who do A in an hour also do B". The reference
stores one metric per series (ref: pkg/aggregate/aggregate.go); rule
mining needs the cross-metric basket view, which is exactly what a
DataFrame groupBy over the raw event table provides.

Scale shape: the expensive input (the event stream) is reduced by ONE
basket-keyed aggregate; everything after operates on baskets (bounded
by user×window count) and on the item/pair vocabulary (bounded by
|items|²), never on raw events again. Pair generation is scan-side
array algebra over each basket's sorted distinct item set — never a
self-join of the event table, which at 100 TB would shuffle the whole
stream twice and explode on hot baskets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def basket_assoc_rules(
    df: DataFrame,
    basket_cols: tuple,
    item_col: str,
    min_pair_count: int = 1,
) -> DataFrame:
    """Support / confidence / lift for every ordered item pair that
    shares a basket (a basket = one distinct ``basket_cols`` tuple;
    duplicate items within a basket count once, the standard
    market-basket contract).

    Output per (ante → cons) rule:
      - ``c_pair``  baskets containing both items,
      - ``support``    = c_pair / n_baskets,
      - ``confidence`` = c_pair / c_ante  (P(cons | ante)),
      - ``lift``       = confidence / (c_cons / n_baskets) — > 1 means
        the pair co-occurs more than independence predicts.

    Plan (100 TB posture):
      1. basket build — one basket-keyed aggregate
         (``sort_array(collect_set)``; basket width is bounded by the
         item vocabulary, so collect_set state is bounded),
      2. ordered pairs generated scan-side from each basket's array
         (nested ``transform``/``filter`` — no explode before the
         array is built, no self-join anywhere),
      3. pair-keyed aggregate whose OUTPUT is bounded by |vocab|²
         regardless of data volume,
      4. item supports and the basket total come back as broadcasts
         (vocab-sized and 1-row — never data-sized).
    All counts are integers; the three ratios divide longs exactly the
    way the SQL oracle does, so hash-level comparison needs only the
    standard rounding boundary.
    """
    b = df.groupBy(*basket_cols).agg(
        F.sort_array(F.collect_set(item_col)).alias("_items")
    )
    total = b.agg(F.count("*").alias("n_baskets"))
    items = (
        b.select(F.explode("_items").alias("item"))
        .groupBy("item")
        .agg(F.count("*").cast("long").alias("c_item"))
    )
    pair = F.flatten(
        F.transform(
            F.col("_items"),
            lambda a: F.transform(
                F.filter(F.col("_items"), lambda x: x != a),
                lambda c: F.struct(a.alias("ante"), c.alias("cons")),
            ),
        )
    )
    pairs = (
        b.select(F.explode(pair).alias("p"))
        .select("p.ante", "p.cons")
        .groupBy("ante", "cons")
        .agg(F.count("*").cast("long").alias("c_pair"))
        .where(F.col("c_pair") >= min_pair_count)
    )
    a_cnt = items.select(
        F.col("item").alias("ante"), F.col("c_item").alias("c_ante")
    )
    c_cnt = items.select(
        F.col("item").alias("cons"), F.col("c_item").alias("c_cons")
    )
    out = (
        pairs.join(F.broadcast(a_cnt), "ante")
        .join(F.broadcast(c_cnt), "cons")
        .crossJoin(F.broadcast(total))
    )
    confidence = F.col("c_pair") / F.col("c_ante")
    return out.select(
        "ante",
        "cons",
        "c_pair",
        "c_ante",
        "c_cons",
        F.col("n_baskets").cast("long").alias("n_baskets"),
        (F.col("c_pair") / F.col("n_baskets")).alias("support"),
        confidence.alias("confidence"),
        (confidence / (F.col("c_cons") / F.col("n_baskets"))).alias("lift"),
    )
