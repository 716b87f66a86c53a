"""Market-basket co-occurrence analytics: association rules with
exact integer support / confidence / lift.

The frequent-pair mining every commerce / recommendation pipeline runs
over keyed transaction logs (reference parity: this consumes the same
(basket, item) shape a keyed topic's messages expose — the
per-key grouping the broker's dispatch order makes well-defined; cf.
the compaction family's keyed materialization).

Determinism discipline: counts are exact BIGINTs; every ratio is an
integer micro-unit floor division (``x·10⁶ DIV y`` — the PageRank /
Markov contract); lift's triple product cross-multiplies in
DECIMAL(38,0) so the single floor division stays exact at any corpus
scale (bigint would overflow near ~10¹⁰ baskets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def association_rules(df: DataFrame, *, basket_col: str,
                      item_col: str, min_pair_count: int = 1,
                      max_basket_size: int | None = None,
                      broadcast_items: bool = False,
                      micro: int = 1_000_000) -> DataFrame:
    """Pairwise association rules over (basket, item) rows: for every
    unordered item pair {a, b} co-occurring in ``min_pair_count``+
    baskets, emit exact counts and the classic rule metrics —
    support P(a,b), confidence P(b|a) and P(a|b), and lift
    P(a,b)/(P(a)·P(b)) — all as integer micro-units.

    Duplicates collapse first (an item twice in one basket counts
    once — standard basket semantics). Plan shape: one distinct
    (shuffle on the pair), a self-equi-join ON the basket key (the
    pair space is Σ size² per basket — bounded by BASKET size, never
    corpus size), one pair count (shuffle), then two item-count joins
    (item vocabularies are small; AQE broadcasts them) and a 1-row
    basket-count broadcast. Skew guard: a pathological mega-basket
    explodes quadratically — ``max_basket_size`` raises at execution
    (distributed guard, F.when + raise_error) instead of silently
    stalling a join.

    Output: (item_a, item_b) with item_a < item_b, n_a, n_b, n_ab,
    n_baskets (all BIGINT), support_micro, conf_ab_micro,
    conf_ba_micro, lift_micro (BIGINT; value/1e6 ≈ the probability /
    ratio; lift_micro > 10⁶ means positive association).
    ``broadcast_items=True`` hashes the (item, count) table into the
    two metric joins — right whenever the item VOCABULARY (not the
    row count) fits an executor (brands/categories: yes; raw SKUs at
    catalog scale: measure first).
    """
    _maybe_b = F.broadcast if broadcast_items else (lambda x: x)
    b = (df.select(F.col(basket_col).alias("_bk"),
                   F.col(item_col).alias("_it"))
         .filter(F.col("_bk").isNotNull() & F.col("_it").isNotNull())
         .distinct())
    if max_basket_size is not None:
        # the guard must live on a RETAINED column or Catalyst prunes
        # the raise_error away with it — weave it into the item column
        sizes = b.groupBy("_bk").agg(F.count(F.lit(1)).alias("_sz"))
        guarded_item = F.when(
            F.col("_sz") > max_basket_size,
            F.raise_error(F.concat(
                F.lit(f"association_rules: basket exceeds "
                      f"max_basket_size={max_basket_size}: "),
                F.col("_bk").cast("string")))
        ).otherwise(F.col("_it"))
        b = (b.join(sizes, on="_bk")
             .select("_bk", guarded_item.alias("_it")))
    # b feeds FIVE downstream reads (basket count, item counts, both
    # self-join sides, the guard) — materialize once or every branch
    # re-scans and re-shuffles the full input (audited: 40 scans / 25
    # shuffles on the lazy form; the checkpoint collapses it to one)
    b = b.localCheckpoint(eager=True)
    n_baskets = b.select("_bk").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("n_baskets"))
    item_n = b.groupBy("_it").agg(
        F.count(F.lit(1)).cast("long").alias("_n"))
    b2 = b.select(F.col("_bk"), F.col("_it").alias("_it2"))
    pairs = (b.join(b2, on="_bk")
             .filter(F.col("_it") < F.col("_it2"))
             .groupBy(F.col("_it").alias("item_a"),
                      F.col("_it2").alias("item_b"))
             .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
             .filter(F.col("n_ab") >= min_pair_count))
    out = (pairs
           .join(_maybe_b(item_n.select(F.col("_it").alias("item_a"),
                                        F.col("_n").alias("n_a"))),
                 on="item_a")
           .join(_maybe_b(item_n.select(F.col("_it").alias("item_b"),
                                        F.col("_n").alias("n_b"))),
                 on="item_b")
           .crossJoin(F.broadcast(n_baskets)))
    m = int(micro)
    return out.select(
        "item_a", "item_b", "n_a", "n_b", "n_ab", "n_baskets",
        F.expr(f"CAST((n_ab * {m}) DIV n_baskets AS LONG)")
        .alias("support_micro"),
        F.expr(f"CAST((n_ab * {m}) DIV n_a AS LONG)")
        .alias("conf_ab_micro"),
        F.expr(f"CAST((n_ab * {m}) DIV n_b AS LONG)")
        .alias("conf_ba_micro"),
        # DECIMAL(38,0) cross-product: n_ab·N·10⁶ can pass 2⁶³ at
        # ~10¹⁰ baskets; the single floor division stays exact
        F.expr(f"CAST((CAST(n_ab AS DECIMAL(20,0)) * n_baskets * {m}) "
               f"DIV (CAST(n_a AS DECIMAL(20,0)) * n_b) AS LONG)")
        .alias("lift_micro"))
