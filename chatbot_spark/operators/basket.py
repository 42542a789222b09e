"""Market-basket association mining (beyond-reference §2.J scope).

Co-occurrence mining is a standard curation signal at training-data
scale — "which sources / templates / boilerplate shingles co-occur in
the same page" is the same computation as retail basket analysis. The
reference has no co-occurrence operator (its only pairwise machinery is
vector distance, src/tools/load.py), so this is engine work: the
a-priori frequent-pair algorithm expressed as three DataFrame
aggregations and one within-basket self-join.

Scale shape (100 TB): the naive pair generator is quadratic per basket
and unbounded across baskets. This operator is the textbook pruned
version:

 * **Item-support prune first** (the a-priori property: a pair can only
   be frequent if both items are). The self-join input drops to
   frequent items only — at web scale this removes the long tail, which
   is most of the volume, BEFORE any pair is materialized.
 * The pair generator is a self-equi-join on the basket id — shuffle on
   basket, pairs emitted stream-wise by the join, never collected. A
   basket holding k frequent items emits C(k,2) pairs; pathological
   mega-baskets are capped by ``max_basket_items`` (deterministic
   keep-smallest — the same guard class as dedup.py's duplicate-storm
   collapse).
 * Confidence and lift are emitted in exact integer parts-per-million
   (BIGINT `div`), so the result is bit-reproducible on any engine and
   any partitioning. Headroom precondition: ppm_scale * pair_count *
   n_baskets must stay inside BIGINT (~9.2e18) — at extreme scale use a
   smaller ppm_scale or pre-divide counts; the operator asserts nothing
   silently overflows by construction only when counts fit.

Every quantity is an exact integer count or an integer-division ratio —
the DuckDB oracle replays the same algebra and must agree hash-for-hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["frequent_pairs", "frequent_triples"]


def _capped(b: DataFrame, max_basket_items: int | None) -> DataFrame:
    """Mega-basket guard: keep each basket's ``max_basket_items``
    smallest items (deterministic order — items are comparable), so a
    pathological basket holding 10^5 items emits C(cap,2) pairs instead
    of 5·10^9. The same guard class as dedup.py's duplicate-storm
    collapse; None disables. Applied AFTER dedup so multiplicity never
    affects which items survive."""
    if max_basket_items is None:
        return b
    from pyspark.sql import Window

    w = Window.partitionBy("basket").orderBy("item")
    return (
        b.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= int(max_basket_items))
        .drop("__rn")
    )


def frequent_pairs(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_item_support: int = 2,
    min_pair_support: int = 2,
    ppm_scale: int = 10**6,
    max_basket_items: int | None = None,
) -> DataFrame:
    """A-priori frequent item pairs with exact-integer confidence/lift.

    ``baskets`` is any (basket, item) relation; duplicates are collapsed
    (presence, not multiplicity — the standard basket model). Returns one
    row per unordered frequent pair (item_a < item_b) with:

      pair_count                 baskets containing both items
      conf_ab_ppm / conf_ba_ppm  ppm_scale * pair div count(a|b)
      lift_ppm                   ppm_scale * pair * n_baskets div (ca*cb)

    all BIGINT, all exact (integer floor division), so the output is
    bit-identical across engines. Plan: one distinct (shuffle on
    basket,item), one item-count agg (map-side combinable), the pruned
    self-join on basket (shuffle on basket), one pair-count agg, then two
    broadcast joins to attach item counts and a broadcast of the 1-row
    basket total — no driver-side state.
    """
    # b is referenced by the item-count agg, the basket total, and both
    # sides of the pair self-join; item_counts by the prune and the two
    # count-attach joins. Unpersisted, the lazy plan re-derives the
    # distinct over the source for every reference (measured 6 source
    # scans at sf0.01) — persisting both caps the source at ONE scan.
    b = (
        baskets.select(
            F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
        )
        .filter(F.col("item").isNotNull() & F.col("basket").isNotNull())
        .distinct()
    )
    b = _capped(b, max_basket_items).persist()
    # a-priori prune: only items frequent on their own can appear in a
    # frequent pair — shrinks the self-join input before pairs exist.
    item_counts = (
        b.groupBy("item")
        .agg(F.count("*").cast("long").alias("item_count"))
        .filter(F.col("item_count") >= int(min_item_support))
        .persist()
    )
    frequent = b.join(F.broadcast(item_counts.select("item")), "item")
    n_baskets = b.select("basket").distinct().count()

    left = frequent.select("basket", F.col("item").alias("item_a"))
    right = frequent.select("basket", F.col("item").alias("item_b"))
    pairs = (
        left.join(right, "basket")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").cast("long").alias("pair_count"))
        .filter(F.col("pair_count") >= int(min_pair_support))
    )
    ca = item_counts.select(
        F.col("item").alias("item_a"), F.col("item_count").alias("count_a")
    )
    cb = item_counts.select(
        F.col("item").alias("item_b"), F.col("item_count").alias("count_b")
    )
    scale = int(ppm_scale)
    out = (
        pairs.join(F.broadcast(ca), "item_a")
        .join(F.broadcast(cb), "item_b")
        .select(
            "item_a",
            "item_b",
            "pair_count",
            F.expr(f"pair_count * {scale} div count_a").alias("conf_ab_ppm"),
            F.expr(f"pair_count * {scale} div count_b").alias("conf_ba_ppm"),
            F.expr(
                f"pair_count * {scale} * {int(n_baskets)} div (count_a * count_b)"
            ).alias("lift_ppm"),
        )
    )
    # Materialize the (small) pair table now so the two staging caches can
    # be released without the caller's later action re-deriving them.
    out = out.localCheckpoint(eager=True)
    item_counts.unpersist()
    b.unpersist()
    return out


def frequent_triples(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    max_basket_items: int | None = None,
) -> DataFrame:
    """Level-wise a-priori frequent TRIPLES: candidates are generated
    from the frequent-PAIR lattice (a triple can only be frequent if all
    three sub-pairs are — the downward-closure property), so the cubic
    within-basket join never materializes a candidate whose sub-pairs
    already failed support. Plan: basket-pair rows semi-join the
    broadcast frequent-pair set BEFORE the third item attaches, and the
    (a,c)/(b,c) sub-pairs are semi-checked broadcast-side too — the
    wide exchange carries only pair-supported candidates. Exact BIGINT
    counts; the oracle counts triples the naive HAVING way (equal by
    downward closure)."""
    b = (
        baskets.select(
            F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
        )
        .filter(F.col("item").isNotNull() & F.col("basket").isNotNull())
        .distinct()
    )
    b = _capped(b, max_basket_items).persist()
    left = b.select("basket", F.col("item").alias("a"))
    right = b.select("basket", F.col("item").alias("b"))
    pair_rows = left.join(right, "basket").filter(F.col("a") < F.col("b"))
    fp = (
        pair_rows.groupBy("a", "b")
        .agg(F.count("*").cast("long").alias("pc"))
        .filter(F.col("pc") >= int(min_support))
        .select("a", "b")
        .persist()
    )
    # candidate (basket, a, b) restricted to frequent pairs, then attach c
    bp = pair_rows.join(F.broadcast(fp), ["a", "b"], "left_semi")
    third = b.select("basket", F.col("item").alias("c"))
    cand = (
        bp.join(third, "basket")
        .filter(F.col("b") < F.col("c"))
        .join(
            F.broadcast(fp.select(F.col("a"), F.col("b").alias("c"))),
            ["a", "c"],
            "left_semi",
        )
        .join(
            F.broadcast(fp.select(F.col("a").alias("b"), F.col("b").alias("c"))),
            ["b", "c"],
            "left_semi",
        )
    )
    out = (
        cand.groupBy("a", "b", "c")
        .agg(F.count("*").cast("long").alias("triple_count"))
        .filter(F.col("triple_count") >= int(min_support))
        .select(
            F.col("a").alias("item_a"),
            F.col("b").alias("item_b"),
            F.col("c").alias("item_c"),
            "triple_count",
        )
    )
    out = out.localCheckpoint(eager=True)
    fp.unpersist()
    b.unpersist()
    return out
