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


def _basket_arrays(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    max_basket_items: int | None,
) -> DataFrame:
    """(basket, items) with ``items`` the basket's SORTED distinct item
    array — ONE grouped pass (collect_set partially aggregates map-side,
    so dedup happens before the exchange; the r13-era plan paid a
    distinct shuffle + a row_number window + per-pair self-joins for the
    same information).

    Mega-basket guard: ``max_basket_items`` keeps each basket's smallest
    items (array slice over the sorted set — same deterministic
    keep-smallest as the old row_number cap), so a pathological basket
    holding 10^5 items emits C(cap,2) pairs instead of 5·10^9. None
    disables. Applied after dedup so multiplicity never affects which
    items survive."""
    arr = (
        baskets.select(
            F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
        )
        .filter(F.col("item").isNotNull() & F.col("basket").isNotNull())
        .groupBy("basket")
        .agg(F.sort_array(F.collect_set("item")).alias("items"))
    )
    if max_basket_items is not None:
        arr = arr.select(
            "basket", F.slice("items", 1, int(max_basket_items)).alias("items")
        )
    return arr


def _pair_combos(items) -> F.Column:
    """array<struct(item_a, item_b)> of all a < b combinations of a
    SORTED distinct array — the within-basket pair generator as a codegen
    expression (streams straight into the partially-aggregated pair
    count; no self-join, no shuffle of candidate rows)."""
    return F.flatten(
        F.transform(
            items,
            lambda x, i: F.transform(
                F.slice(items, i + 2, F.greatest(F.size(items) - i - 1, F.lit(0))),
                lambda y: F.struct(x.alias("item_a"), y.alias("item_b")),
            ),
        )
    )


def _triple_combos(items) -> F.Column:
    """array<struct(a, b, c)> of all a < b < c combinations of a SORTED
    distinct array (see _pair_combos)."""
    return F.flatten(
        F.transform(
            items,
            lambda x, i: F.flatten(
                F.transform(
                    F.slice(
                        items, i + 2, F.greatest(F.size(items) - i - 1, F.lit(0))
                    ),
                    lambda y, j: F.transform(
                        F.slice(
                            items,
                            i + j + 3,
                            F.greatest(F.size(items) - i - j - 2, F.lit(0)),
                        ),
                        lambda z: F.struct(
                            x.alias("a"), y.alias("b"), z.alias("c")
                        ),
                    ),
                )
            ),
        )
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
    bit-identical across engines.

    Plan (r14, guide §2.3/§2.4 — one grouped pass, no self-join): per
    basket a SORTED distinct item array (collect_set partially
    aggregates map-side), then the C(k,2) combination explode streams
    straight into the partially-aggregated pair count — the only big
    exchange is the basket grouping, and the pair exchange carries at
    most the distinct pairs present per map partition, never candidate
    rows. The a-priori item prune is enforced by the INNER joins onto
    the support-filtered item counts (a pair with an infrequent member
    never survives them — same output set as pruning before
    generation, without staging a pruned copy of the corpus through a
    second shuffle). The r13-era plan paid: distinct shuffle +
    row_number cap window + basket-keyed self-join + a separate
    distinct-basket count job.
    """
    arr = _basket_arrays(baskets, basket_col, item_col, max_basket_items).persist()
    item_counts = (
        arr.select(F.explode("items").alias("item"))
        .groupBy("item")
        .agg(F.count("*").cast("long").alias("item_count"))
        .filter(F.col("item_count") >= int(min_item_support))
        .persist()
    )
    n_baskets = arr.count()

    pairs = (
        arr.select(F.explode(_pair_combos(F.col("items"))).alias("p"))
        .select("p.item_a", "p.item_b")
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
    arr.unpersist()
    return out


def frequent_triples(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    max_basket_items: int | None = None,
) -> DataFrame:
    """Frequent TRIPLES in one grouped pass (r14, guide §2.3/§2.4): per
    basket a sorted distinct item array, then the C(k,3) combination
    explode streams straight into a partially-aggregated count — the
    exchange carries at most the distinct triples present per map
    partition, never candidate rows, so the r13 level-wise plan's three
    basket-keyed joins and both candidate exchanges are gone. The
    a-priori downward-closure prune those semi-joins implemented is
    subsumed by the final support filter (a triple whose sub-pair is
    infrequent can never reach min_support — the same equality argument
    the oracle's naive HAVING form rests on); the mega-basket cap is the
    remaining guard against C(k,3) per-row work. Exact BIGINT counts."""
    arr = _basket_arrays(baskets, basket_col, item_col, max_basket_items)
    out = (
        arr.select(F.explode(_triple_combos(F.col("items"))).alias("t"))
        .select("t.a", "t.b", "t.c")
        .groupBy("a", "b", "c")
        .agg(F.count("*").cast("long").alias("triple_count"))
        .filter(F.col("triple_count") >= int(min_support))
        .select(
            F.col("a").alias("item_a"),
            F.col("b").alias("item_b"),
            F.col("c").alias("item_c"),
            "triple_count",
        )
    )
    return out
