from __future__ import annotations

from itertools import combinations

from chatbot_spark.operators.basket import frequent_pairs


def _ref_pairs(baskets, min_item, min_pair, scale=10**6):
    by_basket = {}
    for b, i in baskets:
        by_basket.setdefault(b, set()).add(i)
    n = len(by_basket)
    ic = {}
    for items in by_basket.values():
        for i in items:
            ic[i] = ic.get(i, 0) + 1
    keep = {i for i, c in ic.items() if c >= min_item}
    pc = {}
    for items in by_basket.values():
        for a, b in combinations(sorted(items & keep), 2):
            pc[(a, b)] = pc.get((a, b), 0) + 1
    out = {}
    for (a, b), c in pc.items():
        if c >= min_pair:
            out[(a, b)] = (
                c,
                c * scale // ic[a],
                c * scale // ic[b],
                c * scale * n // (ic[a] * ic[b]),
            )
    return out


def test_frequent_pairs_matches_serial_reference(spark):
    baskets = [
        (1, "a"), (1, "b"), (1, "c"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "b"), (3, "d"),
        (4, "a"), (4, "c"),
        (5, "b"), (5, "c"), (5, "c"),  # dup item collapses
        (6, "d"),
    ]
    df = spark.createDataFrame(baskets, "basket long, item string")
    got = {
        (r["item_a"], r["item_b"]): (
            r["pair_count"], r["conf_ab_ppm"], r["conf_ba_ppm"], r["lift_ppm"]
        )
        for r in frequent_pairs(
            df, "basket", "item", min_item_support=2, min_pair_support=2
        ).collect()
    }
    assert got == _ref_pairs(baskets, 2, 2)
    # spot value: (a,b) in baskets 1,2,3 of 6; ca=4, cb=4
    assert got[("a", "b")] == (3, 750000, 750000, 3 * 10**6 * 6 // 16)


def test_frequent_pairs_apriori_prune_blocks_rare_items(spark):
    # 'z' appears once -> pruned even though (a,z) co-occurs twice...
    # impossible by apriori; construct (y) support 1 with pair support 1.
    baskets = [(1, "a"), (1, "y"), (2, "a"), (3, "a")]
    df = spark.createDataFrame(baskets, "basket long, item string")
    rows = frequent_pairs(
        df, "basket", "item", min_item_support=2, min_pair_support=1
    ).collect()
    assert rows == []  # the only pair involves pruned 'y'


def test_frequent_pairs_min_pair_support_filters(spark):
    baskets = [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (3, "c")]
    df = spark.createDataFrame(baskets, "basket long, item string")
    got = frequent_pairs(
        df, "basket", "item", min_item_support=1, min_pair_support=2
    ).collect()
    assert [(r["item_a"], r["item_b"], r["pair_count"]) for r in got] == [
        ("a", "b", 2)
    ]


def test_frequent_pairs_empty_and_null_inputs(spark):
    empty = spark.createDataFrame([], "basket long, item string")
    assert frequent_pairs(empty, "basket", "item").count() == 0
    nulls = spark.createDataFrame(
        [(1, None), (None, "a"), (2, "b")], "basket long, item string"
    )
    # null basket/item rows are dropped; a single (2,b) yields no pairs
    assert frequent_pairs(nulls, "basket", "item", 1, 1).count() == 0


def test_frequent_triples_matches_serial_reference(spark):
    from chatbot_spark.operators.basket import frequent_triples

    baskets = [
        (1, "a"), (1, "b"), (1, "c"), (1, "d"),
        (2, "a"), (2, "b"), (2, "c"),
        (3, "a"), (3, "b"), (3, "d"),
        (4, "a"), (4, "c"), (4, "d"),
        (5, "b"), (5, "c"), (5, "d"),
    ]
    df = spark.createDataFrame(baskets, "basket long, item string")
    got = {
        (r["item_a"], r["item_b"], r["item_c"]): r["triple_count"]
        for r in frequent_triples(df, "basket", "item", min_support=2).collect()
    }
    # serial reference: count all triples, keep >= 2
    by_basket = {}
    for bk, i in baskets:
        by_basket.setdefault(bk, set()).add(i)
    ref = {}
    for items in by_basket.values():
        s = sorted(items)
        for x in range(len(s)):
            for y in range(x + 1, len(s)):
                for z in range(y + 1, len(s)):
                    k = (s[x], s[y], s[z])
                    ref[k] = ref.get(k, 0) + 1
    ref = {k: v for k, v in ref.items() if v >= 2}
    assert got == ref
    assert got[("a", "b", "c")] == 2  # baskets 1 and 2


def test_mega_basket_cap_is_deterministic(spark):
    from chatbot_spark.operators.basket import frequent_pairs, frequent_triples

    # basket 1 holds 30 items; cap keeps the 5 smallest, so the only
    # surviving pairs are among i00..i04 (with basket 2 providing support)
    rows = [(1, f"i{j:02d}") for j in range(30)] + [
        (2, f"i{j:02d}") for j in range(5)
    ]
    df = spark.createDataFrame(rows, "basket long, item string")
    got = frequent_pairs(
        df, "basket", "item", min_item_support=1, min_pair_support=2,
        max_basket_items=5,
    ).collect()
    pairs = {(r["item_a"], r["item_b"]) for r in got}
    assert pairs == {
        (f"i{a:02d}", f"i{b:02d}") for a in range(5) for b in range(a + 1, 5)
    }
    trip = frequent_triples(
        df, "basket", "item", min_support=2, max_basket_items=5
    ).collect()
    assert len(trip) == 10  # C(5,3)
