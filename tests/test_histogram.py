from __future__ import annotations

import pytest

from chatbot_spark.operators.histogram import equi_depth_boundaries


def _bounds(spark, values, n, prefix_buckets=4):
    df = spark.createDataFrame([(v,) for v in values], "v long")
    return {
        r["i"]: (r["rank_target"], r["boundary"], r["cum_at_boundary"])
        for r in equi_depth_boundaries(
            df, "v", n, prefix_buckets=prefix_buckets
        ).collect()
    }


def _ref(values, n):
    s = sorted(values)
    out = {}
    for i in range(1, n):
        r = i * len(s) // n
        out[i] = s[r - 1]  # smallest value with cum >= r (1-based rank r)
    return out


def test_equi_depth_matches_sorted_reference(spark):
    import random

    rng = random.Random(7)
    values = [rng.randrange(100) for _ in range(500)]
    got = _bounds(spark, values, 8)
    ref = _ref(values, 8)
    assert {i: b for i, (_, b, _) in got.items()} == ref


def test_equi_depth_heavy_ties_single_value_spans_buckets(spark):
    # one value holds 90% of the mass: several target ranks land inside
    # its interval and it must be the boundary for each of them.
    values = [5] * 90 + [1] * 5 + [9] * 5
    got = _bounds(spark, values, 4)
    assert {i: b for i, (_, b, _) in got.items()} == _ref(values, 4)
    assert [got[i][1] for i in (1, 2, 3)] == [5, 5, 5]


def test_equi_depth_exact_ranks_and_cum(spark):
    values = list(range(1, 11))  # 10 distinct values, n=5 -> ranks 2,4,6,8
    got = _bounds(spark, values, 5)
    assert got == {1: (2, 2, 2), 2: (4, 4, 4), 3: (6, 6, 6), 4: (8, 8, 8)}


def test_equi_depth_rejects_one_bucket(spark):
    df = spark.createDataFrame([(1,)], "v long")
    with pytest.raises(ValueError):
        equi_depth_boundaries(df, "v", 1)


def test_equi_depth_fewer_rows_than_buckets_clamps_to_first_value(spark):
    """round-6 ADVICE: with N < n_buckets the raw rank i*N div n floors
    to 0 for small i and the interval join silently dropped those
    boundary rows; clamped to rank 1 every boundary now resolves to the
    smallest value instead of vanishing."""
    df = spark.createDataFrame([(10,), (20,)], "v long")  # N=2 < 4 buckets
    rows = {r["i"]: r for r in equi_depth_boundaries(df, "v", 4).collect()}
    assert set(rows) == {1, 2, 3}  # no silently-missing boundaries
    assert rows[1]["rank_target"] == 1 and rows[1]["boundary"] == 10
    assert rows[2]["rank_target"] == 1 and rows[2]["boundary"] == 10
    assert rows[3]["rank_target"] == 1 and rows[3]["boundary"] == 10
