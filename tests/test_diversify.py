"""MMR rerank and greedy k-center coreset (operators/diversify.py).

The workload oracles already replay both greedy loops bit-for-bit in SQL;
these tests pin the algorithmic invariants on hand-built geometry where
the right answer is obvious, plus the pool-edge cases (single candidate,
k larger than the pool) the 500-vector workload can't hit.
"""

from __future__ import annotations

import pytest

from chatbot_spark.operators.diversify import k_center_select, mmr_select


def _vec_df(spark, rows, pool_col="query_id", id_col="neighbor_id", rel=None):
    if rel is None:
        data = [(p, i, [float(x) for x in v]) for p, i, v in rows]
        return spark.createDataFrame(
            data, f"{pool_col} long, {id_col} long, embedding array<double>"
        )
    data = [(p, i, [float(x) for x in v], float(r)) for (p, i, v), r in zip(rows, rel)]
    return spark.createDataFrame(
        data, f"{pool_col} long, {id_col} long, embedding array<double>, rel double"
    )


def test_mmr_first_pick_is_relevance_argmax_and_diversity_kicks_in(spark):
    # two tight clusters on the axes; relevance favors cluster A slightly.
    # Pure relevance would pick A1, A2 first; MMR must interleave B after A.
    rows = [
        (1, 10, [1.0, 0.0]),   # A1
        (1, 11, [0.999, 0.01]),  # A2 near-duplicate of A1
        (1, 20, [0.0, 1.0]),   # B, orthogonal
    ]
    # hand check: step 2 scores A2 = 0.7*0.94 - 0.3*cos(A2,A1 ≈ 1) ≈ 0.358,
    # B = 0.7*0.60 - 0.3*0 = 0.42 → B wins despite much lower relevance
    df = _vec_df(spark, rows, rel=[0.95, 0.94, 0.60])
    got = mmr_select(df, k=3, lam=0.7).orderBy("rank").collect()
    assert [r["neighbor_id"] for r in got] == [10, 20, 11]
    assert got[0]["mmr_score"] == pytest.approx(0.7 * 0.95)
    assert got[1]["rel"] == pytest.approx(0.60)


def test_mmr_single_candidate_pool_and_k_overshoot(spark):
    df = _vec_df(spark, [(7, 1, [1.0, 0.0])], rel=[0.3])
    got = mmr_select(df, k=5, lam=0.7).collect()
    assert len(got) == 1
    assert (got[0]["rank"], got[0]["neighbor_id"]) == (1, 1)


def test_mmr_tie_breaks_on_ascending_id(spark):
    # identical vectors and relevance → every step ties → ids ascend
    rows = [(1, i, [1.0, 0.0]) for i in (5, 3, 9)]
    df = _vec_df(spark, rows, rel=[0.5, 0.5, 0.5])
    got = mmr_select(df, k=3, lam=0.7).orderBy("rank").collect()
    assert [r["neighbor_id"] for r in got] == [3, 5, 9]


def test_kcenter_farthest_first_on_a_line(spark):
    # points at x = 0, 1, 10: seed = smallest id (x=0), then the far end
    # (x=10, radius 10), then the middle (radius 1 — its min-dist to {0,10})
    rows = [(1, 0, [0.0]), (1, 1, [1.0]), (1, 2, [10.0])]
    df = _vec_df(spark, rows, pool_col="label", id_col="vec_id")
    got = k_center_select(df, k=3, pool_col="label", id_col="vec_id").orderBy(
        "rank"
    ).collect()
    assert [r["vec_id"] for r in got] == [0, 2, 1]
    assert got[0]["radius"] == 0.0
    assert got[1]["radius"] == pytest.approx(10.0)
    assert got[2]["radius"] == pytest.approx(1.0)
    # coverage radii never increase after the seed
    assert got[1]["radius"] >= got[2]["radius"]


def test_kcenter_pool_smaller_than_k_and_multiple_pools(spark):
    rows = [
        (1, 0, [0.0]), (1, 1, [4.0]),          # pool 1: only 2 points
        (2, 10, [0.0]), (2, 11, [1.0]), (2, 12, [5.0]),
    ]
    df = _vec_df(spark, rows, pool_col="label", id_col="vec_id")
    got = k_center_select(df, k=3, pool_col="label", id_col="vec_id")
    by_pool = {}
    for r in got.collect():
        by_pool.setdefault(r["label"], []).append((r["rank"], r["vec_id"]))
    assert sorted(by_pool[1]) == [(1, 0), (2, 1)]
    assert sorted(by_pool[2]) == [(1, 10), (2, 12), (3, 11)]
