from __future__ import annotations

from chatbot_spark.operators.evalmetrics import ranking_metrics


def _mk(spark, sys_rows, truth_rows):
    s = spark.createDataFrame(sys_rows, "query_id long, neighbor_id long, rank long")
    t = spark.createDataFrame(truth_rows, "query_id long, neighbor_id long")
    return ranking_metrics(s, t)


def test_perfect_ranking_scores_full_marks(spark):
    sys_rows = [(1, d, r) for r, d in enumerate([10, 20, 30], 1)]
    truth = [(1, 10), (1, 20), (1, 30)]
    got = _mk(spark, sys_rows, truth).collect()[0]
    assert got["n_hits"] == 3
    assert got["ap_ppm"] == 10**6  # (1/1 + 2/2 + 3/3) / 3
    assert got["mrr_ppm"] == 10**6
    assert got["p_at_k_ppm"] == 10**6


def test_partial_hits_exact_integer_algebra(spark):
    # system: ranks 1..4 = [miss, hit, miss, hit]; truth has 2 relevant
    sys_rows = [(1, 99, 1), (1, 10, 2), (1, 98, 3), (1, 20, 4)]
    truth = [(1, 10), (1, 20)]
    got = _mk(spark, sys_rows, truth).collect()[0]
    # precision at hit ranks: 1/2 -> 500000, 2/4 -> 500000; AP = 1000000 div 2
    assert got["n_hits"] == 2
    assert got["ap_ppm"] == 500000
    assert got["mrr_ppm"] == 500000  # first hit at rank 2
    assert got["p_at_k_ppm"] == 500000  # 2 of 4


def test_no_hits_zero_mrr_and_ap(spark):
    sys_rows = [(1, 99, 1), (1, 98, 2)]
    truth = [(1, 10)]
    got = _mk(spark, sys_rows, truth).collect()[0]
    assert got["n_hits"] == 0 and got["ap_ppm"] == 0
    assert got["mrr_ppm"] == 0 and got["p_at_k_ppm"] == 0


def test_queries_absent_from_truth_dropped(spark):
    sys_rows = [(1, 10, 1), (2, 10, 1)]
    truth = [(1, 10)]
    rows = _mk(spark, sys_rows, truth).collect()
    assert [r["query_id"] for r in rows] == [1]


def test_floor_division_not_rounding(spark):
    # 1 hit at rank 3 of 3 returned, 1 relevant: AP = 333333 (floor), not 333334
    sys_rows = [(1, 99, 1), (1, 98, 2), (1, 10, 3)]
    truth = [(1, 10)]
    got = _mk(spark, sys_rows, truth).collect()[0]
    assert got["ap_ppm"] == 333333
    assert got["mrr_ppm"] == 333333
    assert got["p_at_k_ppm"] == 333333


def test_ndcg_perfect_and_partial(spark):
    from chatbot_spark.operators.evalmetrics import ndcg_gain_ppm, ranking_metrics

    # perfect: hits at ranks 1..3, n_rel=3, k=3 -> ndcg = 1e6
    s = spark.createDataFrame(
        [(1, d, r) for r, d in enumerate([10, 20, 30], 1)],
        "query_id long, neighbor_id long, rank long",
    )
    t = spark.createDataFrame(
        [(1, 10), (1, 20), (1, 30)], "query_id long, neighbor_id long"
    )
    got = ranking_metrics(s, t, ndcg_k=3).collect()[0]
    assert got["ndcg_ppm"] == 10**6

    # single relevant doc at rank 3 of k=3: dcg = g(3), idcg = g(1)
    s2 = spark.createDataFrame(
        [(1, 99, 1), (1, 98, 2), (1, 10, 3)],
        "query_id long, neighbor_id long, rank long",
    )
    t2 = spark.createDataFrame([(1, 10)], "query_id long, neighbor_id long")
    got2 = ranking_metrics(s2, t2, ndcg_k=3).collect()[0]
    assert got2["ndcg_ppm"] == ndcg_gain_ppm(3) * 10**6 // ndcg_gain_ppm(1)


def test_truth_only_query_scores_zero_not_dropped(spark):
    """round-6 ADVICE: a query present in truth but absent from system
    (the retriever returned nothing) must emit an all-zero row so
    macro-averages penalize it, instead of disappearing from the output."""
    s = spark.createDataFrame(
        [(1, 100, 1), (1, 101, 2)], "query_id long, neighbor_id long, rank long"
    )
    t = spark.createDataFrame(
        [(1, 100), (2, 200), (2, 201)], "query_id long, neighbor_id long"
    )
    rows = {r["query_id"]: r for r in ranking_metrics(s, t, ndcg_k=3).collect()}
    assert set(rows) == {1, 2}
    z = rows[2]
    assert (z["n_hits"], z["ap_ppm"], z["mrr_ppm"], z["p_at_k_ppm"], z["ndcg_ppm"]) == (
        0, 0, 0, 0, 0
    )
    assert rows[1]["n_hits"] == 1  # answered query unchanged
