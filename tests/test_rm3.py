"""RM3 pseudo-relevance feedback (operators/lexical.py::bm25_rm3_topk).

The workload oracle replays the whole two-pass pipeline bit-for-bit;
these tests pin the retrieval semantics on a tiny corpus where the
expansion effect is observable by construction.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from chatbot_spark.operators.lexical import bm25_rm3_topk, bm25_topk


def _corpus(spark):
    # "apple banana" co-occur heavily; doc 5 never mentions apple but is
    # saturated with banana — feedback expansion should pull it up for an
    # apple-only query.
    rows = [
        (0, "apple apple banana"),
        (1, "apple banana banana"),
        (2, "apple fruit market"),
        (3, "car engine wheel"),
        (4, "engine wheel brake"),
        (5, "banana banana banana smoothie"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_rm3_expansion_promotes_cooccurring_terms(spark):
    corpus = _corpus(spark)
    q = spark.createDataFrame([(100, "apple")], "query_id long, query_text string")
    plain = {
        r["neighbor_id"]: r["rank"]
        for r in bm25_topk(q, corpus, k=6, idf_mode="rational").collect()
    }
    rm3 = {
        r["neighbor_id"]: r["rank"]
        for r in bm25_rm3_topk(q, corpus, k=6, n_fb=3, m_terms=5, alpha=0.5).collect()
    }
    # plain BM25 cannot see doc 5 at all ("apple" absent)
    assert 5 not in plain
    # RM3's relevance model learns "banana" from the feedback docs → doc 5
    # enters the result set
    assert 5 in rm3
    # the car/engine cluster stays out of an apple query under both
    assert 3 not in rm3 and 4 not in rm3


def test_rm3_ranks_are_dense_and_scores_descend(spark):
    corpus = _corpus(spark)
    q = spark.createDataFrame(
        [(1, "apple banana"), (2, "engine brake")], "query_id long, query_text string"
    )
    got = bm25_rm3_topk(q, corpus, k=10, n_fb=2, m_terms=4, alpha=0.5)
    rows = got.orderBy("query_id", "rank").collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rs in by_q.items():
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        scores = [r["score"] for r in rs]
        assert scores == sorted(scores, reverse=True)


def test_rm3_alpha_one_keeps_original_query_ordering(spark):
    """alpha=1 zeroes the expansion leg; ordering must match plain BM25
    (scores differ by the qtf/|q| weighting, a per-query positive scale
    when query terms are distinct — ordering is preserved)."""
    corpus = _corpus(spark)
    q = spark.createDataFrame([(7, "apple fruit")], "query_id long, query_text string")
    plain = [
        r["neighbor_id"]
        for r in bm25_topk(q, corpus, k=6, idf_mode="rational")
        .orderBy("rank")
        .collect()
    ]
    rm3 = [
        r["neighbor_id"]
        for r in bm25_rm3_topk(q, corpus, k=6, n_fb=3, m_terms=5, alpha=1.0)
        .orderBy("rank")
        .collect()
    ]
    assert rm3 == plain
