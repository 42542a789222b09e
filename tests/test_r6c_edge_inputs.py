"""Empty- and degenerate-input robustness for the r6c operator family —
the same discipline as the graph/basket edge suite: operators must
return empty/identity results, never throw, when fed empty frames or
inputs with no matches."""

from __future__ import annotations

from pyspark.sql import functions as F

from chatbot_spark.operators.diversify import k_center_select, mmr_select
from chatbot_spark.operators.graph import lpa_communities
from chatbot_spark.operators.lexical import bm25_rm3_topk
from chatbot_spark.operators.privacy import k_anonymity_report
from chatbot_spark.operators.quality import audit_table
from chatbot_spark.operators.timeseries import groupwise_ols


def test_mmr_and_kcenter_empty_candidates(spark):
    empty = spark.createDataFrame(
        [], "query_id long, neighbor_id long, embedding array<double>, rel double"
    )
    assert mmr_select(empty, k=5).count() == 0
    empty_p = spark.createDataFrame(
        [], "label long, vec_id long, embedding array<double>"
    )
    assert k_center_select(empty_p, k=3, pool_col="label", id_col="vec_id").count() == 0


def test_rm3_query_with_no_matching_terms(spark):
    corpus = spark.createDataFrame(
        [(0, "alpha beta"), (1, "beta gamma")], "doc_id long, text string"
    )
    q = spark.createDataFrame(
        [(9, "zzz qqq")], "query_id long, query_text string"
    )
    assert bm25_rm3_topk(q, corpus, k=5, n_fb=2, m_terms=3).count() == 0


def test_ols_empty_input(spark):
    empty = spark.createDataFrame([], "g string, x long, y long")
    assert groupwise_ols(empty, ["g"], "x", "y").count() == 0


def test_audits_on_empty_tables(spark):
    empty = spark.createDataFrame([], "id long, status string")
    rows = audit_table(empty, completeness=["id"], unique=["id"]).collect()
    assert all(r["n_rows"] == 0 and r["n_violations"] == 0 and r["passed"] == 1
               for r in rows)
    empty_c = spark.createDataFrame([], "region string, band int, seg string")
    rep = k_anonymity_report(empty_c, ["region", "band"], "seg").collect()[0]
    assert rep["n_classes"] == 0 and rep["n_rows"] == 0
    # min over zero classes is NULL — acceptable "nothing to report" shape
    assert rep["min_class_size"] is None


def test_lpa_empty_and_selfloop_only_graphs(spark):
    empty = spark.createDataFrame([], "src long, dst long")
    assert lpa_communities(empty, rounds=2).count() == 0
    loops = spark.createDataFrame([(4, 4)], "src long, dst long")
    assert lpa_communities(loops, rounds=2).count() == 0  # self-loops dropped
