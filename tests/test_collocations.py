from __future__ import annotations

from pyspark.sql import functions as F

from chatbot_spark.operators.collocations import pmi_collocations


def _run(spark, texts, min_pair=1, min_unigram=1):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    return {
        (r["w1"], r["w2"]): (r["c_xy"], r["pmi_ratio"])
        for r in pmi_collocations(
            df, "text", min_pair=min_pair, min_unigram=min_unigram
        ).collect()
    }


def test_pmi_matches_hand_computed_reference(spark):
    # corpus: 5 docs, 11 tokens, 6 bigrams; "new york" always adjacent
    texts = ["new york city", "new york state", "the city", "the state", "new"]
    got = _run(spark, texts)
    # counts: new=3 york=2 city=2 state=2 the=2; N=11 (one dangling "new")
    # bigrams: (new,york)x2 (york,city) (york,state) (the,city) (the,state); B=6
    n, b = 11.0, 6.0
    exp_ny = round(((2.0 * n) / b) * (n / (3.0 * 2.0)), 6)
    assert got[("new", "york")] == (2, exp_ny)
    # perfectly-associated pair scores above a spread-out one
    assert got[("new", "york")][1] > got[("the", "city")][1]


def test_pmi_support_floors_cut_rare_pairs(spark):
    texts = ["a b", "a b", "a b", "c d"]
    got = _run(spark, texts, min_pair=2, min_unigram=2)
    assert ("a", "b") in got and ("c", "d") not in got


def test_pmi_adjacency_not_cooccurrence(spark):
    # "x" and "z" share a doc but are never adjacent -> no pair row
    got = _run(spark, ["x y z"] * 3)
    assert ("x", "z") not in got
    assert ("x", "y") in got and ("y", "z") in got


def test_pmi_case_folding_and_whitespace(spark):
    got = _run(spark, ["New  YORK", "new york"])
    assert got[("new", "york")][0] == 2


def test_pmi_empty_and_single_token_docs_are_inert(spark):
    got = _run(spark, ["", "solo", "a b", "a b"])
    assert set(got) == {("a", "b")}
    # the dangling "solo" still counts into N (unigram mass), ratio reflects it
    n, b = 5.0, 2.0
    assert got[("a", "b")] == (2, round(((2.0 * n) / b) * (n / (2.0 * 2.0)), 6))
