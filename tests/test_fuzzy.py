"""Deletion-neighborhood (SymSpell) fuzzy matching: completeness vs
brute-force levenshtein, edge cases, and the no-nested-loop-join plan
guarantee that motivated the operator (VERDICT r2 "What's wrong" #1)."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _brute_pairs(spark, df, id_col, text_col, k):
    a = df.select(F.col(id_col).alias("id_a"), F.col(text_col).alias("ta"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(text_col).alias("tb"))
    return {
        (r.id_a, r.id_b, r.dist)
        for r in (
            a.crossJoin(b)
            .filter(F.col("id_a") < F.col("id_b"))
            .withColumn("dist", F.levenshtein("ta", "tb"))
            .filter(F.col("dist") <= k)
            .collect()
        )
    }


@pytest.mark.parametrize("k", [1, 2])
def test_fuzzy_pairs_equals_bruteforce(spark, k):
    from chatbot_spark.operators.fuzzy import fuzzy_pairs

    rows = [
        (1, "kathleen"),
        (2, "kathlen"),      # dist 1 to kathleen
        (3, "cathleen"),     # dist 1 to kathleen, 2 to kathlen
        (4, "katzleen"),     # dist 1 to kathleen (substitution)
        (5, "catzleen"),     # dist 2 to kathleen
        (6, "zzzzzz"),
        (7, ""),             # empty string edge
        (8, "a"),            # single char: dist 1 to ""
        (9, "ab"),           # dist 2 to "", 1 to "a"
        (10, "kathleen"),    # exact dup: dist 0
    ]
    df = spark.createDataFrame(rows, ["id", "name"])
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in fuzzy_pairs(df, "id", "name", max_dist=k).collect()
    }
    assert got == _brute_pairs(spark, df, "id", "name", k)


def test_fuzzy_pairs_supplier_matches_bruteforce(spark, sf_dir):
    from chatbot_spark.io.tables import load_table
    from chatbot_spark.operators.fuzzy import fuzzy_pairs

    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in fuzzy_pairs(s, "s_suppkey", "s_name", max_dist=2).collect()
    }
    assert got == _brute_pairs(spark, s, "s_suppkey", "s_name", 2)


def test_fuzzy_pairs_plan_has_no_nested_loop(spark, sf_dir):
    """The whole point: the candidate join must be an equi-join
    (SortMergeJoin/BroadcastHashJoin on the variant key), never a
    BroadcastNestedLoopJoin enumerating all pairs."""
    from chatbot_spark.io.tables import load_table
    from chatbot_spark.operators.fuzzy import fuzzy_pairs

    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    out = fuzzy_pairs(s, "s_suppkey", "s_name", max_dist=2)
    out.collect()  # let AQE finalize
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_fuzzy_pairs_duplicate_storm_equals_bruteforce(spark):
    """Duplicate-storm guard: with 10 identical copies of every name, the
    collapsed pipeline (unique-string candidate generation + pair
    expansion + intra-group distance-0 pairs) must still produce the
    exact brute-force pair set — including the k² intra-copy pairs."""
    from chatbot_spark.operators.fuzzy import fuzzy_pairs

    base = ["kathleen", "kathlen", "cathleen", "zzzzzz"]
    rows = [(100 * b + c, name) for b, name in enumerate(base) for c in range(10)]
    df = spark.createDataFrame(rows, ["id", "name"])
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in fuzzy_pairs(df, "id", "name", max_dist=2).collect()
    }
    assert got == _brute_pairs(spark, df, "id", "name", 2)


def test_fuzzy_pairs_rejects_unsupported_k(spark):
    from chatbot_spark.operators.fuzzy import fuzzy_pairs

    df = spark.createDataFrame([(1, "x")], ["id", "name"])
    with pytest.raises(ValueError):
        fuzzy_pairs(df, "id", "name", max_dist=3).collect()
