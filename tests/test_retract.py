"""Signed-multiplicity aggregate maintenance
(operators/ivm.py::retractable_rollup): corrections must move aggregates
down as well as up, net counts must survive retract/reissue pairs, and
the retraction audit count must see every negative multiplicity."""

from __future__ import annotations

import pytest

from chatbot_spark.operators.ivm import retractable_rollup


def test_correction_replaces_value_and_keeps_count(spark):
    b1 = spark.createDataFrame(
        [("a", 1, 100), ("a", 1, 50), ("b", 1, 10)], "g string, mult int, v long"
    )
    # correct the 100 down to 80: retract + reissue
    b2 = spark.createDataFrame(
        [("a", -1, 100), ("a", 1, 80)], "g string, mult int, v long"
    )
    got = {r["g"]: r for r in retractable_rollup([b1, b2], ["g"], "mult", "v").collect()}
    assert got["a"]["n"] == 2                 # count unchanged by the correction
    assert got["a"]["total"] == 130           # 80 + 50 — moved DOWN
    assert got["a"]["n_retractions"] == 1
    assert got["b"]["total"] == 10
    assert got["b"]["n_retractions"] == 0


def test_pure_delete_drops_count(spark):
    b1 = spark.createDataFrame([("a", 1, 5), ("a", 1, 6)], "g string, mult int, v long")
    b2 = spark.createDataFrame([("a", -1, 6)], "g string, mult int, v long")
    got = retractable_rollup([b1, b2], ["g"], "mult", "v").collect()[0]
    assert got["n"] == 1 and got["total"] == 5 and got["n_retractions"] == 1


def test_empty_batch_list_rejected(spark):
    with pytest.raises(ValueError):
        retractable_rollup([], ["g"], "mult", "v")
