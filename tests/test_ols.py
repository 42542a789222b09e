"""Group-wise closed-form OLS (operators/timeseries.py::groupwise_ols):
exact fits on hand-built lines, degenerate-group NULLs, r² extremes."""

from __future__ import annotations

import pytest

from chatbot_spark.operators.timeseries import groupwise_ols


def test_perfect_line_recovered_exactly(spark):
    # y = 3x + 7 → slope 3, intercept 7, r² = 1
    rows = [("g", x, 3 * x + 7) for x in range(10)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    got = groupwise_ols(df, ["g"], "x", "y").collect()[0]
    assert got["n"] == 10
    assert got["slope"] == pytest.approx(3.0)
    assert got["intercept"] == pytest.approx(7.0)
    assert got["r2"] == pytest.approx(1.0)


def test_known_textbook_fit(spark):
    # points (0,1),(1,3),(2,2),(3,5): slope = 1.1, intercept = 1.1 (hand
    # computed: n=4 sx=6 sy=11 sxy=22 sxx=14 → num=22·4−66=22, den=56−36=20)
    rows = [("g", 0, 1), ("g", 1, 3), ("g", 2, 2), ("g", 3, 5)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    got = groupwise_ols(df, ["g"], "x", "y").collect()[0]
    assert got["slope"] == pytest.approx(1.1)
    assert got["intercept"] == pytest.approx(1.1)
    assert 0 < got["r2"] < 1


def test_degenerate_groups_return_null_not_inf(spark):
    rows = [
        ("one_x", 5, 10), ("one_x", 5, 20),      # single distinct x
        ("const_y", 0, 4), ("const_y", 1, 4),    # slope 0, r² undefined
    ]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    got = {r["g"]: r for r in groupwise_ols(df, ["g"], "x", "y").collect()}
    assert got["one_x"]["slope"] is None
    assert got["one_x"]["intercept"] is None
    assert got["one_x"]["r2"] is None
    assert got["const_y"]["slope"] == pytest.approx(0.0)
    assert got["const_y"]["r2"] is None           # deny == 0 guarded


def test_multiple_groups_independent(spark):
    rows = [("a", x, 2 * x) for x in range(5)] + [("b", x, 100 - x) for x in range(5)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    got = {r["g"]: r for r in groupwise_ols(df, ["g"], "x", "y").collect()}
    assert got["a"]["slope"] == pytest.approx(2.0)
    assert got["b"]["slope"] == pytest.approx(-1.0)
    assert got["b"]["intercept"] == pytest.approx(100.0)
