from __future__ import annotations

import statistics

from chatbot_spark.operators.robust import grouped_median, mad_outliers


def _med(spark, rows):
    df = spark.createDataFrame([(g, v) for g, v in rows], "g string, v long")
    return {
        r["g"]: r["median"]
        for r in grouped_median(df, "v", ["g"]).collect()
    }


def test_grouped_median_odd_and_even_lower(spark):
    rows = [("a", v) for v in (1, 3, 5)] + [("b", v) for v in (10, 20, 30, 40)]
    got = _med(spark, rows)
    # lower median: rank (N+1) div 2 -> a: 3 (true median), b: 20 (lower of 20/30)
    assert got == {"a": 3, "b": 20}


def test_grouped_median_heavy_ties(spark):
    rows = [("a", 7)] * 9 + [("a", 100)]
    assert _med(spark, rows) == {"a": 7}


def test_mad_outliers_flags_spike_and_not_bulk(spark):
    vals = list(range(100, 121)) + [10_000]  # tight bulk + one spike
    df = spark.createDataFrame([("a", v) for v in vals], "g string, v long")
    rows = mad_outliers(df, "v", ["g"]).collect()
    assert len(rows) == 1
    r = rows[0]
    med = statistics.median_low(vals)
    mad = statistics.median_low(sorted(abs(v - med) for v in vals))
    assert (r["median"], r["mad"]) == (med, mad)
    assert r["n_rows"] == 22
    assert r["n_outliers"] == 1  # only the spike: |10000-110| > 3*mad
    assert r["outlier_dev_sum"] == abs(10_000 - med)


def test_mad_outliers_masking_resistance_vs_sigma(spark):
    # three huge values inflate sigma enough that a 3-sigma rule keeps
    # them all; MAD still flags every one (50% breakdown point)
    bulk = [100 + (i % 5) for i in range(40)]
    spikes = [100_000, 120_000, 140_000]
    vals = bulk + spikes
    mean = sum(vals) / len(vals)
    sigma = (sum((v - mean) ** 2 for v in vals) / len(vals)) ** 0.5
    assert sum(1 for v in vals if abs(v - mean) > 3 * sigma) < len(spikes)
    df = spark.createDataFrame([("a", v) for v in vals], "g string, v long")
    r = mad_outliers(df, "v", ["g"]).collect()[0]
    assert r["n_outliers"] == len(spikes)


def test_mad_zero_flags_any_deviation(spark):
    # constant group with one dissenter: MAD 0 -> strict > flags it
    df = spark.createDataFrame(
        [("a", 5)] * 9 + [("a", 6)], "g string, v long"
    )
    r = mad_outliers(df, "v", ["g"]).collect()[0]
    assert (r["median"], r["mad"], r["n_outliers"]) == (5, 0, 1)


def test_mad_outliers_independent_per_group(spark):
    rows = [("a", v) for v in (1, 2, 3)] + [("b", v) for v in (1000, 2000, 9000)]
    df = spark.createDataFrame(rows, "g string, v long")
    got = {r["g"]: r for r in mad_outliers(df, "v", ["g"]).collect()}
    assert got["a"]["median"] == 2 and got["b"]["median"] == 2000
