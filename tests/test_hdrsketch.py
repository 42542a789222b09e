from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from chatbot_spark.operators.hdrsketch import (
    hdr_merge,
    hdr_quantiles,
    hdr_quantize,
    hdr_sketch,
)


def _quantize_all(spark, values, sub_bits=5):
    df = spark.createDataFrame([(v,) for v in values], "v long")
    return {
        r["v"]: r["qv"]
        for r in df.select("v", hdr_quantize(F.col("v"), sub_bits)).collect()
    }


def _py_quantize(v, sub_bits=5):
    if v <= 0:
        return v
    drop = max(v.bit_length() - 1 - sub_bits, 0)
    return v - v % (1 << drop)


def test_quantize_grid_matches_bit_reference(spark):
    values = [0, 1, 31, 32, 33, 63, 64, 65, 100, 1000, 12345,
              2**40 + 12345, 2**52 - 1, 2**52, 2**62 - 1]
    got = _quantize_all(spark, values)
    assert got == {v: _py_quantize(v) for v in values}


def test_quantize_small_values_pass_through_exactly(spark):
    # values with <= sub_bits+1 significant bits are their own bucket
    values = list(range(64))
    assert _quantize_all(spark, values) == {v: v for v in values}


def test_quantize_relative_error_bound(spark):
    rng = random.Random(11)
    values = [rng.randrange(1, 2**50) for _ in range(200)]
    for v, qv in _quantize_all(spark, values).items():
        assert qv <= v and (v - qv) / v < 2**-5


def test_sketch_merge_quantiles_end_to_end(spark):
    rng = random.Random(7)
    data = [(("a" if i % 2 else "b"), rng.randrange(1, 10**6))
            for i in range(4000)]
    d = spark.createDataFrame(data, "g string, x long")
    merged = hdr_merge(
        hdr_sketch(d.filter("x % 3 = 0"), "x", ["g"]),
        hdr_sketch(d.filter("x % 3 != 0"), "x", ["g"]),
    )
    qs = hdr_quantiles(merged, [500000, 900000, 990000], ["g"]).collect()
    assert len(qs) == 6
    for g in ("a", "b"):
        xs = sorted(x for gg, x in data if gg == g)
        for q_ppm, q in [(500000, 0.5), (900000, 0.9), (990000, 0.99)]:
            rank = max(1, math.ceil(q * len(xs)))
            exact = xs[rank - 1]
            got = [r["quantile"] for r in qs
                   if r["g"] == g and r["q_ppm"] == q_ppm][0]
            # lower-bound property + bounded relative error vs the true
            # discrete quantile at the same integer rank
            assert got <= exact
            assert (exact - got) / exact < 2**-5


def test_merge_is_tree_shape_independent(spark):
    rng = random.Random(3)
    d = spark.createDataFrame(
        [(("a" if i % 2 else "b"), rng.randrange(1, 10**5))
         for i in range(999)],
        "g string, x long",
    )
    parts = [hdr_sketch(d.filter(f"x % 3 = {k}"), "x", ["g"])
             for k in range(3)]
    left = hdr_merge(hdr_merge(parts[0], parts[1]), parts[2])
    right = hdr_merge(parts[0], hdr_merge(parts[1], parts[2]))
    assert sorted(map(tuple, left.collect())) == sorted(
        map(tuple, right.collect())
    )


def test_quantiles_no_groups_and_tiny_input(spark):
    d = spark.createDataFrame([(5,), (7,)], "x long")
    s = hdr_sketch(d, "x")
    rows = {r["q_ppm"]: r for r in hdr_quantiles(s, [1, 500000, 1000000]).collect()}
    # q -> rank: ceil(1*2/1e6)=1 (clamped), ceil(0.5*2)=1, ceil(1.0*2)=2
    assert rows[1]["rank_target"] == 1 and rows[1]["quantile"] == 5
    assert rows[500000]["rank_target"] == 1 and rows[500000]["quantile"] == 5
    assert rows[1000000]["rank_target"] == 2 and rows[1000000]["quantile"] == 7


def test_merge_requires_at_least_one_sketch():
    with pytest.raises(ValueError):
        hdr_merge()


def test_bucket_count_is_bounded_regardless_of_volume(spark):
    # 50k distinct values over 5 octaves collapse into <= 2^5 buckets
    # per octave — the fixed-size property that makes the sketch storable
    rng = random.Random(19)
    d = spark.createDataFrame(
        [(rng.randrange(2**10, 2**15),) for _ in range(50_000)], "x long"
    )
    n_buckets = hdr_sketch(d, "x").count()
    assert n_buckets <= 6 * 32


def test_sketch_store_slice_prunes_partitions(spark, tmp_path):
    # the stored-sketch contract: a day-ranged question must prune at the
    # store listing (PartitionFilters), never rescan all partitions
    import random

    rng = random.Random(23)
    rows = [(f"2024-01-{d:02d}", rng.randrange(1, 10**4))
            for d in range(1, 11) for _ in range(50)]
    df = spark.createDataFrame(rows, "day string, x long").select(
        F.to_date("day").alias("day"), "x"
    )
    store = str(tmp_path / "store")
    hdr_sketch(df, "x", ["day"]).write.partitionBy("day").parquet(store)
    sliced = spark.read.parquet(store).filter(
        (F.col("day") >= F.lit("2024-01-03")) & (F.col("day") < F.lit("2024-01-06"))
    )
    plan = sliced._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "2024-01-03" in plan
    # and the pruned merge still answers exactly: replay on the raw slice
    merged = hdr_merge(sliced.drop("day"))
    got = {r["q_ppm"]: r["quantile"]
           for r in hdr_quantiles(merged, [500000]).collect()}
    xs = sorted(x for d, x in rows if "2024-01-03" <= d < "2024-01-06")
    exact_med = xs[max(1, math.ceil(0.5 * len(xs))) - 1]
    assert got[500000] <= exact_med and (exact_med - got[500000]) / exact_med < 2**-5
