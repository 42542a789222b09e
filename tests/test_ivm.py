"""Delta-join view maintenance (operators/ivm.py::delta_join_view): the
3-term tiling must reproduce the full join exactly — every (left, right)
slice pair joined once, none twice — including empty-delta batches."""

from __future__ import annotations

import pytest

from chatbot_spark.operators.ivm import delta_join_view


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def _counted(df):
    out = {}
    for r in df.collect():
        key = tuple(sorted(r.asDict().items()))
        out[key] = out.get(key, 0) + 1
    return out


def test_delta_tiling_equals_full_join_with_duplicates(spark):
    # duplicate join keys on both sides → multiplicities must match too
    L = [
        _df(spark, [(1, "l0"), (2, "l1")], "k long, lv string"),
        _df(spark, [(1, "l2")], "k long, lv string"),
        _df(spark, [(3, "l3"), (1, "l4")], "k long, lv string"),
    ]
    R = [
        _df(spark, [(1, "r0")], "k long, rv string"),
        _df(spark, [(2, "r1"), (1, "r2")], "k long, rv string"),
        _df(spark, [(3, "r3")], "k long, rv string"),
    ]
    full_l = L[0].unionByName(L[1]).unionByName(L[2])
    full_r = R[0].unionByName(R[1]).unionByName(R[2])
    expect = _counted(full_l.join(full_r, "k"))
    got = _counted(delta_join_view(L, R, on="k"))
    assert got == expect
    assert sum(got.values()) > 0


def test_empty_delta_batches_are_fine(spark):
    empty_l = _df(spark, [], "k long, lv string")
    empty_r = _df(spark, [], "k long, rv string")
    L = [_df(spark, [(1, "a")], "k long, lv string"), empty_l]
    R = [empty_r, _df(spark, [(1, "b")], "k long, rv string")]
    got = delta_join_view(L, R, on="k").collect()
    assert [(r["k"], r["lv"], r["rv"]) for r in got] == [(1, "a", "b")]


def test_misaligned_slices_rejected(spark):
    one = _df(spark, [(1, "a")], "k long, lv string")
    with pytest.raises(ValueError):
        delta_join_view([one], [], on="k")
    with pytest.raises(ValueError):
        delta_join_view([], [], on="k")


def test_stored_path_equals_full_join_and_prunes_partitions(spark, tmp_path):
    """round-7: the stored-base-table variant — refresh scans must carry
    partition filters on the batch column, and the union of refreshes
    must reproduce the full join exactly (same tiling invariant)."""
    from pyspark.sql import functions as F

    from chatbot_spark.operators.ivm import (
        delta_join_refresh_stored,
        delta_join_view_stored,
    )

    rows_l = [(k, f"l{i}", i % 3) for i, k in enumerate([1, 2, 1, 3, 1, 2, 4])]
    rows_r = [(k, f"r{i}", i % 3) for i, k in enumerate([1, 1, 2, 3, 4, 2])]
    lp, rp = str(tmp_path / "L"), str(tmp_path / "R")
    spark.createDataFrame(rows_l, "k long, lv string, __batch int").write.partitionBy(
        "__batch"
    ).parquet(lp)
    spark.createDataFrame(rows_r, "k long, rv string, __batch int").write.partitionBy(
        "__batch"
    ).parquet(rp)
    L, R = spark.read.parquet(lp), spark.read.parquet(rp)

    expect = _counted(L.drop("__batch").join(R.drop("__batch"), "k"))
    got = _counted(delta_join_view_stored(L, R, "__batch", "k", n_batches=3))
    assert got == expect

    # the single-refresh plan prunes: batch==t and batch<t reach the scan
    plan = (
        delta_join_refresh_stored(L, R, "__batch", "k", 2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [isnotnull(__batch" in plan or "PartitionFilters: [(__batch" in plan
    # no unpruned read: every scan of the stored tables mentions __batch
    for frag in plan.split("PartitionFilters: [")[1:]:
        assert frag.split("]")[0] != "", "found a scan with empty partition filters"


def test_stored_refresh_t0_is_delta_self_join_only(spark, tmp_path):
    from chatbot_spark.operators.ivm import delta_join_refresh_stored

    lp, rp = str(tmp_path / "L0"), str(tmp_path / "R0")
    spark.createDataFrame(
        [(1, "a", 0), (1, "b", 1)], "k long, lv string, __batch int"
    ).write.partitionBy("__batch").parquet(lp)
    spark.createDataFrame(
        [(1, "x", 0), (1, "y", 1)], "k long, rv string, __batch int"
    ).write.partitionBy("__batch").parquet(rp)
    L, R = spark.read.parquet(lp), spark.read.parquet(rp)
    got = delta_join_refresh_stored(L, R, "__batch", "k", 0).collect()
    assert len(got) == 1  # only (a, x): prev sides are empty at t=0
