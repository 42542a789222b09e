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
