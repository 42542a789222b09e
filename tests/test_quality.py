"""Constraint audit (operators/quality.py) on hand-built rows covering
every check type, the documented null semantics, and the single-scan
contract."""

from __future__ import annotations

import pytest

from chatbot_spark.operators.quality import audit_table, fk_violations, union_audits


def _report(df_audit):
    return {
        r["check_name"]: (r["n_rows"], r["n_violations"], r["passed"])
        for r in df_audit.collect()
    }


def test_audit_table_hand_computed(spark):
    rows = [
        (1, "O", 10.0),
        (2, "O", -5.0),      # range violation
        (2, "X", 20.0),      # duplicate id + bad status
        (None, "F", None),   # null id (completeness; excluded from unique/range)
    ]
    df = spark.createDataFrame(rows, "id long, status string, amount double")
    got = _report(
        audit_table(
            df,
            completeness=["id"],
            unique=["id"],
            ranges={"amount": (0, 100)},
            memberships={"status": ["O", "F"]},
        )
    )
    assert got["complete(id)"] == (4, 1, 0)
    assert got["unique(id)"] == (4, 1, 0)          # non-null dupes only
    assert got["range(amount,[0,100])"] == (4, 1, 0)  # NULL amount skipped
    assert got["in_set(status)"] == (4, 1, 0)


def test_audit_requires_at_least_one_constraint(spark):
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError):
        audit_table(df)


def test_fk_violations_and_union(spark):
    child = spark.createDataFrame([(1,), (2,), (99,), (None,)], "k long")
    parent = spark.createDataFrame([(1,), (2,)], "pk long")
    fk = fk_violations(child, "k", parent, "pk")
    got = _report(fk)
    # NULL fk is completeness' problem, not referential integrity's
    assert got["fk(k)"] == (4, 1, 0)
    stacked = union_audits([fk, audit_table(child, completeness=["k"])])
    assert stacked.count() == 2


def test_audit_all_green_passes(spark):
    df = spark.createDataFrame([(1, "O"), (2, "F")], "id long, status string")
    got = _report(
        audit_table(df, completeness=["id"], unique=["id"],
                    memberships={"status": ["O", "F"]})
    )
    assert all(v[2] == 1 for v in got.values())
