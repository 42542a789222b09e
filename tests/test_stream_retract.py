"""signed_partials_writer (streaming/events.py): replay idempotency and
partial correctness — the at-least-once contract means the same
(batch_id, data) can hit the sink twice; the dynamic-overwrite partition
must absorb the replay instead of double-counting."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from chatbot_spark.streaming.events import signed_partials_writer


def test_replayed_batch_overwrites_not_appends(spark):
    out = os.path.join(tempfile.mkdtemp(prefix="cbs_spw_"), "partials")
    w = signed_partials_writer(out, ["g"], "mult", "v")
    batch = spark.createDataFrame(
        [("a", 1, 100), ("a", -1, 40), ("b", 1, 7)], "g string, mult int, v long"
    )
    w(batch, 0)
    w(batch, 0)  # at-least-once replay of the SAME batch id
    got = {
        r["g"]: (r["p_n"], r["p_sum"], r["p_retr"])
        for r in spark.read.parquet(out).collect()
    }
    assert got["a"] == (0, 60, 1)   # 100 - 40; one retraction; count nets to 0
    assert got["b"] == (1, 7, 0)
    # exactly one partition's worth of rows — no duplicate batch copy
    assert spark.read.parquet(out).count() == 2


def test_distinct_batches_accumulate(spark):
    out = os.path.join(tempfile.mkdtemp(prefix="cbs_spw2_"), "partials")
    w = signed_partials_writer(out, ["g"], "mult", "v")
    w(spark.createDataFrame([("a", 1, 10)], "g string, mult int, v long"), 0)
    w(spark.createDataFrame([("a", -1, 10), ("a", 1, 25)],
                            "g string, mult int, v long"), 1)
    final = (
        spark.read.parquet(out)
        .groupBy("g")
        .agg(F.sum("p_n").alias("n"), F.sum("p_sum").alias("total"),
             F.sum("p_retr").alias("retr"))
        .collect()[0]
    )
    assert (final["n"], final["total"], final["retr"]) == (1, 25, 1)


def _fold_crud(spark, tmp_path, batches, tag):
    import os

    from chatbot_spark.streaming.graphcrud import (
        edge_crud_writer,
        read_latest_version,
    )

    state = str(tmp_path / f"state_{tag}")
    fold = edge_crud_writer(state)
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(rows, "op string, src long, dst long")
        fold(df, i)
    labels = read_latest_version(
        spark, state, "labels", "node long, component long"
    )
    return {r["node"]: r["component"] for r in labels.collect()}


def test_edge_crud_fold_order_insensitive(spark, tmp_path):
    """The z-set CRUD fold's drained state must be a pure function of
    the event MULTISET: replaying the two batches in either order —
    including the del-before-add case, where the removal nets to -1 and
    the late add back to 0 (absent both ways) — lands on identical
    labels."""
    adds = [("add", 0, 1), ("add", 1, 2), ("add", 10, 11), ("add", 2, 10)]
    churn = [("del", 2, 10), ("add", 20, 21)]
    fwd = _fold_crud(spark, tmp_path, [adds, churn], "fwd")
    rev = _fold_crud(spark, tmp_path, [churn, adds], "rev")
    assert fwd == rev
    # and both equal the net-positive-edge ground truth:
    # {0,1,2} | {10,11} (bridge 2-10 netted out) | {20,21}
    assert fwd == {0: 0, 1: 0, 2: 0, 10: 10, 11: 10, 20: 20, 21: 20}


def test_edge_crud_fold_duplicate_multiplicities(spark, tmp_path):
    # an edge added twice needs two dels to disappear (multiset, not set)
    got = _fold_crud(
        spark, tmp_path,
        [[("add", 1, 2), ("add", 1, 2)], [("del", 1, 2)]],
        "dup",
    )
    assert got == {1: 1, 2: 1}
    got2 = _fold_crud(
        spark, tmp_path,
        [[("add", 1, 2), ("add", 1, 2)], [("del", 1, 2), ("del", 1, 2)]],
        "dup2",
    )
    # fully removed: both endpoints survive as singletons
    assert got2 == {1: 1, 2: 2}
