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
