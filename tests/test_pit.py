"""Point-in-time (leakage-safe) feature join: the workload query's
composition of scd2_intervals + strict backward as-of, pinned here on a
hand-built timeline where the leakage hazard is explicit."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from chatbot_spark.operators.joins import asof_join
from chatbot_spark.operators.scd import scd2_intervals


def _ts(s):
    return datetime.fromisoformat(s)


def test_strict_asof_excludes_same_instant_state_change(spark):
    # user 1: state A at 10:00, state B at 12:00 (the same instant as the
    # purchase). A non-strict join would leak B (set by the purchase
    # itself); strict must see A.
    feed = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), "A", 1),
         (1, _ts("2024-01-01T12:00:00"), "B", 2)],
        "user_id long, ts timestamp, event_type string, event_id long",
    )
    iv = scd2_intervals(feed, key_col="user_id", attr_col="event_type",
                        ts_col="ts").select(
        "user_id", F.col("event_type").alias("state"), "valid_from"
    )
    purchases = spark.createDataFrame(
        [(100, 1, _ts("2024-01-01T12:00:00"))],
        "event_id long, user_id long, ts timestamp",
    )
    got = asof_join(purchases, iv, on="user_id", left_ts="ts",
                    right_ts="valid_from", right_cols=["state"],
                    strict=True).collect()
    assert got[0]["state"] == "A"


def test_purchase_before_any_state_gets_null(spark):
    feed = spark.createDataFrame(
        [(1, _ts("2024-01-02T00:00:00"), "A", 1)],
        "user_id long, ts timestamp, event_type string, event_id long",
    )
    iv = scd2_intervals(feed, key_col="user_id", attr_col="event_type",
                        ts_col="ts").select(
        "user_id", F.col("event_type").alias("state"), "valid_from"
    )
    purchases = spark.createDataFrame(
        [(100, 1, _ts("2024-01-01T00:00:00"))],
        "event_id long, user_id long, ts timestamp",
    )
    got = asof_join(purchases, iv, on="user_id", left_ts="ts",
                    right_ts="valid_from", right_cols=["state"],
                    strict=True).collect()
    assert got[0]["state"] is None


def test_no_op_state_changes_do_not_shadow(spark):
    # A → A → B: the duplicate A opens no new version, so a purchase
    # between the two A's still maps to the ORIGINAL A interval
    feed = spark.createDataFrame(
        [(1, _ts("2024-01-01T00:00:00"), "A", 1),
         (1, _ts("2024-01-03T00:00:00"), "A", 2),
         (1, _ts("2024-01-05T00:00:00"), "B", 3)],
        "user_id long, ts timestamp, event_type string, event_id long",
    )
    iv = scd2_intervals(feed, key_col="user_id", attr_col="event_type",
                        ts_col="ts").select(
        "user_id", F.col("event_type").alias("state"), "valid_from"
    )
    assert iv.count() == 2  # the no-op A collapsed
    purchases = spark.createDataFrame(
        [(100, 1, _ts("2024-01-04T00:00:00")),
         (101, 1, _ts("2024-01-06T00:00:00"))],
        "event_id long, user_id long, ts timestamp",
    )
    got = {r["event_id"]: r["state"] for r in asof_join(
        purchases, iv, on="user_id", left_ts="ts", right_ts="valid_from",
        right_cols=["state"], strict=True).collect()}
    assert got[100] == "A"
    assert got[101] == "B"
