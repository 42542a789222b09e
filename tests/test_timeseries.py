"""Time-series resample/gap-fill (beyond-reference §2.J scope)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_resample_forward_fill_semantics(spark):
    """Hand-checked grid: key 1 spans [95, 415] with observations at
    95, 210.5, 400 — a step-100 grid gives points 100..400; each carries
    the last value at-or-before it; (key, ts) duplicates resolve to the
    highest tie_col; a key shorter than one step emits nothing."""
    from chatbot_spark.operators.timeseries import resample_forward_fill

    rows = [
        # (event_id, user_id, epoch_seconds, value)
        (1, 1, 95.0, 10.0),
        (2, 1, 210.5, 20.0),
        (3, 1, 210.5, 21.0),   # same ts, higher event_id wins
        (4, 1, 400.0, 30.0),
        (5, 2, 50.0, 1.0),     # span < step -> no grid points
        (6, 2, 80.0, 2.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id LONG, user_id LONG, sec DOUBLE, value DOUBLE"
    ).select(
        "event_id", "user_id", F.timestamp_seconds("sec").alias("ts"), "value"
    )
    got = {
        (r["user_id"], r["grid_epoch"]): r["value"]
        for r in resample_forward_fill(
            ev, key_col="user_id", ts_col="ts", value_col="value",
            step_seconds=100, tie_col="event_id",
        ).collect()
    }
    assert got == {
        (1, 100): 10.0,   # 95 <= 100
        (1, 200): 10.0,   # 210.5 is after the 200 mark
        (1, 300): 21.0,   # tie at 210.5 resolved to event_id 3
        (1, 400): 30.0,   # inclusive at the grid point
    }
