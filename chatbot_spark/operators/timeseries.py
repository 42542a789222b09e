"""Time-series resampling / gap filling (beyond-reference §2.J scope —
the observability/feature-store shape: irregular event streams onto a
fixed grid with forward fill).

Spark-first: the grid is `sequence()` + `explode` (JVM-side, no UDF, no
driver loop), and the fill is the existing as-of join — one union+window
shuffle per (key, time) — so the whole operator inherits the as-of
plan's scale contract. Nothing is quadratic: grid size is
span/step per key, and the join is the merge-asof sweep, not an
inequality nested loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from chatbot_spark.operators.joins import asof_join


def resample_forward_fill(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    step_seconds: int = 3600,
    tie_col: str | None = None,
) -> DataFrame:
    """Per key, emit one row per ``step_seconds``-aligned grid point in
    [ceil(min ts), floor(max ts)] carrying the LAST observed value at or
    before that point (forward fill). Output:
    (key_col, grid_epoch BIGINT, value_col).

    The grid starts at the first aligned point ≥ the key's first event,
    so every grid row has a fill value by construction (no nulls). Keys
    whose span is shorter than one step emit nothing. Observations are
    first deduplicated per (key, ts) — ``tie_col`` descending picks the
    winner (latest ingest wins), matching the oracle's deterministic
    tie-break.

    Plan: one agg for bounds, sequence+explode for the grid (rows =
    span/step per key — generated, never shuffled wide), one as-of join
    (union + single (key)-hash window pass). Integer epoch arithmetic
    throughout — DIV, not double division — so grid membership is
    engine-exact."""
    step = int(step_seconds)
    dedup_order = (
        [F.col(tie_col).desc()] if tie_col else [F.col(value_col).desc()]
    )
    w = Window.partitionBy(key_col, ts_col).orderBy(*dedup_order)
    obs = (
        events.select(key_col, ts_col, value_col, *( [tie_col] if tie_col else [] ))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(key_col, ts_col, value_col)
    )

    bounds = obs.groupBy(key_col).agg(
        F.unix_timestamp(F.min(ts_col)).alias("__mn"),
        F.unix_timestamp(F.max(ts_col)).alias("__mx"),
    )
    grid = (
        bounds.withColumn("__g0", F.expr(f"(__mn + {step} - 1) DIV {step} * {step}"))
        .withColumn("__g1", F.expr(f"__mx DIV {step} * {step}"))
        # keys spanning less than one step have no aligned point between
        # their bounds (sequence() rejects start > stop)
        .filter(F.col("__g0") <= F.col("__g1"))
        .select(
            key_col,
            F.explode(
                F.sequence(F.col("__g0"), F.col("__g1"), F.lit(step).cast("long"))
            ).alias("grid_epoch"),
        )
        .withColumn("__gts", F.timestamp_seconds(F.col("grid_epoch")))
    )

    filled = asof_join(
        grid,
        obs,
        on=key_col,
        left_ts="__gts",
        right_ts=ts_col,
        right_cols=[value_col],
        direction="backward",
    )
    # the first aligned point can precede the key's first event by a
    # sub-second fraction (unix_timestamp floors); such points have no
    # fill value — drop them rather than emit nulls
    return filled.filter(F.col(value_col).isNotNull()).select(
        key_col, "grid_epoch", value_col
    )
