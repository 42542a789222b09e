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


def groupwise_ols(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group simple linear regression by sufficient statistics — the
    closed-form distributed OLS every scalable-ML stack reduces to:
    ONE map-side-combinable aggregation collects (n, Σx, Σy, Σxy, Σx²,
    Σy²) as EXACT BIGINTs (``x_col``/``y_col`` must be integer-valued —
    quantize upstream, the repo's cents/e4 discipline), then

        slope     = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
        intercept = (Σy − slope·Σx) / n
        r²        = (n·Σxy − Σx·Σy)² / ((n·Σx² − (Σx)²)·(n·Σy² − (Σy)²))

    are a handful of IEEE double ops on those integers — deterministic
    on any engine, one shuffle total, no iteration. The combination
    casts each statistic to double BEFORE multiplying (n·Σxy can exceed
    BIGINT at petabyte scale; the cast of an exact BIGINT is the same
    IEEE value everywhere, so parity survives even past 2^53 where the
    cast itself rounds). Degenerate groups (a single distinct x, or
    constant y for r²) return NULL rather than ±inf.

    Output: group_cols + (n, slope, intercept, r2).
    """
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    stats = df.groupBy(*group_cols).agg(
        F.count("*").alias("__n"),
        F.sum(x).alias("__sx"),
        F.sum(y).alias("__sy"),
        F.sum(x * y).alias("__sxy"),
        F.sum(x * x).alias("__sxx"),
        F.sum(y * y).alias("__syy"),
    )
    n_d = F.col("__n").cast("double")
    sx = F.col("__sx").cast("double")
    sy = F.col("__sy").cast("double")
    sxy = F.col("__sxy").cast("double")
    sxx = F.col("__sxx").cast("double")
    syy = F.col("__syy").cast("double")
    num = n_d * sxy - sx * sy
    denx = n_d * sxx - sx * sx
    deny = n_d * syy - sy * sy
    slope = F.when(denx > 0, num / denx)
    intercept = F.when(denx > 0, (sy - (num / denx) * sx) / n_d)
    r2 = F.when((denx > 0) & (deny > 0), num * num / (denx * deny))
    return stats.select(
        *group_cols,
        F.col("__n").cast("long").alias("n"),
        slope.alias("slope"),
        intercept.alias("intercept"),
        r2.alias("r2"),
    )
