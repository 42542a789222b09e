"""Temporal / range join operators (SURVEY §2.C — beyond-reference scope).

The reference has no second table and therefore no joins of its own
(SURVEY §2.C); a training-data pipeline over event streams needs them, so
these are first-class beyond-reference operators (same status as §2.J).

Scale design — the classic as-of formulations and why we avoid them:
 * correlated subquery / per-key collect: driver-side or O(N·M) — no.
 * range cross-join + window: explodes to |L|·|R| per key before pruning.
 * THIS implementation: tag both sides, UNION, one shuffle on the key,
   sort within partition by (ts, side), then a running ``last(ignorenulls)``
   window carries the most recent right-row forward onto every left row.
   Cost = one shuffle of |L|+|R| slim rows + an in-partition sort — the
   same shape Flink/KDB use for as-of. Skewed keys fall out to AQE skew
   handling; the window never sees more than one key per frame.

Range join: the ranges side is a dimension (price bands, SLA tiers —
bounded small); broadcast it and let the non-equi predicate run map-side,
so the fact table never shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    strict: bool = False,
    tolerance_seconds: float | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: each left row gets the right row with the greatest
    ``right_ts`` ≤ ``left_ts`` (``direction="backward"``, the default) or
    the smallest ``right_ts`` ≥ ``left_ts`` (``direction="forward"``) for
    the same ``on`` key — < / > when ``strict``; right columns are NULL
    when no such right row exists.

    Matches DuckDB/pandas ``merge_asof`` semantics, which is the oracle
    contract. ``tolerance_seconds`` voids matches further than the window
    (pandas ``tolerance=``). Both directions are the SAME one-shuffle
    union+window plan — forward just traverses each key's timeline in
    descending order, so "last right row seen" becomes "next right row".
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    rcols = right_cols or [c for c in right.columns if c not in (on, right_ts)]

    r = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(1).alias("__is_right"),
        F.col(right_ts).alias("__rt"),
        *[F.col(c) for c in rcols],
    )
    l = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(0).alias("__is_right"),
        F.lit(None).cast(r.schema["__rt"].dataType).alias("__rt"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in rcols],
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
    )
    r = r.withColumn("__lrow", F.lit(None).cast(l.schema["__lrow"].dataType))

    # At equal ts the right row must sort BEFORE the left row so it is
    # visible to the frame (inclusive ≤ / ≥); strict mode flips that order.
    side_order = F.col("__is_right").asc() if strict else F.col("__is_right").desc()
    ts_order = F.col("__t").asc() if direction == "backward" else F.col("__t").desc()
    w = (
        Window.partitionBy("__k")
        .orderBy(ts_order, side_order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )

    filled = r.unionByName(l).select(
        "__k", "__t", "__is_right", "__lrow",
        F.last("__rt", ignorenulls=True).over(w).alias("__rt"),
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in rcols],
    )
    out = filled.filter(F.col("__is_right") == 0)

    if tolerance_seconds is not None:
        # void matches outside the tolerance window (keep the left row)
        gap = (
            F.col("__t").cast("double") - F.col("__rt").cast("double")
            if direction == "backward"
            else F.col("__rt").cast("double") - F.col("__t").cast("double")
        )
        stale = F.col("__rt").isNotNull() & (gap > F.lit(float(tolerance_seconds)))
        out = out.select(
            "__k", "__t", "__is_right", "__lrow",
            F.when(stale, F.lit(None)).otherwise(F.col("__rt")).alias("__rt"),
            *[F.when(stale, F.lit(None)).otherwise(F.col(c)).alias(c) for c in rcols],
        )

    return out.select(
        *[F.col(f"__lrow.{c}").alias(c) for c in left.columns],
        F.col("__rt").alias(f"asof_{right_ts}"),
        *rcols,
    )


def range_join(
    facts: DataFrame,
    ranges: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    how: str = "left",
) -> DataFrame:
    """Band/interval join: fact rows matched to [lo, hi) ranges.

    The ranges side is broadcast — the fact table never shuffles; the
    non-equi predicate evaluates map-side inside codegen. For a ranges
    side too big to broadcast, bucketize both sides on a common grid
    first (equi-join on bucket, residual predicate after).
    """
    cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    return facts.join(F.broadcast(ranges), cond, how)
