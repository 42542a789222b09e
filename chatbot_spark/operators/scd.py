"""Slowly-changing-dimension (type 2) interval maintenance.

The warehouse-maintenance op every 100 TB dimension table needs: an
append-only change feed (key, attribute, ts) becomes validity intervals
(key, attribute, valid_from, valid_to) where consecutive DUPLICATE
attribute values are collapsed (a no-op update must not open a new
version — the classic SCD2 subtlety) and the latest row stays open
(valid_to NULL).

Spark shape: one window per key — lag() flags real changes
(gaps-and-islands), a filter drops the no-ops, lead() closes each
surviving interval at the next change. Two window passes over the SAME
(key, order) partitioning → Catalyst plans ONE exchange + one sort; at
scale the feed shuffles once, by key, and nothing else moves.

Everything is integer/timestamp comparisons — no floats — so a SQL
oracle replaying the same windows reproduces the intervals exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scd2_intervals(
    feed: DataFrame,
    key_col: str = "user_id",
    attr_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Collapse a change feed into SCD2 validity intervals.

    ``tiebreak_col`` orders same-timestamp changes deterministically
    (e.g. an event id); required for engine-stable output when the feed
    can carry two changes at one instant.
    """
    order: list[Column] = [F.col(ts_col).asc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(key_col).orderBy(*order)
    # null-safe change detection: `attr != prev` is NULL (dropped) for a
    # non-null→NULL transition and `prev IS NULL` can't tell "first row"
    # from "previous attr was NULL" — row_number marks the true first row
    # and eqNullSafe compares NULL-valued attributes symmetrically. All
    # three window functions share one (key, order) partitioning → still
    # a single exchange.
    changes = (
        feed.withColumn("__rn", F.row_number().over(w))
        .withColumn("__prev", F.lag(attr_col).over(w))
        .filter((F.col("__rn") == 1) | ~F.col(attr_col).eqNullSafe(F.col("__prev")))
        .drop("__rn", "__prev")
    )
    # same partitioning + order → reuses the exchange/sort of the first pass
    return changes.withColumn("valid_to", F.lead(ts_col).over(w)).select(
        F.col(key_col),
        F.col(attr_col),
        F.col(ts_col).alias("valid_from"),
        "valid_to",
    )
