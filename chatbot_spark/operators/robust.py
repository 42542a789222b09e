"""Robust outlier detection via MAD (median absolute deviation) — the
data-quality gate that survives the contamination it is looking for.

Mean/stddev z-scores break on the exact rows they should flag (one huge
value inflates sigma until nothing is an outlier — masking). The robust
standard (Hampel) scores against the MEDIAN and the median of absolute
deviations instead: both have a 50% breakdown point, so a corrupted
tail cannot hide itself.

Spark-first shape, twice: the per-group discrete lower median is the
same machinery as the equi-depth histogram (value-frequency groupBy →
per-group cumulative counts → the target rank extracted by a
(cum−cnt, cum] interval join) run once on the values and once on the
absolute deviations. Every quantity is BIGINT (values are integral by
contract — scale floats to cents first), every exchange is keyed by
(group) or (group, value) with map-side combine, no global sort, no
driver-side value list — so the result is bit-identical on any engine
and the DuckDB oracle replays it with two window cumsums.

The flag threshold is the pure-integer comparison
``den * |x − med| > num * MAD`` (k = num/den, default 3), avoiding
the float multiply entirely.

100 TB: two value-frequency aggregations (the second over deviations,
whose distinct-count is at most the value distinct-count), two
group-keyed broadcast-sized rank tables, one final flag aggregation —
cost ~2 scans + small keyed shuffles; heavy per-group skew collapses in
the map-side combine of the frequency agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["grouped_median", "mad_outliers"]


def grouped_median(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    out_col: str = "median",
) -> DataFrame:
    """(group..., median) — discrete LOWER median per group: the
    smallest value whose cumulative count reaches rank (N+1) div 2.
    ``value_col`` must be integral (exactness contract)."""
    g = list(group_cols)
    counts = df.groupBy(*g, value_col).agg(F.count("*").cast("long").alias("__cnt"))
    w = Window.partitionBy(*g).orderBy(value_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = counts.select(*g, value_col, "__cnt", F.sum("__cnt").over(w).alias("__cum"))
    ranks = (
        counts.groupBy(*g)
        .agg(F.sum("__cnt").cast("long").alias("__n"))
        .select(*g, F.expr("(__n + 1) div 2").cast("long").alias("__rt"))
    )
    hit = (F.col("__cum") - F.col("__cnt") < F.col("__rt")) & (
        F.col("__rt") <= F.col("__cum")
    )
    return (
        cum.join(ranks, on=g)
        .filter(hit)
        .select(*g, F.col(value_col).cast("long").alias(out_col))
    )


def mad_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    k_num: int = 3,
    k_den: int = 1,
) -> DataFrame:
    """(group..., median, mad, n_rows, n_outliers, outlier_dev_sum) — Hampel
    outlier audit per group: a row is an outlier iff
    ``k_den * |x − median| > k_num * MAD`` (strict: when MAD is 0 every
    deviating row flags, the degenerate-constant-group behavior you
    want from a quality gate)."""
    g = list(group_cols)
    med = grouped_median(df, value_col, g)
    v = F.col(value_col).cast("long")
    dev = df.join(med, on=g).select(
        *g, "median", F.abs(v - F.col("median")).alias("__dev")
    )
    mad = grouped_median(dev, "__dev", g, out_col="mad")
    flagged = dev.join(mad, on=g).select(
        *g,
        "median",
        "mad",
        "__dev",
        (
            F.lit(int(k_den)).cast("long") * F.col("__dev")
            > F.lit(int(k_num)).cast("long") * F.col("mad")
        ).alias("__out"),
    )
    return flagged.groupBy(*g, "median", "mad").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum(F.col("__out").cast("long")).cast("long").alias("n_outliers"),
        F.sum(F.when(F.col("__out"), F.col("__dev")).otherwise(F.lit(0)))
        .cast("long")
        .alias("outlier_dev_sum"),
    )
