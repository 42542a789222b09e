"""Declarative data-quality constraint auditing (the Deequ/
Great-Expectations shape): completeness, uniqueness, range, set
membership in ONE aggregation pass over the table, plus referential
integrity as a broadcast anti-join — the release gate a 100 TB ingest
runs before publishing a snapshot.

Spark-first shape: every in-table check compiles to a conditional-sum
column inside a single `agg` (one scan, map-side combinable, no
shuffle beyond the 1-row fold); the wide metric row is then exploded to
one row per constraint. Foreign-key containment is the only check that
needs a second relation — a left-anti join against the (broadcast)
parent key set. All outputs are exact integers.

Null semantics (documented, Deequ-compatible):
* completeness counts NULLs as violations;
* uniqueness counts duplicate NON-NULL values (count - count_distinct);
* range/membership checks skip NULLs (completeness owns those).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCHEMA_COLS = ("check_name", "n_rows", "n_violations", "passed")


def audit_table(
    df: DataFrame,
    completeness: list[str] = (),
    unique: list[str] = (),
    ranges: dict[str, tuple] | None = None,
    memberships: dict[str, list] | None = None,
) -> DataFrame:
    """One row per declared constraint:
    (check_name, n_rows, n_violations, passed). Single scan."""
    aggs: list[Column] = [F.count("*").alias("__n")]
    metric_names: list[tuple[str, str]] = []  # (constraint label, agg alias)

    def add(label: str, alias: str, col: Column) -> None:
        aggs.append(col.alias(alias))
        metric_names.append((label, alias))

    for c in completeness:
        add(f"complete({c})", f"__comp_{c}",
            F.sum(F.col(c).isNull().cast("long")))
    for c in unique:
        add(f"unique({c})", f"__uniq_{c}",
            (F.count(F.col(c)) - F.count_distinct(F.col(c))).cast("long"))
    for c, (lo, hi) in (ranges or {}).items():
        bad = F.col(c).isNotNull() & ~F.col(c).between(F.lit(lo), F.lit(hi))
        add(f"range({c},[{lo},{hi}])", f"__rng_{c}", F.sum(bad.cast("long")))
    for c, allowed in (memberships or {}).items():
        bad = F.col(c).isNotNull() & ~F.col(c).isin(list(allowed))
        add(f"in_set({c})", f"__set_{c}", F.sum(bad.cast("long")))

    if not metric_names:
        raise ValueError("no constraints declared")
    row = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(label).alias("check_name"),
            F.coalesce(F.col(alias), F.lit(0)).cast("long").alias("n_violations"),
        )
        for label, alias in metric_names
    ]
    return (
        row.select(F.col("__n").alias("n_rows"), F.explode(F.array(*structs)).alias("s"))
        .select(
            F.col("s.check_name").alias("check_name"),
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("s.n_violations").alias("n_violations"),
            (F.col("s.n_violations") == 0).cast("int").alias("passed"),
        )
    )


def fk_violations(
    child: DataFrame, fk: str, parent: DataFrame, pk: str
) -> DataFrame:
    """Referential integrity as (check_name, n_rows, n_violations,
    passed): non-null child keys with no parent row. The parent side is
    projected to its key — dimension-sized, so Catalyst broadcasts the
    anti-join at scale."""
    orphans = (
        child.select(F.col(fk)).filter(F.col(fk).isNotNull())
        .join(parent.select(F.col(pk).alias(fk)).distinct(), fk, "left_anti")
    )
    n = child.agg(F.count("*").alias("n")).crossJoin(
        orphans.agg(F.count("*").alias("v"))
    )
    return n.select(
        F.lit(f"fk({fk})").alias("check_name"),
        F.col("n").cast("long").alias("n_rows"),
        F.col("v").cast("long").alias("n_violations"),
        (F.col("v") == 0).cast("int").alias("passed"),
    )


def union_audits(parts: list[DataFrame]) -> DataFrame:
    """Stack audit fragments into one report."""
    return reduce(lambda a, b: a.unionByName(b), parts)
