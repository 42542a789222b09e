"""Skew-safe aggregation (beyond-reference scale operator).

A groupBy on a low-cardinality / hot-keyed column (event_type has 3
values; at 100 TB each key is ~33 TB) funnels every row of a key through
one reducer. Salting splits each hot key into ``n_salts`` sub-groups for
the first (wide) aggregation, then re-aggregates the tiny salted partials
— two shuffles, but the first is balanced and the second moves only
keys × n_salts rows. AQE's skew handling covers JOINS; skewed
AGGREGATIONS are on the query author, which is what this operator is for.

Exactness: partial counts/sums of integers re-aggregate to bit-identical
totals regardless of grouping order, so the salted plan is verifiable
against the plain groupBy oracle. (Double sums would reassociate — keep
money in exact cents, per the workload float discipline.)

The salt must be DETERMINISTIC (derived from a high-cardinality column,
not rand()): retries/speculative tasks must land a row in the same
sub-group, or partials double-count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    salt_source: Column,
    aggs: dict[str, tuple[str, Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` maps output column name → (combiner, partial expression):
    the partial expression runs per (key, salt) group; the combiner
    ("sum" | "max" | "min") re-aggregates partials per key. count(*) is
    expressed as partial count + combiner "sum".
    """
    salt = F.pmod(F.xxhash64(salt_source), F.lit(n_salts)).alias("__salt")
    partial = df.groupBy(*key_cols, salt).agg(
        *[expr.alias(f"__p_{name}") for name, (_, expr) in aggs.items()]
    )
    combiners = {"sum": F.sum, "max": F.max, "min": F.min}
    final = partial.groupBy(*key_cols).agg(
        *[
            combiners[comb](F.col(f"__p_{name}")).alias(name)
            for name, (comb, _) in aggs.items()
        ]
    )
    return final
