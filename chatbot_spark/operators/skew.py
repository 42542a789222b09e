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


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    salt_source: Column,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: the manual fallback for when AQE's skew-join
    can't fire (the skewed side feeds a window first, the join is inside
    a cached subtree, or the planner's skew thresholds don't trip) and
    the dimension is too big to broadcast outright.

    Each LEFT row gets a deterministic salt from ``salt_source`` (a
    high-cardinality column — retries must re-derive the same salt);
    the RIGHT side is replicated ``n_salts``× via one explode, and the
    join runs on ``on + [salt]`` — a hot key's rows now spread over
    n_salts reducers instead of funneling through one. Every left row
    still matches each right row exactly once (through its single
    salt), so the result is EXACTLY the plain join — the workload query
    proves equality against the unsalted oracle.

    Cost model: the right side inflates n_salts× through the shuffle —
    right for dimensions in the too-big-to-broadcast / far-smaller-than-
    fact window. Only ``inner`` and ``left`` are supported: replicating
    the right side would emit unmatched right rows n_salts times under
    ``right``/``full`` semantics.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner'|'left' only")
    salted_left = left.withColumn(
        "__salt", F.pmod(F.xxhash64(salt_source), F.lit(n_salts))
    )
    replicated_right = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("long"))
    return salted_left.join(replicated_right, [*on, "__salt"], how).drop("__salt")
