"""Incremental view maintenance for joins — the delta-join algebra.

The repo already maintains AGGREGATES incrementally (workload
``incremental_rollup``: mergeable partials per batch) and sketches
(``incremental_kmv_distinct``, ``incremental_distinct_hll``). This module
adds the JOIN counterpart, the classic IVM identity used by every
materialized-view engine (DBSP/Materialize/Calcite's delta rules):

    Δ(A ⋈ B) = ΔA ⋈ B_prev  ∪  A_prev ⋈ ΔB  ∪  ΔA ⋈ ΔB

so batch t touches only its OWN deltas joined against the accumulated
base sides — never the previously-materialized view, and never a rescan
of earlier deltas against each other (each (i, j) slice pair is joined
exactly once across the whole run; the union over t of the three terms
tiles the full i × j grid without overlap).

Spark-first shape: the whole multi-batch maintenance is ONE lazy DAG —
each term is an equi-join on the view key, so Catalyst broadcasts the
small side per term and AQE coalesces the unions; nothing is collected
or checkpointed between batches. At 100 TB the accumulated sides
(``A_prev``/``B_prev``) are the stored base tables read with partition
pruning on the batch column — the 3-term tiling is exactly why the view
never has to be rebuilt: per refresh you shuffle |Δ| + the matched keys
of the base, not |A| + |B|.

Insert-only deltas here (the append-heavy fact/dimension case);
deletes/updates compose with the retraction encoding the CDC operator
(io/tables.py::cdc_apply) already implements — a signed multiplicity
column flows through the same three terms unchanged.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def delta_join_view(
    left_slices: list[DataFrame],
    right_slices: list[DataFrame],
    on: list[str] | str,
) -> DataFrame:
    """Union of per-batch join deltas over aligned insert batches.

    ``left_slices[t]`` / ``right_slices[t]`` are batch t's inserts to each
    side (either may be empty — pass a filtered-to-empty DataFrame).
    Returns the maintained view ≡ ``union(left) ⋈ union(right)`` row for
    row — the invariant the workload oracle pins exactly.
    """
    if len(left_slices) != len(right_slices):
        raise ValueError(
            f"slice lists must align: {len(left_slices)} vs {len(right_slices)}"
        )
    if not left_slices:
        raise ValueError("need at least one batch")
    deltas: list[DataFrame] = []
    l_prev: DataFrame | None = None
    r_prev: DataFrame | None = None
    for t, (dl, dr) in enumerate(zip(left_slices, right_slices)):
        if t > 0:
            deltas.append(dl.join(r_prev, on))       # ΔA ⋈ B_prev
            deltas.append(l_prev.join(dr, on))       # A_prev ⋈ ΔB
        deltas.append(dl.join(dr, on))               # ΔA ⋈ ΔB
        l_prev = dl if l_prev is None else l_prev.unionByName(dl)
        r_prev = dr if r_prev is None else r_prev.unionByName(dr)
    return reduce(lambda a, b: a.unionByName(b), deltas)


def delta_join_refresh_stored(
    left_base: DataFrame,
    right_base: DataFrame,
    batch_col: str,
    on: list[str] | str,
    t: int,
) -> DataFrame:
    """Batch ``t``'s view delta read from STORED base tables — the 100 TB
    contract the module docstring promises (and ``delta_join_view``'s
    in-memory slice-list form cannot honor: its accumulated sides are
    lazy unions of all prior slices, so one maintenance DAG holds O(T²)
    scan references).

    ``left_base`` / ``right_base`` are the written base tables, each
    carrying an integer ``batch_col`` the table is PARTITIONED BY; the
    three delta terms become four PARTITION-PRUNED reads of the stored
    tables (Δ = batch_col == t, prev = batch_col < t — both land in the
    scan's PartitionFilters, so a refresh reads batch t's files plus the
    matched prior partitions, never a T-way union plan)::

        ΔA ⋈ B_prev  ∪  A_prev ⋈ ΔB  ∪  ΔA ⋈ ΔB

    The union of refreshes over all t equals the full join of the full
    tables (the same tiling invariant, now against storage). batch_col
    is dropped from the output (its value differs per side and is
    maintenance metadata, not view content).
    """
    bc = F.col(batch_col)
    dl = left_base.filter(bc == t).drop(batch_col)
    dr = right_base.filter(bc == t).drop(batch_col)
    l_prev = left_base.filter(bc < t).drop(batch_col)
    r_prev = right_base.filter(bc < t).drop(batch_col)
    return (
        dl.join(r_prev, on)
        .unionByName(l_prev.join(dr, on))
        .unionByName(dl.join(dr, on))
    )


def delta_join_view_stored(
    left_base: DataFrame,
    right_base: DataFrame,
    batch_col: str,
    on: list[str] | str,
    n_batches: int,
) -> DataFrame:
    """Maintained view over stored base tables: the union of
    :func:`delta_join_refresh_stored` for t = 0..n_batches-1 — row-for-row
    ≡ ``left_base ⋈ right_base`` (batch_col dropped), which is the oracle
    invariant. In production only the LATEST refresh runs per batch; this
    form exists so the equality is assertable in one plan whose every
    scan is partition-pruned."""
    if n_batches < 1:
        raise ValueError("need at least one batch")
    out = delta_join_refresh_stored(left_base, right_base, batch_col, on, 0)
    for t in range(1, n_batches):
        out = out.unionByName(
            delta_join_refresh_stored(left_base, right_base, batch_col, on, t)
        )
    return out


def retractable_rollup(
    batches: list[DataFrame],
    group_cols: list[str],
    mult_col: str,
    value_col: str,
) -> DataFrame:
    """Retraction-aware incremental aggregate — the signed-multiplicity
    algebra of retract streams (Flink's retract mode, Materialize/DBSP
    z-sets): a correction arrives as a (-1) retraction of the previously
    reported row plus a (+1) reissue, and the maintained state is just
    per-batch SIGNED partials re-aggregated:

        n      = Σ mult            (corrections net to zero)
        total  = Σ mult · value    (old value cancels, new value lands)

    This is what `incremental_rollup` (append-only partials) cannot do:
    aggregates move DOWN as well as up, with no rescan of earlier
    batches and no keyed state lookup — the partials stay mergeable.
    One map-side-combinable agg per batch, one tiny merge; exact
    integers throughout (``value_col`` must be integer-quantized, the
    repo's cents discipline).

    Output: group_cols + (n, total, n_retractions) where n_retractions
    counts retracted multiplicity — the audit trail that corrections
    actually flowed (an upsert-style rewrite would report zero).
    """
    if not batches:
        raise ValueError("need at least one batch")
    m = F.col(mult_col).cast("long")
    v = F.col(value_col).cast("long")
    parts = [
        b.groupBy(*group_cols).agg(
            F.sum(m).alias("__p_n"),
            F.sum(m * v).alias("__p_sum"),
            F.sum(F.when(m < 0, -m).otherwise(F.lit(0))).alias("__p_retr"),
        )
        for b in batches
    ]
    u = reduce(lambda a, b: a.unionByName(b), parts)
    return u.groupBy(*group_cols).agg(
        F.sum("__p_n").cast("long").alias("n"),
        F.sum("__p_sum").cast("long").alias("total"),
        F.sum("__p_retr").cast("long").alias("n_retractions"),
    )
