"""Z-order (Morton-curve) multi-dimensional layout clustering — the
OPTIMIZE ZORDER BY of table maintenance, complementing the single-key
``repartitionByRange`` layout (workload.py::range_layout_pruning).

Why it exists: range-clustering a table on one key makes predicates on
THAT key touch O(1) files but leaves every other dimension scattered —
each file still spans the full range of the second key. Interleaving the
bits of two (or more) min-max-normalized keys puts rows that are close in
EVERY dimension into the same contiguous z-range, so after
``repartitionByRange(z)`` each file owns a small multi-dimensional tile:
selective predicates on ANY of the clustered dimensions skip most files
(file-level via min/max pruning, row-group-level via parquet stats).
At 100 TB this is the difference between a dashboard filter on
(user, time-window) opening 40 000 files and opening ~40.

Engine notes:
 * The z-value is a scalar expression chain (subtract, multiply, one
   correctly-rounded IEEE divide, floor, shift, bitwise OR) inside
   whole-stage codegen — no UDF; deterministic for the same data, so
   layouts are reproducible across runs (and the scale-before-truncate
   order keeps fractional-range columns on the curve).
 * Normalization bounds come from one broadcast 1-row aggregate; at scale
   you would compute them once per maintenance run (they need not be
   exact — stale bounds only skew tile sizes, never correctness).
 * The curve order itself is NEVER part of query results — queries read
   the files back through ordinary predicates; the layout is invisible
   except to the scan's file/row-group pruning. Losslessness is therefore
   the correctness contract (checksum equality), and pruning is the
   performance contract (distinct input_file_name counts).

The reference has no layout maintenance of its own (it delegates storage
to its vector store), so this is beyond-reference §2.J/K scope — the
standard lakehouse recipe (Delta OPTIMIZE ZORDER, Iceberg sort orders).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_value(
    df: DataFrame, cols: list[str], bits: int = 8, out_col: str = "zval"
) -> DataFrame:
    """Append a Morton z-value column interleaving ``bits`` bits of each
    (numeric, non-null) column in ``cols``. Columns are min-max
    normalized to [0, 2^bits):
    ``floor((v - min) * (2^bits - 1) / span)``, clamped — computed in
    DOUBLE so fractional-range columns normalize correctly (integer
    inputs up to 2^53·span/maxv stay exact; beyond that the layout only
    coarsens, never corrupts — z is routing, not results).

    Total z width is ``bits * len(cols)`` bits — keep it ≤ 62 so the
    value stays in a BIGINT (8 bits × 2 dims = 16 is plenty for file
    routing: finer z resolution than the file count adds nothing).
    """
    ndims = len(cols)
    if ndims == 0:
        raise ValueError("zorder_value needs at least one column")
    if bits * ndims > 62:
        raise ValueError(f"z width {bits * ndims} exceeds BIGINT range")

    # Column-expression construction throughout (round-5 ADVICE): no raw
    # name ever reaches an F.expr/SQL string, so names needing quoting
    # (spaces, dots, hyphens, keywords) work; bound aliases are indexed
    # (__zmin_0, ...), never name-derived.
    def _q(name: str) -> Column:
        return F.col("`" + name.replace("`", "``") + "`")

    aggs = []
    for i, c in enumerate(cols):
        aggs += [
            F.min(_q(c)).alias(f"__zmin_{i}"),
            F.max(_q(c)).alias(f"__zmax_{i}"),
        ]
    bounds = df.agg(*aggs)
    j = df.crossJoin(F.broadcast(bounds))
    maxv = (1 << bits) - 1
    norms: list[Column] = []
    for i, c in enumerate(cols):
        # scale BEFORE truncating: casting (v - min) to BIGINT first
        # collapses fractional-range columns (span < 1 → every norm 0,
        # silently dropping the dimension from the curve). The double
        # multiply/divide is correctly-rounded IEEE — deterministic for
        # the same data — and the floor lands back on an exact integer;
        # clamp covers the v == max edge and any last-ulp excursion.
        lo, hi = F.col(f"__zmin_{i}"), F.col(f"__zmax_{i}")
        span = (hi - lo).cast("double")
        scaled = F.floor((_q(c) - lo).cast("double") * maxv / span)
        clamped = F.least(F.greatest(scaled, F.lit(0)), F.lit(maxv)).cast("long")
        norms.append(
            F.when(span <= 0, F.lit(0).cast("long")).otherwise(clamped)
        )
    z: Column = F.lit(0).cast("long")
    for i in range(bits):
        for di, norm in enumerate(norms):
            bit = F.shiftrightunsigned(norm, i).bitwiseAND(F.lit(1).cast("long"))
            z = z.bitwiseOR(F.shiftleft(bit, i * ndims + di))
    out = j.withColumn(out_col, z)
    return out.drop(
        *[f"__zmin_{i}" for i in range(ndims)],
        *[f"__zmax_{i}" for i in range(ndims)],
    )


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 16,
    bits: int = 8,
) -> None:
    """Cluster ``df`` on the z-curve of ``cols`` and write ``path`` as
    ~``n_files`` parquet files, each owning one contiguous z-range (a
    multi-dimensional tile). ``sortWithinPartitions`` additionally sorts
    rows inside each file so parquet row-group min/max stats stay tight
    on every clustered dimension. The helper z column never reaches disk.
    """
    zdf = zorder_value(df, cols, bits=bits)
    (
        zdf.repartitionByRange(n_files, "zval")
        .sortWithinPartitions("zval")
        .drop("zval")
        .write.parquet(path)
    )
