"""Count–min sketch as relational state (beyond-reference §2.J scope).

Heavy-hitter counting at 100 TB can't afford an exact per-key groupBy when
the key space is unbounded (URLs, user ids, n-grams). The CMS answer: a
fixed depth×width grid of counters; every occurrence increments one bucket
per row (depth independent hashes); the estimate for a key is the MIN of
its buckets — always ≥ the true count, over by at most ~N/width w.h.p.

Spark-first shape — the sketch IS a DataFrame of (row_idx, bucket, cnt):

 * build: each input row expands to `depth` cells in-stage (explode is
   pipelined, never materialized); map-side partial aggregation collapses
   a whole input partition to ≤ depth·width cells BEFORE the shuffle, so
   the exchange moves sketch-sized state, not data-sized;
 * merge: sketches over different batches/days union + re-sum per cell —
   the mergeability that makes CMS the incremental/streaming shape (the
   HLL counterpart of `incremental_distinct_hll`);
 * estimate: probe keys hash to their `depth` coordinates and join the
   sketch (broadcast — it is ≤ depth·width rows by construction), min
   over rows. Absent cells mean count 0.

Hashing is md5-derived (`_hash32` family), so every counter — and every
estimate — is bit-reproducible by the DuckDB oracle: the sketch's accuracy
contract (est ≥ exact, bounded overcount) is driver-checkable, not a
trust-me property.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from chatbot_spark.operators.dedup import _hash32


def _cell_coords(key, depth: int, width: int):
    """ARRAY<STRUCT<row_idx, bucket>> — the key's one bucket per row.
    hash_j(k) = first md5 word of "j:k", mod width (portable)."""
    return F.array(
        *[
            F.struct(
                F.lit(j).alias("row_idx"),
                (_hash32(F.concat(F.lit(f"{j}:"), key.cast("string")), 1) % width)
                .cast("int")
                .alias("bucket"),
            )
            for j in range(depth)
        ]
    )


def cms_build(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 64
) -> DataFrame:
    """Build the sketch: (row_idx, bucket, cnt, depth, width) — ≤
    depth·width counter rows, with the grid dimensions CARRIED IN-BAND so
    merge/estimate can verify they were built compatibly (probing a d×w
    sketch with d'×w' coordinates hashes to wrong buckets and silently
    breaks the est ≥ exact guarantee — a validated error, not an
    accuracy loss)."""
    return (
        df.select(F.explode(_cell_coords(F.col(key_col), depth, width)).alias("h"))
        .groupBy(F.col("h.row_idx").alias("row_idx"), F.col("h.bucket").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
        .withColumns({"depth": F.lit(depth), "width": F.lit(width)})
    )


def _dims_guard(df: DataFrame, sketch: DataFrame, depth: int, width: int) -> DataFrame:
    """Lazily verify `sketch` was built with (depth, width): a broadcast
    1-row dims aggregate crossJoins in, and an assert_true expression
    raises AT EXECUTION on any mismatch — plan construction stays lazy and
    the check costs one tiny aggregate of an already-bounded frame."""
    meta = sketch.agg(
        F.count_distinct("depth", "width").alias("__ndims"),
        F.max("depth").alias("__d"),
        F.max("width").alias("__w"),
    )
    ok = (
        (F.col("__ndims") <= 1)
        & F.coalesce(F.col("__d") == depth, F.lit(True))
        & F.coalesce(F.col("__w") == width, F.lit(True))
    )
    guard = F.assert_true(
        ok,
        F.concat_ws(
            " ",
            F.lit("CMS dimension mismatch: sketch built with"),
            F.col("__d").cast("string"),
            F.lit("x"),
            F.col("__w").cast("string"),
            F.lit(f"probed/merged with {depth}x{width}"),
        ),
    )
    return (
        df.crossJoin(F.broadcast(meta))
        .withColumn("__dims_ok", guard)
        .filter(F.col("__dims_ok").isNull())
        .drop("__ndims", "__d", "__w", "__dims_ok")
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Union partial sketches (per-batch / per-day) into one: sum cells.
    Raises at execution if the sketches' (depth, width) disagree."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    merged = out.groupBy("row_idx", "bucket", "depth", "width").agg(
        F.sum("cnt").alias("cnt")
    )
    # a dims mismatch survives the groupBy as >1 distinct (depth, width)
    meta = out.agg(F.count_distinct("depth", "width").alias("__ndims"))
    guard = F.assert_true(
        F.col("__ndims") <= 1, F.lit("CMS merge of differently-sized sketches")
    )
    return (
        merged.crossJoin(F.broadcast(meta))
        .withColumn("__dims_ok", guard)
        .filter(F.col("__dims_ok").isNull())
        .drop("__ndims", "__dims_ok")
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Point-query the sketch for every probe key → (key_col, est).

    The sketch side is broadcast (bounded at depth·width cells); the probe
    explode is transient in-stage; one small groupBy(key) finishes.
    Raises at execution if the sketch carries different (depth, width)
    than the probe coordinates are computed with.
    """
    coords = probes.select(
        F.col(key_col), F.explode(_cell_coords(F.col(key_col), depth, width)).alias("h")
    ).select(key_col, "h.row_idx", "h.bucket")
    cells = sketch.select("row_idx", "bucket", "cnt")
    joined = coords.join(F.broadcast(cells), ["row_idx", "bucket"], "left").select(
        key_col, F.coalesce(F.col("cnt"), F.lit(0)).alias("cell_cnt")
    )
    est = joined.groupBy(key_col).agg(F.min("cell_cnt").alias("est"))
    return _dims_guard(est, sketch, depth, width)
