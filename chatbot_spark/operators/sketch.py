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


# ----------------------------------------------------------------- KMV
# k-minimum-values distinct sketch (Bar-Yossef et al. 2002; the θ-sketch
# family's simplest member). Where HLL gives approximate counts that no
# SQL oracle can replay (register layouts are engine-internal), KMV is a
# DETERMINISTIC function of the data — the k smallest distinct md5s —
# so estimates, merges and set operations are all bit-exact replayable.
# Its extra power over HLL: sketches of different sets INTERSECT
# (Jaccard/overlap estimates), which count-only sketches cannot do.

def kmv_sketch(
    df: DataFrame, key_cols: list[str], value_col, k: int = 128
) -> DataFrame:
    """Per key group: the ``k`` lexicographically smallest distinct
    md5(value) hex strings (fixed-width lowercase hex ⇒ string order ==
    128-bit numeric order) as a sorted ARRAY<STRING> — (key, kmv) rows,
    ≤ k·32 bytes per key.

    Two-phase skew-safe top-k: a first window keyed by
    (key, spark_partition_id) prunes every input partition to ≤ k rows
    per key BEFORE the global per-key window — a hot key's distinct
    hashes spread over all its partitions instead of funneling one
    reducer (the salted-window shape of operators/topk.py). Map-side
    partial aggregation already collapses the initial distinct."""
    from pyspark.sql import Window

    h = df.select(
        *key_cols, F.md5(F.col(value_col).cast("string")).alias("h")
    ).distinct()
    pre = h.withColumn("__pid", F.spark_partition_id())
    w1 = Window.partitionBy(*key_cols, "__pid").orderBy("h")
    w2 = Window.partitionBy(*key_cols).orderBy("h")
    return (
        pre.withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= k)
        .withColumn("__rn", F.row_number().over(w2))
        .filter(F.col("__rn") <= k)
        .groupBy(*key_cols)
        .agg(F.sort_array(F.collect_list("h")).alias("kmv"))
    )


def kmv_estimate(kmv, k: int):
    """Distinct-count estimate from a sorted KMV array: exact size when
    the group had < k distinct values; else the classic (k−1)/θ with
    θ = first-32-bits(h_k)/2³². Every input is an exact integer, the one
    division is deterministic IEEE — engines agree on the double.

    Degenerate guard (round-5 ADVICE): if h_k's first 32 bits are all
    zero (P ≈ 2⁻³² per sketch) the division would be Inf, and a NULL
    from conv() on malformed input would silently NULL the estimate —
    both fall back to the finite, deterministic size(kmv) instead, and
    every oracle replays the same CASE so parity stays bit-exact."""
    # try_element_at: the short branch guards size < k, but ANSI
    # element_at would still be an error surface on malformed input
    hk_val = F.conv(
        F.substring(F.try_element_at(kmv, F.lit(k)), 1, 8), 16, 10
    ).cast("long")
    return F.when(F.size(kmv) < k, F.size(kmv).cast("double")).otherwise(
        F.when(
            hk_val > 0, F.lit(float(k - 1)) * F.lit(float(2**32)) / hk_val
        ).otherwise(F.size(kmv).cast("double"))
    )


def kmv_merge(a, b, k: int):
    """Union of two sketches = the k smallest of the deduped hash union —
    closed under merge (the property that makes KMV the incremental /
    per-batch shape, like cms_merge for counters)."""
    return F.slice(F.array_sort(F.array_union(a, b)), 1, k)


def kmv_jaccard(a, b, k: int):
    """Jaccard estimate for the two underlying sets: over the merged
    sketch U (k smallest of a ∪ b), the fraction of U's hashes present
    in BOTH input sketches — deterministic, so oracle-replayable."""
    u = kmv_merge(a, b, k)
    inter = F.size(
        F.filter(u, lambda x: F.array_contains(a, x) & F.array_contains(b, x))
    )
    return inter.cast("double") / F.size(u)
