"""Mergeable fixed-precision quantile sketch (HdrHistogram-style) —
the percentile statistic that survives 100 TB.

The exact equi-depth operator (histogram.py) shuffles every distinct
value; correct, but a per-day / per-source percentile dashboard over a
petabyte corpus cannot rescan history for each question. The classic
answer (Gil Tene's HdrHistogram; the same log-bucketing idea underlies
Prometheus native histograms and DDSketch) is a FIXED-SIZE, MERGEABLE
histogram over log-spaced buckets with bounded RELATIVE error:

    quantize(v) keeps the top ``sub_bits + 1`` significant bits of v
    (values with fewer bits pass through exactly), i.e. rounds v DOWN
    onto a grid whose step doubles every octave — relative error
    < 2^-sub_bits, bucket count <= (64 - sub_bits) * 2^sub_bits + 1
    regardless of data volume.

Because the quantized value is itself the bucket id (monotone in v),
sketches are plain (group, qv, cnt) tables: MERGE is groupBy-sum —
associative, commutative, partition-order-independent — so a pipeline
stores one tiny sketch per (group, batch) and answers percentiles over
ANY group/time slice by merging O(buckets) rows, never rescanning the
corpus. That storage shape is the whole point at scale: the raw scan
runs once per batch (map-side combinable agg), every later question is
O(buckets).

Everything is BIGINT arithmetic — `length(bin(v))` for the exponent,
integer shift/divide for the mantissa truncation, integer ceil for the
rank — so the result is bit-identical on any engine and the DuckDB
oracle replays it exactly (no SLO slack needed, unlike HLL/CMS).

Reference scope: beyond-reference §2.D family (the reference's OceanBase
backend keeps internal stats; percentile sketches are the queryable
analog a training-data pipeline needs for length/latency/score
distributions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["hdr_quantize", "hdr_sketch", "hdr_merge", "hdr_quantiles"]


def hdr_quantize(col, sub_bits: int = 5):
    """Round a non-negative BIGINT column down onto the HdrHistogram
    grid: keep the top ``sub_bits + 1`` significant bits, zero the rest.
    0 maps to 0. Relative error of the representative (the bucket's
    lower bound) is < 2^-sub_bits. Pure integer Column expression
    (length-of-binary exponent + variable shiftleft), no floats.

    Negative inputs raise at execution time: bin(v) of a negative long
    is the 64-char two's-complement string, so the silent alternative
    would be e=63 → drop=58 → v - v%2^58 = 0 for small negatives —
    corrupting the 0 bucket forever once a sketch store persists it."""
    raw = col.cast("long")
    v = F.when(
        raw < 0, F.raise_error(F.lit("hdr_quantize: negative input"))
    ).otherwise(raw)
    # e = floor(log2(v)) for v >= 1, via the binary-string length —
    # float log2 misrounds near powers of two (log2(2^52 - 1) rounds to
    # 52.0 in double), the string length cannot
    e = (F.length(F.bin(v)) - F.lit(1)).cast("int")
    drop = F.greatest(e - F.lit(int(sub_bits)), F.lit(0))
    # step = 2^drop: double pow is EXACT for powers of two (one set
    # mantissa bit) and drop <= 58 here, so the long cast is lossless —
    # avoids shiftleft, whose pyspark wrapper only takes int literals
    step = F.pow(F.lit(2.0), drop.cast("double")).cast("long")
    return (v - v % step).alias("qv")


def hdr_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    sub_bits: int = 5,
) -> DataFrame:
    """(group..., qv, cnt) — ONE map-side-combinable aggregation over the
    raw data; the only shuffle is keyed by (group, qv), whose
    cardinality is bounded by groups x buckets, not rows. ``value_col``
    must be non-negative integral (scale floats to cents first — the
    exactness contract shared with histogram.py)."""
    group_cols = list(group_cols or [])
    return (
        df.select(
            *group_cols, hdr_quantize(F.col(value_col), sub_bits)
        )
        .groupBy(*group_cols, "qv")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def hdr_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with the SAME sub_bits (and, when collapsing
    a batch/time dimension, project it away first): union + groupBy-sum.
    Associative and commutative, so any merge tree gives the same table
    — the property that lets a store hold per-(group, day) sketches and
    serve any slice."""
    if not sketches:
        raise ValueError("need at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    keys = [c for c in out.columns if c not in ("cnt",)]
    return out.groupBy(*keys).agg(F.sum("cnt").cast("long").alias("cnt"))


def hdr_quantiles(
    sketch: DataFrame,
    q_ppm: list[int],
    group_cols: list[str] | None = None,
) -> DataFrame:
    """(group..., q_ppm, rank_target, quantile) — the discrete lower
    quantile per group for each requested q (parts-per-million, e.g.
    500000 = p50): the smallest quantized value whose cumulative count
    reaches rank r = max(1, ceil(q * N / 1e6)), found with the same
    (cum - cnt, cum] interval join the exact equi-depth operator uses —
    no global sort, no driver state. All-BIGINT: the integer ceil is
    decomposed as r = q*(N div 1e6) + ((q*(N mod 1e6) + 999999) div 1e6)
    — algebraically identical to ceil(q*N/1e6) but the partial products
    stay < 1e12 and < q*(N div 1e6), so the rank never wraps BIGINT
    until N itself exceeds ~9.2e18/q rows (vs ~9.3e12 for the naive
    q*N product — reachable at 100 TB). Replays bit-for-bit; the
    DuckDB oracle keeps the naive form, pinning the equivalence.

    The returned ``quantile`` is the bucket lower bound — an actual
    grid value <= the true quantile, within relative 2^-sub_bits of it
    by construction.

    Scale note: the cumulative window partitions by ``group_cols``; with
    no groups it is a single-partition window — over a SKETCH, whose row
    count is bounded at <= ~1900 buckets by construction, not over data.
    That bound is the whole point: the unbounded-input work happened in
    hdr_sketch's map-side-combinable aggregation."""
    group_cols = list(group_cols or [])
    from pyspark.sql import Window

    win = Window.partitionBy(*group_cols).orderBy("qv").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = sketch.select(
        *group_cols, "qv", "cnt", F.sum("cnt").over(win).alias("cum")
    )
    totals = sketch.groupBy(*group_cols).agg(
        F.sum("cnt").cast("long").alias("__n")
    )
    qs = F.explode(
        F.array(*[F.lit(int(q)).cast("long") for q in q_ppm])
    ).alias("q_ppm")
    ranks = totals.select(*group_cols, "__n", qs).select(
        *group_cols,
        "q_ppm",
        F.greatest(
            F.expr(
                "q_ppm * (__n div 1000000)"
                " + ((q_ppm * (__n % 1000000) + 999999) div 1000000)"
            ),
            F.lit(1).cast("long"),
        ).alias("rank_target"),
    )
    hit = (F.col("cum") - F.col("cnt") < F.col("rank_target")) & (
        F.col("rank_target") <= F.col("cum")
    )
    joined = (
        cum.join(F.broadcast(ranks), on=group_cols, how="inner")
        if group_cols
        else cum.crossJoin(F.broadcast(ranks))
    )
    return joined.filter(hit).select(
        *group_cols, "q_ppm", "rank_target", F.col("qv").alias("quantile")
    )
