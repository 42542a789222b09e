"""Parquet table access for the driver's testdata layout (TESTDATA.md).

All readers are plain ``spark.read.parquet`` — Catalyst gets full pushdown
(column pruning + predicate pushdown + partition pruning when the layout is
partitioned). Never collect here.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from chatbot_spark.schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# Inferred-schema memo for the testdata loader, keyed (path, listing):
# schema inference reads parquet footers on the driver (~100 ms per
# read.parquet vs ~30 ms schema-supplied — measured r13), and a bench /
# parity sweep calls load_table hundreds of times on the SAME immutable
# tables. The key carries every entry's (name, size, mtime_ns), so any
# rewrite — even within a 1 s mtime tick — changes the key and drops
# the entry (r13 ADVICE). This memoizes plan METADATA only — every
# query still scans the parquet.
_SCHEMA_MEMO: dict = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one synthetic table, e.g. load_table(spark, sf_dir, "lineitem").

    events.ts is TIMESTAMP(NANOS) in the parquet — Spark reads it as a
    nanos LONG (session conf nanosAsLong) and we convert to a proper
    timestamp at microsecond precision (what DuckDB also resolves to)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    if name == "events":
        # events.parquet stores ts as TIMESTAMP(NANOS). Spark cannot read
        # that type natively and throws PARQUET_TYPE_ILLEGAL unless the
        # legacy nanosAsLong conf is on. The conf is runtime-settable, and
        # callers (e.g. the grading driver) build their OWN SparkSession
        # without chatbot_spark.session.get_spark — so set it here, at the
        # point of use, not only at session-build time.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # The testdata timestamps are naive parquet TIMESTAMP(MICROS)
    # (isAdjustedToUTC=false); Spark 4 infers those as TIMESTAMP_NTZ by
    # default, which unix_micros/to_utc_timestamp-free arithmetic rejects.
    # The whole workload (and the DuckDB oracle, in a UTC session) treats
    # stored micros as epoch micros, so read them as TIMESTAMP_LTZ — the
    # raw stored value is preserved bit-for-bit either way.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        # key on the full listing (name, size, mtime_ns per entry), not
        # just the directory mtime: a rewrite within one mtime tick (1 s
        # granularity filesystems) would otherwise serve a stale schema
        # to spark.read.schema() (r13 ADVICE). One listdir per call —
        # same order of cost as the getmtime it replaces.
        with os.scandir(path) as it:
            listing = tuple(
                sorted(
                    (e.name, e.stat().st_size, e.stat().st_mtime_ns)
                    for e in it
                )
            )
        key = (path, listing)
    except OSError:
        key = None  # non-local or missing: plain inferring read below
    if key is not None and key in _SCHEMA_MEMO:
        df = spark.read.schema(_SCHEMA_MEMO[key]).parquet(path)
    else:
        df = spark.read.parquet(path)
        if key is not None:
            _SCHEMA_MEMO[key] = df.schema
            while len(_SCHEMA_MEMO) > 64:
                _SCHEMA_MEMO.pop(next(iter(_SCHEMA_MEMO)))
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        # integer div, NOT floor(x/1000): epoch-nanos (~1.7e18) overflow
        # DOUBLE precision (2^53) and the float division is off by ±1 µs
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def spread(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Round-robin repartition a small scan for CPU-bound narrow maps.

    Spark splits input by BYTES (maxPartitionBytes), which is right when
    scan cost dominates — but a heavily compressed columnar text table can
    be one partition while the per-row expression work (higher-order
    lambdas, regex chains, n-gram builds) is minutes of CPU: one task, 31
    idle cores. Spreading costs one tiny exchange of the source rows and
    buys full parallelism (measured 7.4 s → 1.8 s for repetition_stats at
    sf0.1). At production scale file count supplies the parallelism and
    the default (defaultParallelism) keeps this a cheap no-op-ish rebalance;
    never use it on scans where pushdown/locality matter more than CPU.
    """
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every testdata table as a temp view (SQL surface, SURVEY §2.K)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs


def upsert_latest(
    base: DataFrame,
    updates: DataFrame,
    id_col: str = "id",
    version_col: str = "version",
) -> DataFrame:
    """A9 upsert semantics (the reference's add_documents replaces rows by
    id, doc_embedder.py:90-114): keep the LATEST version of each id across
    base ∪ updates — union + one per-id window, no driver round-trip.

    Ties on version are broken toward ``updates`` (marked as the later
    source), matching replace-on-conflict semantics. At scale this is one
    shuffle on id; with both sides bucketed on id (write_bucketed) the
    exchange disappears entirely.
    """
    from pyspark.sql import Window

    tagged = base.withColumn("__src", F.lit(0)).unionByName(
        updates.withColumn("__src", F.lit(1))
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col(version_col).desc(), F.col("__src").desc()
    )
    return (
        tagged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )


def compact_parquet(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    n_files: int | None = None,
    max_records_per_file: int | None = None,
) -> DataFrame:
    """Small-file compaction — the table-maintenance operator every
    streaming/append ingest needs at scale: micro-batch sinks and
    per-partition appends leave thousands of KB-sized files, and at 100 TB
    the NameNode/listing and per-file open costs dominate scan time long
    before the bytes do.

    One distributed pass: read → ``repartition(n_files)`` (round-robin,
    balanced output sizes) and/or ``maxRecordsPerFile`` (bounds the large
    end) → write to ``dst_path``. Never compacts in place — readers of
    ``src_path`` are unaffected until the swap, and a failed compaction
    leaves the source intact (the swap is the caller's atomic step).
    Returns the compacted DataFrame (reader of ``dst_path``)."""
    import os

    if os.path.abspath(dst_path) == os.path.abspath(src_path):
        raise ValueError(
            f"compact_parquet: dst_path == src_path ({src_path!r}) — in-place "
            "compaction would overwrite the source while lazily reading it; "
            "write to a sibling path and swap atomically instead"
        )
    df = spark.read.parquet(src_path)
    if n_files:
        df = df.repartition(n_files)
    writer = df.write.mode("overwrite")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(dst_path)
    return spark.read.parquet(dst_path)


def write_corpus(df: DataFrame, path: str, mode: str = "append") -> None:
    """Write the corpus/vector table partitioned like the reference's LIST
    partitions (src/rag/doc_embedder.py:82-86) so component predicates
    resolve to Parquet partition pruning."""
    df.write.mode(mode).partitionBy("component_code").parquet(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table for co-located joins: two tables bucketed on
    the same key with the same bucket count join WITHOUT a shuffle (the
    exchange is replaced by bucket-aligned scans). At 100 TB this is how
    repeated fact-fact joins (lineitem⋈orders every query) amortize their
    shuffle to write time — the Spark analog of co-partitioned storage.
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name)


def merge_into(
    base: DataFrame,
    source: DataFrame,
    on: list[str],
    when_matched_update: dict[str, Column] | None = None,
    when_matched_delete: Column | None = None,
    when_not_matched_insert: dict[str, Column] | None = None,
    update_condition: Column | None = None,
    insert_condition: Column | None = None,
) -> DataFrame:
    """General MERGE INTO (the Delta/Iceberg mutation primitive,
    generalizing :func:`upsert_latest`'s keep-latest special case):

    * matched + ``when_matched_delete`` condition true → row dropped;
    * matched otherwise → ``when_matched_update`` column map applied
      (gated by ``update_condition`` if given; unlisted columns keep
      their target values);
    * source-only → inserted (``when_not_matched_insert`` map, or the
      source row verbatim), gated by ``insert_condition`` if given
      (WHEN NOT MATCHED AND <cond> THEN INSERT — failing rows simply
      don't insert);
    * target-only → kept unchanged.

    Clause expressions reference the two sides as ``t.<col>`` (target)
    and ``s.<col>`` (source), exactly like MERGE USING aliases.

    Execution: ONE full-outer join on the key columns plus a CASE
    projection — the canonical MERGE shuffle. With the base bucketed on
    the keys (``write_bucketed``) the exchange on the target side
    disappears, which is what makes nightly 100 TB merges viable; at
    write time pair this with the versioned-commit protocol
    (streaming/events.py::upsert_state_writer) for atomicity.

    MERGE semantics require the source to bind at most one row per key —
    ambiguous matches are rejected (the Delta cardinality-violation
    rule) with a distributed check that adds one cheap aggregate over
    the source only.
    """
    dup = (
        source.groupBy(*on).count().filter(F.col("count") > 1).limit(1).count()
    )
    if dup:
        raise ValueError(
            "MERGE source has multiple rows per key (cardinality violation)"
        )
    # string-qualified t./s. references (not DataFrame attribute access):
    # base and source often derive from the SAME table (a change feed is
    # a self-join), where attribute ids collide and only alias-qualified
    # names disambiguate
    t = base.alias("t")
    s = source.alias("s")

    def tc(c: str) -> Column:
        return F.col(f"t.{c}")

    def sc(c: str) -> Column:
        return F.col(f"s.{c}")

    # presence markers, not key-null checks: the join is eqNullSafe (NULL
    # keys DO match), so "matched" must mean "a row existed on both
    # sides" — keying it off key-nullness would misread a null-key match
    # as a source-only insert
    t = t.withColumn("__t_present", F.lit(True)).alias("t")
    s = s.withColumn("__s_present", F.lit(True)).alias("s")
    cond = [tc(c).eqNullSafe(sc(c)) for c in on]
    joined = t.join(s, cond, "full_outer")
    matched = F.col("t.__t_present").isNotNull() & F.col("s.__s_present").isNotNull()
    src_only = F.col("t.__t_present").isNull()

    # a NULL clause condition means "clause does not fire" (SQL 3VL —
    # same routing the update gate gets from CASE), never "delete"
    delete_now = (
        matched & F.coalesce(when_matched_delete, F.lit(False))
        if when_matched_delete is not None
        else F.lit(False)
    )
    upd_gate = update_condition if update_condition is not None else F.lit(True)
    # WHEN NOT MATCHED [AND <cond>] THEN INSERT — a source-only row
    # failing (or NULL-ing) the condition simply does not insert
    skip_insert = (
        src_only & ~F.coalesce(insert_condition, F.lit(False))
        if insert_condition is not None
        else F.lit(False)
    )
    updates = when_matched_update or {}
    inserts = when_not_matched_insert or {
        c: sc(c) for c in base.columns if c in source.columns
    }

    out_cols = []
    for c in base.columns:
        upd_expr = updates.get(c, tc(c))
        ins_expr = inserts.get(c, F.lit(None).cast(base.schema[c].dataType))
        val = (
            F.when(src_only, ins_expr)
            .when(matched & upd_gate, upd_expr)
            .otherwise(tc(c))
        )
        if c in on:
            # keys are identical on both sides where matched; coalesce
            # covers the target-only / source-only branches
            val = F.coalesce(tc(c), sc(c))
        out_cols.append(val.alias(c))
    return joined.filter(~delete_now & ~skip_insert).select(*out_cols)


def collect_table_stats(
    df: DataFrame, cols: list[str] | None = None, ndv_mode: str = "approx"
) -> DataFrame:
    """ANALYZE TABLE: per-column (n_rows, n_nulls, n_distinct, min, max)
    in ONE scan — the statistics surface a cost-based planner and a
    file-skipping index consume (Spark's own ANALYZE ... COMPUTE
    STATISTICS FOR COLUMNS writes these to the catalog; this returns
    them as a DataFrame so pipelines can persist/diff them).

    All per-column aggregates ride a single ``agg`` (one pass over the
    data); the wide 1-row result then unpivots to (column, …) rows via
    stack — driver never sees data, only the k×5 summary. min/max are
    computed in NATIVE column order and cast to string afterwards for
    the uniform schema, so numerics don't sort lexicographically.

    ``ndv_mode``: "approx" (default — HLL, constant memory, the 100 TB
    setting) or "exact" (count distinct; each exact column multiplies
    the aggregate's Expand by one, the usual COUNT(DISTINCT) cost).
    """
    if ndv_mode not in ("approx", "exact"):
        raise ValueError("ndv_mode must be 'approx' or 'exact'")
    cols = cols or df.columns
    ndv = F.countDistinct if ndv_mode == "exact" else (
        lambda c: F.approx_count_distinct(c)
    )
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"__nn_{c}"),
            ndv(c).alias(f"__ndv_{c}"),
            F.min(c).cast("string").alias(f"__min_{c}"),
            F.max(c).cast("string").alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)
    stacked = ", ".join(
        f"'{c}', __nn_{c}, __ndv_{c}, __min_{c}, __max_{c}" for c in cols
    )
    return wide.select(
        F.col("__n").alias("n_rows"),
        F.expr(
            f"stack({len(cols)}, {stacked}) "
            "AS (column_name, n_nonnull, n_distinct, min_value, max_value)"
        ),
    ).select(
        "column_name",
        F.col("n_rows").cast("long").alias("n_rows"),
        (F.col("n_rows") - F.col("n_nonnull")).cast("long").alias("n_nulls"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        "min_value",
        "max_value",
    )


def apply_cdc(
    base: DataFrame,
    changes: DataFrame,
    on: list[str],
    seq_col: str,
    op_col: str = "op",
) -> DataFrame:
    """Apply a change-data-capture feed (the Delta CDF / Debezium apply
    shape): ``changes`` may carry MANY ordered operations per key —
    inserts/updates (``op IN ('I','U')``) and deletes (``'D'``) — and
    only the LAST operation per key (by ``seq_col``; on a sequence tie
    the delete wins — 'D' sorts first ascending — and any remaining tie
    between identical (seq, op) rows, e.g. a retried delivery with
    divergent payloads, breaks on the payload columns so the survivor is
    deterministic, never shuffle-order luck) decides the key's fate.
    That compaction is one window over the feed (the feed is usually a
    sliver of the table); the survivor set then applies through
    :func:`merge_into`, whose one-row-per-key contract the compaction
    establishes by construction and whose ``insert_condition`` drops
    phantom keys (a never-existing key whose last op is a delete) at the
    clause level. ``changes`` must carry every base column (plus
    ``seq_col``/``op_col``) — the update clause reads them all.

    At 100 TB: window shuffle = O(feed), merge shuffle = the usual MERGE
    full-outer on the keys — the standard nightly CDC-apply cost."""
    from pyspark.sql import Window

    payload = [c for c in changes.columns if c not in (*on, seq_col, op_col)]
    w = Window.partitionBy(*on).orderBy(
        F.col(seq_col).desc(),
        F.col(op_col).asc(),
        *[F.col(c).asc_nulls_last() for c in payload],
    )
    last = (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    return merge_into(
        base,
        last,
        on=on,
        when_matched_update={
            c: F.col(f"s.{c}") for c in base.columns if c not in on
        },
        when_matched_delete=F.col(f"s.{op_col}") == "D",
        insert_condition=F.col(f"s.{op_col}") != "D",
    )
