"""Structured Streaming ingest + windowed aggregation (extension beyond
the reference — SURVEY §1.2 notes the reference has no data-stream surface;
its "streaming" is LLM token streaming. This module is the engine's
streaming path for the events table shape.)

Batch/stream parity: events_hourly / sessionize in chatbot_spark.workload
are the batch twins of these plans — same grouping keys, same outputs, so
a backfill (batch) and the live stream produce unionable tables.

Scale notes: watermarks bound state; the hourly agg state is
O(active windows × event types); session windows use Spark's built-in
session_window with the same 30-min gap as the batch sessionizer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chatbot_spark.schemas import TESTDATA_TABLES  # noqa: F401  (doc link)

EVENT_SCHEMA = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, props STRING"


def read_event_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream of event parquet drops (swap for Kafka in prod —
    same downstream plan)."""
    reader = spark.readStream.schema(EVENT_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def hourly_rollup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming twin of workload.events_hourly: tumbling 1-hour window +
    per-type counts; watermark bounds late data and state size."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.approx_count_distinct("user_id").alias("approx_users"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_value_cents"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:00:00").alias("hour"),
            "event_type",
            "n_events",
            "approx_users",
            "sum_value_cents",
        )
    )


def hopping_rollup(
    events: DataFrame,
    duration: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming twin of workload.events_hopping_window: overlapping
    (hopping) windows — each row lands in duration/slide windows; state
    is per-(window, type) and the watermark bounds how many window
    generations stay open, exactly as for tumbling windows."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", duration, slide).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_value_cents"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:00").alias("win_start"),
            "event_type",
            "n_events",
            "sum_value_cents",
        )
    )


def session_rollup(events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    """Streaming sessionization with the built-in session_window — same
    30-min gap as the batch lag/cumsum sessionizer (workload.sessionize)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def dedup_stream(
    events: DataFrame, keys: tuple[str, ...] = ("event_id",), watermark: str | None = None
) -> DataFrame:
    """Streaming exact deduplication across micro-batches (J1's streaming
    twin): first occurrence of each key wins, duplicates arriving in ANY
    later micro-batch are dropped via the dedup state store.

    ``watermark=None`` keeps state forever — deterministic, the parity
    surface (oracle = batch DISTINCT). With a watermark the state is
    bounded via ``dropDuplicatesWithinWatermark`` — the 100 TB/day
    production mode, where a key's dedup guarantee holds within the
    watermark horizon (exactly the contract log pipelines need: dups
    arrive close together; state doesn't grow with stream lifetime)."""
    if watermark is None:
        return events.dropDuplicates(list(keys))
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(list(keys))


def run_stream_once(stream_df: DataFrame, checkpoint: str, output_path: str) -> None:
    """Drain all available input (Trigger.AvailableNow) to parquet — the
    test/backfill mode; production uses a continuous trigger."""
    q = (
        stream_df.writeStream.format("parquet")
        .option("checkpointLocation", checkpoint)
        .option("path", output_path)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_stream_once_complete(stream_df: DataFrame, checkpoint: str) -> list:
    """Drain aggregating streams (complete mode) to an in-memory table and
    return the rows — used by tests to check batch/stream parity."""
    import uuid

    # unique sink per drain — a fixed name collides across queries in one
    # session and would silently serve another stream's table
    sink = f"stream_sink_{uuid.uuid4().hex[:12]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(sink)
        .option("checkpointLocation", checkpoint)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark = stream_df.sparkSession
    rows = spark.sql(f"SELECT * FROM {sink}").collect()
    spark.catalog.dropTempView(sink)
    return rows


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    max_delay: str = "2 hours",
    watermark: str = "31 days",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join with an event-time interval condition: right
    events within (left.ts, left.ts + max_delay], equi-keyed on ``on`` —
    the funnel/attribution shape (click → purchase within 2 h).

    Both sides carry watermarks: inner-join matches emit as soon as both
    rows have arrived (append mode, no completion wait), and the watermark
    + time-range condition is what lets Spark EVICT buffered rows once
    they can no longer match — state is O(events within the watermark
    horizon), not O(stream). The default watermark here is generous (the
    parity tests replay a month of history out of order across
    micro-batches and must lose nothing); production attribution would run
    with a watermark just above ``max_delay``.

    ``how="left_outer"`` additionally emits (left, NULL) for every left
    row that found no match — but only once the watermark passes
    left.ts + max_delay, because until then a match could still arrive.
    Consequence for bounded drains (AvailableNow): rows near the end of
    input never see the watermark pass them, so their outer results stay
    buffered forever. Callers must append a far-future sentinel row to
    BOTH input streams (and filter it out downstream) to push the
    watermark past all real data; the `stream_left_outer_join` workload
    query shows the pattern. Production continuous streams don't need
    this — new data advances the watermark naturally.
    """
    l = left.withWatermark("ts", watermark).select(
        F.col(on).alias("__lk"),
        F.col("ts").alias("left_ts"),
        F.col("event_id").alias("left_id"),
    )
    r = right.withWatermark("ts", watermark).select(
        F.col(on).alias("__rk"),
        F.col("ts").alias("right_ts"),
        F.col("event_id").alias("right_id"),
    )
    return l.join(
        r,
        (F.col("__lk") == F.col("__rk"))
        & (F.col("right_ts") >= F.col("left_ts"))
        & (F.col("right_ts") <= F.col("left_ts") + F.expr(f"INTERVAL {max_delay}")),
        how,
    ).select(
        F.col("__lk").alias(on), "left_ts", "left_id", "right_ts", "right_id"
    )


def enrich_join_static(events: DataFrame, dim: DataFrame, on: str = "user_id") -> DataFrame:
    """Stream-static join: every micro-batch joins against the (broadcast)
    static dimension — the streaming analog of the batch dim join, no
    state, no watermark needed (the static side is re-read per trigger if
    its source changes)."""
    return events.join(F.broadcast(dim), on)


def idempotent_batch_writer(out_path: str):
    """foreachBatch writer with exactly-once-on-replay semantics.

    Structured Streaming guarantees at-least-once foreachBatch invocation:
    after a crash between sink-write and checkpoint-commit, the SAME
    (batch_id, data) is replayed. Writing each micro-batch into its own
    ``batch_id=N`` partition with DYNAMIC partition overwrite makes the
    replay overwrite its previous attempt instead of appending a
    duplicate — idempotence without a transactional table format. (With a
    real lakehouse sink, swap the body for MERGE keyed on a batch column;
    the batch_id contract is identical.)
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_path)
        )

    return write_batch


def drain_to_idempotent_sink(
    stream_df: DataFrame, out_path: str, checkpoint: str
) -> None:
    """AvailableNow drain through the idempotent foreachBatch sink."""
    q = (
        stream_df.writeStream.foreachBatch(idempotent_batch_writer(out_path))
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def upsert_state_writer(
    state_dir: str,
    id_col: str,
    version_col: str,
    run_token: str | None = None,
):
    """foreachBatch MERGE-maintenance: each micro-batch upserts into a
    keep-latest table, versioned with a commit pointer — the lakehouse
    commit protocol in miniature (Delta/Iceberg would replace the body
    with MERGE INTO; the batch contract is identical).

    Per batch: read the table at the current commit (the ``CURRENT``
    pointer file), union the batch, keep the latest version per id
    (io.tables.upsert_latest — ties toward the batch), write the merged
    state to a NEW versioned directory ``v<batch_id>``, then atomically
    repoint ``CURRENT``. Crash-replay is idempotent in both windows:
    a crash BEFORE the repoint replays against the old CURRENT and
    rewrites ``v<batch_id>`` from scratch; a crash AFTER the repoint but
    before the streaming checkpoint commits leaves ``CURRENT`` already at
    ``v<batch_id>`` — that directory IS the committed merge of this exact
    (batch_id, data), so the replay short-circuits to a no-op (re-merging
    would read ``v<batch_id>`` and overwrite the same path, which Spark
    refuses, wedging the stream). The pointer write is the only
    non-parallel step and is O(bytes of one small file).

    ``run_token`` disambiguates checkpoint lifecycles: batch ids restart
    at 0 with a FRESH checkpointLocation, so reusing a state_dir across
    checkpoints would make a stale ``CURRENT = v0`` pointer silently
    swallow the new stream's first batch as a "replay". Pass the
    checkpointLocation (or any id with its lifecycle) and the version
    dirs become ``v<batch_id>_<token-hash>`` — the short-circuit fires
    only on a same-lifecycle replay, and a new lifecycle's merges write
    fresh paths. Without a token, state_dir and checkpointLocation must
    share a lifecycle (the pre-existing contract).
    """
    import os

    from chatbot_spark.io import versioned
    from chatbot_spark.io.tables import upsert_latest

    # token baked into the VERSION DIRECTORY NAME (versioned.stamp), not
    # just the pointer: with only the pointer stamped, a new lifecycle's
    # batch N would read prev from v<N> and write its merge back to v<N>
    # — a read-and-overwrite of the same parquet path.

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        vname = versioned.stamp(batch_id, run_token)
        cur = versioned.current_version(state_dir)
        if cur == vname:
            return  # crash-window-2 replay: this exact commit is CURRENT
        prev = (
            spark.read.parquet(versioned.resolve(state_dir))
            if cur is not None
            else None
        )
        merged = (
            upsert_latest(prev, batch_df, id_col=id_col, version_col=version_col)
            if prev is not None
            else upsert_latest(
                batch_df.limit(0), batch_df, id_col=id_col, version_col=version_col
            )
        )
        merged.write.mode("overwrite").parquet(
            os.path.join(state_dir, vname)
        )
        versioned.commit(state_dir, vname)

    return write_batch


def vacuum_versions(state_dir: str, keep: int = 2) -> list[str]:
    """Retention for the versioned-commit table (the VACUUM half of the
    time-travel contract): delete all but the newest ``keep`` version
    directories, never touching the one ``CURRENT`` points at. Versions
    order by COMMIT RECENCY = directory mtime (each version dir is
    written exactly once), with the batch id as a stable tie-break —
    NOT by batch id alone: a run_token lifecycle restart resets batch
    ids to 0, and id-ordering would then retain the OLD lifecycle's
    stale high-id dirs while deleting the live lifecycle's recent
    commits. Returns the removed directory names; a state_dir with no
    ``CURRENT`` yet (first batch not committed) is a no-op.

    Safety order matters: the pointer is read FIRST and its target is
    exempt unconditionally, so a concurrent repoint can at worst leave
    one extra directory behind — never dangle the pointer. Readers of a
    vacuumed snapshot fail like any expired-retention read in a
    lakehouse; pick ``keep`` >= your longest reader window.

    (Thin alias since round 10: the protocol lives in io/versioned.py,
    shared by all four versioned stores.)"""
    from chatbot_spark.io import versioned

    return versioned.vacuum(state_dir, keep=keep)


def read_upsert_state(spark, state_dir: str, version: str | int | None = None) -> DataFrame:
    """Snapshot read of the versioned-commit table. ``version=None``
    follows the ``CURRENT`` pointer; an explicit version (``"v1"`` /
    ``1`` / a full ``"v1_<token>"`` dir name) reads that commit — TIME
    TRAVEL for free, because commits are immutable directories that the
    writer never rewrites after the repoint (the Delta/Iceberg
    read-at-snapshot path in miniature; retention/VACUUM of old ``v*``
    dirs is the operator's only extra job at scale)."""
    from chatbot_spark.io import versioned

    return spark.read.parquet(versioned.resolve(state_dir, version))


def signed_partials_writer(
    out_path: str,
    group_cols: list[str],
    mult_col: str,
    value_col: str,
):
    """foreachBatch for retract-stream aggregate maintenance (the
    streaming twin of operators/ivm.py::retractable_rollup): each
    micro-batch of a signed changelog collapses to per-group SIGNED
    partials (n = Σmult, sum = Σmult·value, retr = Σ|mult<0|) BEFORE
    touching the sink — what crosses to storage is groups × batches
    rows, never the changelog itself. Partials land in a ``batch_id=N``
    partition with dynamic overwrite, so an at-least-once replay
    rewrites its own attempt (the idempotent_batch_writer contract).
    The maintained aggregate is then ONE re-aggregation of the partial
    log — mergeable, restart-safe, and able to move DOWN on
    retractions."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        m = F.col(mult_col).cast("long")
        v = F.col(value_col).cast("long")
        partials = batch_df.groupBy(*group_cols).agg(
            F.sum(m).alias("p_n"),
            F.sum(m * v).alias("p_sum"),
            F.sum(F.when(m < 0, -m).otherwise(F.lit(0))).alias("p_retr"),
        )
        (
            partials.withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_path)
        )

    return write_batch


def hdr_sketch_writer(
    out_path: str,
    value_col: str,
    group_cols: list[str],
    sub_bits: int = 5,
):
    """foreachBatch for streaming percentile maintenance (the streaming
    twin of operators/hdrsketch.py): each micro-batch collapses to its
    own fixed-size log-bucket sketch — (group..., qv, cnt), at most
    groups x ~1900 rows — BEFORE touching the sink; raw events never
    cross to storage. Sketches land in a ``batch_id=N`` partition with
    dynamic overwrite (the idempotent_batch_writer contract: an
    at-least-once replay rewrites its own attempt). Because hdr_merge is
    a plain groupBy-sum — associative and commutative — the union of all
    batch partitions re-aggregates to EXACTLY the sketch of all data
    ever seen: any percentile over any group/time slice is O(buckets)
    work against the partial log, no event rescan, and the answer is
    bit-equal to the batch computation."""
    from chatbot_spark.operators.hdrsketch import hdr_sketch

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        sk = hdr_sketch(batch_df, value_col, group_cols, sub_bits=sub_bits)
        (
            sk.withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_path)
        )

    return write_batch
