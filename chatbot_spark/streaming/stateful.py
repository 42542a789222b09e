"""Custom stateful streaming operator (applyInPandasWithState).

Built-in ``session_window`` (streaming/events.py) handles gap-only
sessions. This module's sessionizer additionally SPLITS on boundary
events (e.g. ``signup`` starts a fresh session regardless of gap) — a
semantics the built-in cannot express; per SURVEY §1.2 the streaming
surface is an extension beyond the reference (whose "streaming" is LLM
token streaming, rag_graph.py:692-765).

Emission contract (deterministic, oracle-checkable): a session is emitted
exactly when a later event of the same user closes it (gap exceeded or
boundary hit). After a full drain the emitted set is therefore "every
session except each user's currently-open last one" — a set a batch SQL
oracle states exactly, with no dependence on wall-clock, watermark
position, or micro-batch boundaries.

State per user is one open session (start, last_ts, count) — O(users)
state, constant per key, no growth with stream length. A production
deployment would add ``GroupStateTimeout.EventTimeTimeout`` to also flush
sessions idle past the watermark; that emission depends on watermark
position, so the parity surface keeps NoTimeout semantics.

Ordering assumption: micro-batches arrive in event-time order per key
(the standard applyInPandasWithState contract — state folds forward).
Within a batch, events are sorted by (ts, event_id) in the kernel, so
same-timestamp ties fold identically to the batch oracle's window order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

SESSION_OUTPUT_SCHEMA = (
    "user_id BIGINT, session_start TIMESTAMP, session_end TIMESTAMP, n_events BIGINT"
)
# open-session state: epoch-nanosecond bounds + event count
SESSION_STATE_SCHEMA = "start_ns BIGINT, last_ns BIGINT, n BIGINT"


def sessionize_with_boundaries(
    events: DataFrame,
    gap_minutes: int = 30,
    boundary_types: tuple[str, ...] = ("signup",),
) -> DataFrame:
    """Gap + boundary sessionization over a stream of
    (user_id, ts, event_type, ...) rows.

    A new session starts when (a) the user has no open session, (b) the
    gap since their last event exceeds ``gap_minutes`` (strict >, matching
    the batch sessionizer), or (c) the event's type is a boundary type.
    ``session_end`` = last event + gap, the same contract as
    session_window and workload.stream_sessionize.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_ns = gap_minutes * 60 * 1_000_000_000
    boundaries = set(boundary_types)

    def fold(key, pdfs, state: GroupState):
        batch = pd.concat(list(pdfs), ignore_index=True)
        if batch.empty:
            return
        batch = batch.sort_values(["ts", "event_id"], kind="mergesort")
        ts_ns = batch["ts"].astype("int64").to_numpy()
        types = batch["event_type"].to_numpy()

        start_ns, last_ns, n = state.get if state.exists else (0, 0, 0)
        (user_id,) = key
        closed: list[tuple[int, int, int]] = []
        for t, et in zip(ts_ns, types):
            boundary = et in boundaries
            if n > 0 and (boundary or t - last_ns > gap_ns):
                closed.append((start_ns, last_ns, n))
                n = 0
            if n == 0:
                start_ns = t
            last_ns = t
            n += 1
        state.update((int(start_ns), int(last_ns), int(n)))
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": pd.to_datetime([c[0] for c in closed]),
                    "session_end": pd.to_datetime([c[1] + gap_ns for c in closed]),
                    "n_events": [c[2] for c in closed],
                }
            )

    return events.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stream_once_append(stream_df: DataFrame, checkpoint: str) -> list:
    """Drain an append-mode stream (AvailableNow) to a memory sink and
    return the rows — the applyInPandasWithState twin of
    events.run_stream_once_complete."""
    import uuid

    sink = f"stream_sink_{uuid.uuid4().hex[:12]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(sink)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark = stream_df.sparkSession
    rows = spark.sql(f"SELECT * FROM {sink}").collect()
    spark.catalog.dropTempView(sink)
    return rows


# --------------------------------------------------------------------- J6+
# Streaming heavy hitters (SpaceSaving per shard). Batch CMS heavy hitters
# exist (workload cms_heavy_hitters); this is the STREAMING counter form:
# capacity-bounded per-shard counter tables maintained across micro-batches
# with custom state — O(shards × capacity) state however long the stream.
#
# Correctness regimes:
#  * capacity >= distinct keys per shard → counters are EXACT (no eviction
#    ever fires), so a plain GROUP BY oracle pins the operator bit-for-bit
#    — the same full-probe-≡-exact trick the ANN family uses.
#  * capacity below distinct → classic SpaceSaving error bound (count
#    overestimate ≤ N/capacity); eviction is deterministic (min count,
#    ties → largest key) and unit-tested against a serial reference.
#
# Emission contract: every batch re-emits the shard's full counter table
# stamped with n_seen (monotone per shard); "the final table" = rows with
# each shard's max n_seen — deterministic regardless of micro-batch count
# or boundaries.

HH_OUTPUT_SCHEMA = "shard BIGINT, n_seen BIGINT, key BIGINT, cnt BIGINT"
HH_STATE_SCHEMA = "keys ARRAY<BIGINT>, counts ARRAY<BIGINT>, n_seen BIGINT"


def heavy_hitters_stream(
    keyed: DataFrame,
    capacity: int = 16,
) -> DataFrame:
    """SpaceSaving heavy hitters over a stream of (shard, ts, event_id,
    key) rows, keyed by shard. Rows fold in (ts, event_id) order within
    each batch so eviction order (when capacity binds) is deterministic.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fold(key, pdfs, state: GroupState):
        batch = pd.concat(list(pdfs), ignore_index=True)
        if batch.empty:
            return
        batch = batch.sort_values(["ts", "event_id"], kind="mergesort")
        (shard,) = key
        if state.exists:
            keys, counts, n_seen = state.get
            table = dict(zip(keys, counts))
        else:
            table, n_seen = {}, 0
        for k in batch["key"].to_numpy():
            k = int(k)
            if k in table:
                table[k] += 1
            elif len(table) < capacity:
                table[k] = 1
            else:
                evict = min(table.items(), key=lambda kv: (kv[1], -kv[0]))[0]
                c = table.pop(evict)
                table[k] = c + 1
            n_seen += 1
        ks = sorted(table)
        state.update((ks, [int(table[k]) for k in ks], int(n_seen)))
        yield pd.DataFrame(
            {
                "shard": [shard] * len(ks),
                "n_seen": [n_seen] * len(ks),
                "key": ks,
                "cnt": [table[k] for k in ks],
            }
        )

    return keyed.groupBy("shard").applyInPandasWithState(
        fold,
        outputStructType=HH_OUTPUT_SCHEMA,
        stateStructType=HH_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


TRANSITION_OUTPUT_SCHEMA = (
    "user_id BIGINT, from_type STRING, to_type STRING, n BIGINT"
)
TRANSITION_STATE_SCHEMA = "last_type STRING"


def transition_counter(events: DataFrame) -> DataFrame:
    """Streaming first-order transition counter (applyInPandasWithState):
    per user, count consecutive (event_type -> next event_type) pairs
    across micro-batches — the carry is ONE string (the user's last
    observed type), so state is O(users) regardless of stream length.
    Emits per-(user, batch) aggregated transition counts (<= |types|^2
    tiny rows per user per batch); the drained union aggregated batch-
    side equals the batch lead()-window transition matrix EXACTLY when
    micro-batches respect event-time order per user (the time-sliced
    replay harness contract used by every stateful query here).
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fold(key, pdfs, state: GroupState):
        batch = pd.concat(list(pdfs), ignore_index=True)
        if batch.empty:
            return
        batch = batch.sort_values(["ts", "event_id"], kind="mergesort")
        types = batch["event_type"].to_numpy()
        (user_id,) = key
        prev = state.get[0] if state.exists else None
        counts: dict[tuple[str, str], int] = {}
        for t in types:
            if prev is not None:
                counts[(prev, t)] = counts.get((prev, t), 0) + 1
            prev = t
        state.update((str(prev),))
        if counts:
            ks = list(counts)
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(ks),
                    "from_type": [a for a, _ in ks],
                    "to_type": [b for _, b in ks],
                    "n": [counts[k] for k in ks],
                }
            )

    return events.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=TRANSITION_OUTPUT_SCHEMA,
        stateStructType=TRANSITION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
