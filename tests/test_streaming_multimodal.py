"""Structured Streaming + multimodal plumbing tests."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from chatbot_spark.streaming.events import (
    hourly_rollup,
    read_event_stream,
    run_stream_once_complete,
    session_rollup,
)


@pytest.fixture(scope="module")
def event_files(spark, tmp_path_factory, sf_dir):
    """Materialize the events table as a plain-timestamp parquet dir the
    file-source stream can read (testdata itself is TIMESTAMP(NANOS))."""
    from chatbot_spark.io.tables import load_table

    path = str(tmp_path_factory.mktemp("events_stream") / "in")
    load_table(spark, sf_dir, "events").write.parquet(path)
    return path


def test_stream_hourly_matches_batch(spark, event_files, tmp_path):
    stream = read_event_stream(spark, event_files)
    assert stream.isStreaming
    rows = run_stream_once_complete(
        hourly_rollup(stream), str(tmp_path / "ckpt1")
    )
    got = {(r["hour"], r["event_type"]): (r["n_events"], r["sum_value_cents"]) for r in rows}

    batch = (
        spark.read.parquet(event_files)
        .groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00:00").alias("hour"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
        )
    )
    want = {(r["hour"], r["event_type"]): (r["n_events"], r["cents"]) for r in batch.collect()}
    assert got == want  # batch/stream parity, exact


def test_stream_sessionize_gap(spark, event_files, tmp_path):
    rows = run_stream_once_complete(
        session_rollup(read_event_stream(spark, event_files)), str(tmp_path / "ckpt2")
    )
    assert rows
    # session windows respect the 30-min gap: end-start >= 0 and every
    # session has >= 1 event
    for r in rows[:50]:
        assert r["n_events"] >= 1
        assert r["session_end"] >= r["session_start"]


def test_multimodal_pipeline(spark, tmp_path):
    from chatbot_spark.operators.multimodal import (
        IMAGE_FEATURES_SCHEMA,
        extract_image_features,
        read_binary_dir,
    )

    d = tmp_path / "imgs"
    d.mkdir()
    (d / "a.bin").write_bytes(b"\x89PNG fake image payload AAAA")
    (d / "b.bin").write_bytes(b"\x89PNG other payload BBBBBBBB")

    media = read_binary_dir(spark, str(d), glob="*.bin")
    assert media.count() == 2
    feats = extract_image_features(media, dim=8)
    assert feats.schema == IMAGE_FEATURES_SCHEMA
    rows = {os.path.basename(r["media_id"]): r for r in feats.collect()}
    assert rows["a.bin"]["n_bytes"] == 28
    assert len(rows["a.bin"]["embedding"]) == 8
    # deterministic fake decode: stable dims per content
    again = {os.path.basename(r["media_id"]): r for r in extract_image_features(media, dim=8).collect()}
    assert again["a.bin"]["width"] == rows["a.bin"]["width"]


def test_audio_kernel_parses_real_wav(spark):
    """The audio kernel must parse a genuine RIFF/WAVE container and
    recover exact-integer features; known tiny inputs pin the math."""
    import numpy as np

    from chatbot_spark.operators.multimodal import (
        extract_audio_features,
        sawtooth_pcm16,
        synth_wav_pcm16,
    )

    # [-16383, 0, 16383, -16383]: sum_sq = 3*16383^2, peak 16383, 2 crossings
    s = np.array([-16383, 0, 16383, -16383], dtype=np.int16)
    media = spark.createDataFrame(
        [("m1", "audio", synth_wav_pcm16(s, 8000), "audio/wav", {}),
         ("m2", "audio", synth_wav_pcm16(sawtooth_pcm16(200, 8000, 800), 8000), "audio/wav", {})],
        "media_id STRING, modality STRING, content BINARY, mime STRING, meta MAP<STRING,STRING>",
    )
    rows = {r["media_id"]: r for r in extract_audio_features(media).collect()}
    m1 = rows["m1"]
    assert (m1["sample_rate"], m1["channels"], m1["bit_depth"]) == (8000, 1, 16)
    assert m1["n_frames"] == 4
    assert m1["peak"] == 16383
    assert m1["sum_sq"] == 3 * 16383 * 16383
    # sign changes: (-,+ at idx2? signs: neg, nonneg, nonneg, neg) -> 2
    assert m1["zero_crossings"] == 2
    m2 = rows["m2"]
    assert m2["n_frames"] == 800 and m2["duration_ms"] == 100


def test_video_frame_sample_offsets_and_sums(spark):
    """RAWV parse: header dims, stride sampling, per-frame exact pixel
    sums matching the closed-form synth formula."""
    from chatbot_spark.operators.multimodal import frame_sample, synth_rawv

    w, h, n, seed = 8, 4, 10, 3
    media = spark.createDataFrame(
        [("v1", "video", synth_rawv(w, h, n, seed), "video/rawv", {})],
        "media_id STRING, modality STRING, content BINARY, mime STRING, meta MAP<STRING,STRING>",
    )
    rows = sorted(frame_sample(media, every_n=4).collect(), key=lambda r: r["frame_idx"])
    assert [r["frame_idx"] for r in rows] == [0, 4, 8]
    for r in rows:
        expect = sum((7 * i + 13 * r["frame_idx"] + seed) % 256 for i in range(w * h))
        assert (r["width"], r["height"], r["n_frames"]) == (w, h, n)
        assert r["pix_sum"] == expect


def test_text_functions(spark):
    from chatbot_spark.functions.text import (
        extract_citation_orders,
        rewrite_citations,
        rewrite_doc_url,
        strip_reference_suffix,
    )

    df = spark.createDataFrame(
        [
            (
                "clone/oceanbase-doc/en-US/guide.md",
                "see [[@1]] and [[@2]] but not [[@9]]",
                ["http://u1", "http://u2"],
            )
        ],
        "url STRING, txt STRING, urls ARRAY<STRING>",
    )
    row = df.select(
        rewrite_doc_url(F.col("url")).alias("u"),
        extract_citation_orders(F.col("txt")).alias("orders"),
        rewrite_citations(F.col("txt"), F.col("urls")).alias("rew"),
        strip_reference_suffix(F.lit("body\n----refs----\n[1] x"), "\n----refs----\n").alias("stripped"),
    ).first()
    assert row["u"] == "https://github.com/oceanbase/oceanbase-doc/blob/V4.3.4/en-US/guide.md"
    assert row["orders"] == [1, 2, 9]
    assert "[1](http://u1)" in row["rew"] and "[2](http://u2)" in row["rew"]
    assert "[[@9]]" in row["rew"]  # out-of-range left untouched
    assert row["stripped"] == "body"


def test_boundary_sessionize_semantics(spark, tmp_path):
    """applyInPandasWithState sessionizer: gap split, boundary split,
    cross-batch state carry, and the emission contract (a user's open last
    session is never emitted)."""
    from chatbot_spark.streaming.events import read_event_stream
    from chatbot_spark.streaming.stateful import (
        run_stream_once_append,
        sessionize_with_boundaries,
    )

    def ev(eid, minute, user, etype="click"):
        return (eid, f"2024-01-01 10:{minute:02d}:00", user, etype, 1.0, "{}")

    schema = "event_id BIGINT, ts STRING, user_id BIGINT, event_type STRING, value DOUBLE, props STRING"
    # batch 1: u1 two events 5 min apart; u2 one event
    b1 = [ev(1, 0, 1), ev(2, 5, 1), ev(3, 0, 2)]
    # batch 2 (later ts): u1 signup at :10 -> boundary closes session 1
    # (2 events); then a 40-min gap closes session 2 (1 event). u2's lone
    # session stays open -> never emitted.
    b2 = [ev(4, 10, 1, "signup"), ev(5, 55, 1)]
    inpath = str(tmp_path / "in")
    for batch in (b1, b2):
        (
            spark.createDataFrame(batch, schema)
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .coalesce(1)
            .write.mode("append")
            .parquet(inpath)
        )
    rows = run_stream_once_append(
        sessionize_with_boundaries(
            read_event_stream(spark, inpath, max_files_per_trigger=1)
        ),
        str(tmp_path / "ckpt"),
    )
    got = sorted(
        (r["user_id"], str(r["session_start"]), str(r["session_end"]), r["n_events"])
        for r in rows
    )
    assert got == [
        (1, "2024-01-01 10:00:00", "2024-01-01 10:35:00", 2),  # closed by boundary
        (1, "2024-01-01 10:10:00", "2024-01-01 10:40:00", 1),  # closed by gap
    ]


def test_stream_dedup_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark: replays within the watermark horizon
    are dropped across micro-batches; state is bounded by the watermark
    (the 100 TB/day mode of dedup_stream)."""
    from chatbot_spark.streaming.events import dedup_stream, read_event_stream
    from chatbot_spark.streaming.stateful import run_stream_once_append

    schema = "event_id BIGINT, ts STRING, user_id BIGINT, event_type STRING, value DOUBLE, props STRING"
    rows = [(i, f"2024-01-01 10:{i:02d}:00", 1, "click", 1.0, "{}") for i in range(5)]
    inpath = str(tmp_path / "in")
    for _ in range(2):  # identical batch replayed -> dups arrive in a later micro-batch
        (
            spark.createDataFrame(rows, schema)
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .coalesce(1)
            .write.mode("append")
            .parquet(inpath)
        )
    out = run_stream_once_append(
        dedup_stream(
            read_event_stream(spark, inpath, max_files_per_trigger=1),
            watermark="1 hour",
        ),
        str(tmp_path / "ckpt"),
    )
    assert sorted(r["event_id"] for r in out) == [0, 1, 2, 3, 4]


def test_foreach_batch_sink_is_idempotent_on_replay(spark, tmp_path):
    """Exactly-once-on-replay: re-invoking the foreachBatch writer with the
    same batch_id (the at-least-once crash-replay contract) must leave the
    sink unchanged, not append duplicates."""
    from chatbot_spark.io.tables import load_table
    from chatbot_spark.streaming.events import (
        EVENT_SCHEMA,
        drain_to_idempotent_sink,
        idempotent_batch_writer,
        read_event_stream,
    )

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    n_total = ev.count()
    inpath = str(tmp_path / "in")
    # three file drops → three micro-batches under maxFilesPerTrigger=1
    for i in range(3):
        ev.filter(F.col("event_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(inpath)
    out = str(tmp_path / "out")
    drain_to_idempotent_sink(
        read_event_stream(spark, inpath, max_files_per_trigger=1),
        out,
        str(tmp_path / "ckpt"),
    )
    sunk = spark.read.parquet(out)
    assert sunk.count() == n_total
    batch_ids = sorted(r.batch_id for r in sunk.select("batch_id").distinct().collect())
    assert len(batch_ids) >= 2  # the drain really was incremental
    # crash-replay batch 0: same data, same batch_id → sink unchanged
    replay = sunk.filter(F.col("batch_id") == batch_ids[0]).drop("batch_id")
    before = sunk.groupBy("batch_id").count().collect()
    idempotent_batch_writer(out)(replay, batch_ids[0])
    after_df = spark.read.parquet(out)
    assert after_df.count() == n_total
    assert sorted(map(tuple, after_df.groupBy("batch_id").count().collect())) == sorted(
        map(tuple, before)
    )


def test_rocksdb_state_store_provider_active(spark, tmp_path):
    """Every streaming query runs on the RocksDB state store (state spills
    to disk instead of executor heap — the 100 TB/day requirement). Assert
    the session conf AND that a real stateful drain ran on it (the
    query's lastProgress stateOperators report the RocksDB provider's
    customMetrics)."""
    from chatbot_spark.streaming.events import dedup_stream, read_event_stream

    assert (
        spark.conf.get("spark.sql.streaming.stateStore.providerClass")
        == "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )

    schema = "event_id BIGINT, ts STRING, user_id BIGINT, event_type STRING, value DOUBLE, props STRING"
    rows = [(i, f"2024-01-01 10:{i:02d}:00", 1, "click", 1.0, "{}") for i in range(3)]
    inpath = str(tmp_path / "in")
    (
        spark.createDataFrame(rows, schema)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .coalesce(1)
        .write.parquet(inpath)
    )
    q = (
        dedup_stream(read_event_stream(spark, inpath), watermark="1 hour")
        .writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    ops = (q.lastProgress or {}).get("stateOperators", [])
    assert ops, "stateful drain produced no state operator progress"
    metrics = ops[0].get("customMetrics", {})
    assert any("rocksdb" in k.lower() for k in metrics), metrics


def test_upsert_state_writer_replay_after_repoint(spark, tmp_path):
    """Crash-replay in the worst window: the crash lands AFTER the CURRENT
    repoint but BEFORE the streaming checkpoint commit, so the replayed
    batch sees CURRENT == v<its own batch_id>. Re-merging would read
    state_dir/vN and overwrite the same directory (Spark refuses →
    permanent wedge); the writer must short-circuit, leaving the committed
    state byte-identical."""
    from chatbot_spark.streaming.events import read_upsert_state, upsert_state_writer

    state_dir = str(tmp_path / "state")
    os.makedirs(state_dir)
    writer = upsert_state_writer(state_dir, id_col="user_id", version_col="event_id")

    schema = "user_id BIGINT, event_id BIGINT, value DOUBLE"
    writer(spark.createDataFrame([(1, 10, 1.0), (2, 11, 2.0)], schema), 0)
    writer(spark.createDataFrame([(2, 20, 5.0), (3, 21, 7.0)], schema), 1)
    committed = sorted(map(tuple, read_upsert_state(spark, state_dir).collect()))
    assert committed == [(1, 10, 1.0), (2, 20, 5.0), (3, 21, 7.0)]

    # replay batch 1 (same batch_id, same data) with CURRENT already at v1
    writer(spark.createDataFrame([(2, 20, 5.0), (3, 21, 7.0)], schema), 1)
    assert sorted(map(tuple, read_upsert_state(spark, state_dir).collect())) == committed
    with open(os.path.join(state_dir, "CURRENT")) as f:
        assert f.read().strip() == "v1"

def test_upsert_state_writer_run_token_disambiguates_fresh_checkpoint(spark, tmp_path):
    """Batch ids restart at 0 under a fresh checkpointLocation; without a
    run token a stale CURRENT=v0 pointer would swallow the new stream's
    first batch as a 'replay'. With tokens, same-token same-batch replays
    still short-circuit, but a new token's batch 0 merges."""
    from chatbot_spark.streaming.events import read_upsert_state, upsert_state_writer

    state_dir = str(tmp_path / "state")
    df1 = spark.createDataFrame([(1, 10, "a")], "user_id LONG, event_id LONG, v STRING")
    df2 = spark.createDataFrame([(2, 20, "b")], "user_id LONG, event_id LONG, v STRING")

    w1 = upsert_state_writer(
        state_dir, id_col="user_id", version_col="event_id", run_token="ckpt1"
    )
    w1(df1, 0)
    assert {r["user_id"] for r in read_upsert_state(spark, state_dir).collect()} == {1}

    # lifecycle 2, batch ids restart at 0: MUST merge, not no-op
    w2 = upsert_state_writer(
        state_dir, id_col="user_id", version_col="event_id", run_token="ckpt2"
    )
    w2(df2, 0)
    assert {r["user_id"] for r in read_upsert_state(spark, state_dir).collect()} == {1, 2}

    # same-token same-batch crash replay: short-circuits (state unchanged)
    w2(df2, 0)
    assert {r["user_id"] for r in read_upsert_state(spark, state_dir).collect()} == {1, 2}


def test_ahash_pairs_pigeonhole_equals_bruteforce(spark):
    """Block-LSH candidate recall is pigeonhole-COMPLETE at the default
    threshold: the pair set must equal brute-force all-pairs hamming."""
    import itertools
    import random

    from chatbot_spark.operators.multimodal import ahash_pairs

    rng = random.Random(3)
    base = [rng.randint(0, 1) for _ in range(64)]
    rows = []
    for i in range(12):
        bits = list(base)
        for _ in range(rng.choice([0, 2, 5, 9, 30])):
            j = rng.randrange(64)
            bits[j] = 1 - bits[j]
        rows.append((f"m{i:02d}", bits))
    df = spark.createDataFrame(rows, "media_id STRING, bits ARRAY<INT>")
    got = {
        (r.id_a, r.id_b, r.hamming) for r in ahash_pairs(df, max_hamming=8).collect()
    }
    want = set()
    for (ia, ba), (ib, bb) in itertools.combinations(rows, 2):
        h = sum(x != y for x, y in zip(ba, bb))
        if h <= 8:
            a, b = sorted((ia, ib))
            want.add((a, b, h))
    assert got == want and len(want) > 0


def test_rawp_roundtrip_and_grid_check(spark):
    """synth_rawp -> extract_image_ahash parses dims back; non-divisible
    grids are rejected."""
    import pytest

    from chatbot_spark.operators.multimodal import (
        extract_image_ahash,
        pattern_pixels,
        synth_rawp,
    )

    content = synth_rawp(pattern_pixels(3, 32, 32, 1))
    df = spark.createDataFrame([("a", content)], "media_id STRING, content BINARY")
    row = extract_image_ahash(df, grid=8).first()
    assert (row.width, row.height, len(row.bits)) == (32, 32, 64)
    assert set(row.bits) <= {0, 1}
    bad = synth_rawp(pattern_pixels(3, 30, 32, 1))
    dfb = spark.createDataFrame([("b", bad)], "media_id STRING, content BINARY")
    with pytest.raises(Exception, match="not divisible"):
        extract_image_ahash(dfb, grid=8).collect()


def test_vacuum_versions_keeps_current_and_newest(spark, tmp_path):
    """Retention deletes the oldest version dirs, never the CURRENT
    target, and vacuumed snapshots fail to read while kept ones work."""
    import pytest

    from chatbot_spark.streaming.events import (
        read_upsert_state,
        upsert_state_writer,
        vacuum_versions,
    )

    state = str(tmp_path / "state")
    writer = upsert_state_writer(state, id_col="id", version_col="version")
    for i in range(4):
        writer(
            spark.createDataFrame([(i, i)], "id LONG, version LONG"), i
        )
    removed = vacuum_versions(state, keep=2)
    assert removed == ["v0", "v1"]
    assert read_upsert_state(spark, state).count() == 4  # CURRENT intact
    assert read_upsert_state(spark, state, 2).count() == 3  # kept snapshot
    with pytest.raises(Exception):
        read_upsert_state(spark, state, 0).count()  # vacuumed


def test_scene_cuts_edges(spark):
    """Boundary behavior: a 1-frame video has no pairs; a single-scene
    video (scene_len >= n) has no cuts; cuts land exactly at multiples
    of scene_len with SAD far above the within-scene band."""
    import pandas as pd

    from chatbot_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        detect_scene_cuts,
        synth_rawv_scenes,
    )

    rows = [
        ("one", "video", synth_rawv_scenes(16, 8, 1, 0, 5), "video/rawv", {}),
        ("flat", "video", synth_rawv_scenes(16, 8, 12, 3, 99), "video/rawv", {}),
        ("cuts", "video", synth_rawv_scenes(16, 8, 12, 7, 5), "video/rawv", {}),
    ]
    media = spark.createDataFrame(
        pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA.fields]),
        MEDIA_SCHEMA,
    )
    got = detect_scene_cuts(media, threshold=8000).collect()
    by_id = {}
    for r in got:
        by_id.setdefault(r["media_id"], []).append(r)
    assert "one" not in by_id and "flat" not in by_id
    assert sorted(r["frame_idx"] for r in by_id["cuts"]) == [5, 10]
    assert all(r["sad"] > 15000 for r in by_id["cuts"])


def test_energy_segments_islands_and_silence(spark):
    """All-silent audio yields no rows; gated audio yields exactly the
    expected islands with exact energies (replayed in numpy here)."""
    import numpy as np
    import pandas as pd

    from chatbot_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        energy_segments,
        sawtooth_pcm16,
        synth_wav_pcm16,
    )

    n, rate = 4000, 8000
    s = sawtooth_pcm16(300, rate, n)
    t = np.arange(n)
    gated = np.where((t // 800) % 2 == 0, s, 0).astype(np.int16)
    silent = np.zeros(n, dtype=np.int16)
    rows = [
        ("gated", "audio", synth_wav_pcm16(gated, rate), "audio/wav", {}),
        ("silent", "audio", synth_wav_pcm16(silent, rate), "audio/wav", {}),
    ]
    media = spark.createDataFrame(
        pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA.fields]),
        MEDIA_SCHEMA,
    )
    got = energy_segments(media, frame_len=400, threshold=0).collect()
    assert {r["media_id"] for r in got} == {"gated"}
    segs = sorted(got, key=lambda r: r["seg_idx"])
    assert [(r["start_frame"], r["end_frame"]) for r in segs] == [
        (0, 1), (4, 5), (8, 9),
    ]
    e = (gated.astype(np.int64) ** 2).reshape(10, 400).sum(axis=1)
    assert [r["energy_sum"] for r in segs] == [
        int(e[0:2].sum()), int(e[4:6].sum()), int(e[8:10].sum())
    ]


def test_heavy_hitters_eviction_matches_serial_spacesaving(spark, tmp_path):
    # capacity 2 over 4 distinct keys: eviction fires; compare the final
    # counter table against a serial SpaceSaving with the same tie-break
    # (min count, ties -> largest key), folded in (ts, event_id) order.
    from datetime import datetime, timedelta

    from pyspark.sql import functions as F

    from chatbot_spark.streaming.stateful import (
        heavy_hitters_stream,
        run_stream_once_append,
    )

    seq = [3, 3, 1, 2, 1, 3, 4, 4, 4, 2, 2, 2]
    rows = [
        (i, datetime(2024, 1, 1) + timedelta(minutes=i), 0, k)
        for i, k in enumerate(seq)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, shard long, key long"
    )
    inpath = str(tmp_path / "in")
    # two micro-batches to exercise cross-batch counter state
    df.filter(F.col("event_id") < 6).coalesce(1).write.mode("append").parquet(inpath)
    df.filter(F.col("event_id") >= 6).coalesce(1).write.mode("append").parquet(inpath)
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, shard long, key long"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(inpath)
        .select("shard", "ts", "event_id", "key")
    )
    out = run_stream_once_append(
        heavy_hitters_stream(stream, capacity=2), str(tmp_path / "ckpt")
    )
    final_n = max(r["n_seen"] for r in out)
    got = {r["key"]: r["cnt"] for r in out if r["n_seen"] == final_n}

    table = {}
    for k in seq:
        if k in table:
            table[k] += 1
        elif len(table) < 2:
            table[k] = 1
        else:
            evict = min(table.items(), key=lambda kv: (kv[1], -kv[0]))[0]
            table[k] = table.pop(evict) + 1
    assert got == table
    assert final_n == len(seq)
    # SpaceSaving overestimate bound: every kept count <= true + N/capacity
    true = {k: seq.count(k) for k in set(seq)}
    for k, c in got.items():
        assert true[k] <= c <= true[k] + len(seq) // 2


def test_transition_counter_state_survives_checkpointed_restart(spark, tmp_path):
    """Two stream lifecycles against ONE checkpoint: the per-user
    last-type state committed by lifecycle 1 must seed lifecycle 2, so
    the transition spanning the restart boundary is counted exactly
    once. Proves checkpoint durability, not just within-run carry."""
    import pandas as pd

    from chatbot_spark.streaming.events import read_event_stream
    from chatbot_spark.streaming.stateful import transition_counter

    inpath = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    outpath = str(tmp_path / "out")

    def drain():
        # parquet sink: the memory sink refuses checkpoint recovery, and
        # the whole point here is the second lifecycle recovering state
        q = (
            transition_counter(
                read_event_stream(spark, inpath, max_files_per_trigger=1)
            )
            .writeStream.format("parquet")
            .option("path", outpath)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def write_wave(rows):
        df = spark.createDataFrame(
            pd.DataFrame(
                rows, columns=["event_id", "ts", "user_id", "event_type"]
            ).assign(ts=lambda d: pd.to_datetime(d.ts))
        )
        df.coalesce(1).write.mode("append").parquet(inpath)

    # wave 1: u1 [view, click], u2 [view]
    write_wave(
        [
            (1, "2024-01-01 10:00", 1, "view"),
            (2, "2024-01-01 10:01", 1, "click"),
            (3, "2024-01-01 10:00", 2, "view"),
        ]
    )
    drain()
    # wave 2 (fresh lifecycle, same checkpoint): u1 [purchase], u2 [click]
    # -> the click->purchase and view->click RESTART-BOUNDARY transitions
    write_wave(
        [
            (4, "2024-01-01 10:05", 1, "purchase"),
            (5, "2024-01-01 10:06", 2, "click"),
        ]
    )
    drain()
    counts: dict[tuple[str, str], int] = {}
    for r in spark.read.parquet(outpath).collect():
        k = (r["from_type"], r["to_type"])
        counts[k] = counts.get(k, 0) + int(r["n"])
    assert counts == {
        ("view", "click"): 2,       # u1 in-wave + u2 across the restart
        ("click", "purchase"): 1,   # u1 across the restart
    }
