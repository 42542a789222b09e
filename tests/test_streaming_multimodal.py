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


def test_multimodal_stubs_raise(spark):
    from chatbot_spark.operators.multimodal import decode_audio, frame_sample

    with pytest.raises(NotImplementedError):
        decode_audio(None)
    with pytest.raises(NotImplementedError):
        frame_sample(None)


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
