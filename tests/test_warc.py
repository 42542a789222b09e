"""WARC ingestion gates (io/warc.py): Content-Length-exact framing,
multi-member gzip, HTTP header stripping, type pruning — the properties
that distinguish a spec parser from a split-on-blank-lines one."""

from __future__ import annotations

import gzip

import pytest
from pyspark.sql import functions as F


def test_warc_roundtrip_with_binary_crlf_bodies():
    """Bodies containing CRLF and record-separator look-alikes must
    round-trip — only length-based framing survives this."""
    from chatbot_spark.io.warc import make_warc_bytes, parse_warc_bytes

    nasty = b"line1\r\n\r\nWARC/1.0\r\nfake: header\r\n\r\nline2"
    recs = [
        ("https://a/doc/1", "2024-01-01T00:00:00Z", "plain text"),
        ("https://a/doc/2", "2024-01-01T00:00:00Z", nasty),
        ("https://a/doc/3", "2024-01-01T00:00:00Z", ""),
    ]
    for gz in (False, True):
        out = parse_warc_bytes(make_warc_bytes(recs, gzipped=gz))
        assert [r["url"] for r in out] == [r[0] for r in recs]
        assert out[1]["content"] == nasty
        assert out[2]["content"] == b""


def test_warc_multi_member_gzip_and_determinism():
    from chatbot_spark.io.warc import make_warc_bytes, parse_warc_bytes

    recs = [(f"https://a/{i}", "2024-01-01T00:00:00Z", f"doc {i}") for i in range(5)]
    blob = make_warc_bytes(recs, gzipped=True)
    # one gzip member per record (the Common Crawl offset-index layout)
    assert blob.count(b"\x1f\x8b\x08") == 5
    assert blob == make_warc_bytes(recs, gzipped=True)  # mtime=0 ⇒ stable
    assert [r["content"].decode() for r in parse_warc_bytes(blob)] == [
        f"doc {i}" for i in range(5)
    ]


def test_warc_type_pruning_and_http_stripping():
    from chatbot_spark.io.warc import parse_warc_bytes

    http_body = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<html>hi</html>"
    )
    raw = b"".join(
        [
            _rec("warcinfo", "", b"software: test"),
            _rec(
                "response",
                "https://a/p",
                http_body,
                ctype="application/http; msgtype=response",
            ),
            _rec("request", "https://a/p", b"GET /p HTTP/1.1\r\n\r\n"),
            _rec("resource", "https://a/r", b"raw resource"),
        ]
    )
    out = parse_warc_bytes(raw)
    assert [(r["warc_type"], r["content"]) for r in out] == [
        ("response", b"<html>hi</html>"),  # HTTP headers stripped
        ("resource", b"raw resource"),
    ]
    # record_idx counts ALL records, including pruned ones
    assert [r["record_idx"] for r in out] == [1, 3]
    # stripping off => the raw HTTP message comes through
    keep = parse_warc_bytes(raw, strip_http_headers=False)
    assert keep[0]["content"] == http_body


def test_warc_malformed_raises():
    from chatbot_spark.io.warc import parse_warc_bytes

    with pytest.raises(ValueError, match="malformed WARC"):
        parse_warc_bytes(b"NOT-A-WARC\r\n\r\n")


def _rec(rtype: str, url: str, body: bytes, ctype: str = "text/plain") -> bytes:
    head = (
        b"WARC/1.0\r\n"
        + f"WARC-Type: {rtype}\r\n".encode()
        + (f"WARC-Target-URI: {url}\r\n".encode() if url else b"")
        + f"Content-Type: {ctype}\r\n".encode()
        + f"Content-Length: {len(body)}\r\n".encode()
        + b"\r\n"
    )
    return head + body + b"\r\n\r\n"


def test_warc_spark_parse_distributed(spark, tmp_path):
    """The Spark leg: 3 .warc.gz segment files → one mapInPandas parse;
    every record recovered with its file attribution, gzip members
    inflated per file."""
    from chatbot_spark.io.warc import parse_warc, write_warc_fixture

    want = {}
    for s in range(3):
        recs = [
            (f"https://c/{s}/{i}", "2024-01-01T00:00:00Z", f"seg{s} doc{i} αβ")
            for i in range(4)
        ]
        write_warc_fixture(str(tmp_path / f"seg{s}.warc.gz"), recs)
        want.update({u: b for u, _, b in recs})
    got = {
        r["url"]: r["content"].decode("utf-8")
        for r in parse_warc(spark, str(tmp_path / "*.warc.gz")).collect()
    }
    assert got == want
    nf = (
        parse_warc(spark, str(tmp_path / "*.warc.gz"))
        .select(F.countDistinct("file").alias("n"))
        .first()["n"]
    )
    assert nf == 3
