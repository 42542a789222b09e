"""WARC (Web ARChive, ISO 28500) ingestion — the Common Crawl wire
format, i.e. THE 100 TB training-data source. The reference ingests
markdown trees / archives / git repos (src/common/download.py:16-69,
covered by plans/ingest.py); a web-scale corpus arrives as .warc.gz
instead, so the engine grows a real parser for it.

Format essentials (ISO 28500 / WARC 1.0-1.1):
  record   = "WARC/1.x" CRLF *(name ":" value CRLF) CRLF body CRLF CRLF
  body len = the Content-Length header, EXACTLY (bodies are binary and
             contain CRLFs — splitting on blank lines corrupts them;
             only length-based framing is correct)
  .warc.gz = one gzip MEMBER per record, concatenated (the property
             that lets Common Crawl index byte offsets); any compliant
             reader must handle multi-member streams.

Execution model: `spark.read.format("binaryFile")` (one row per file,
whole bytes) → ONE `mapInPandas` pass that inflates + frames records.
File-per-task is the batch-parallelism contract here: Common Crawl
ships ~1 GB segment files by design, so a 100 TB crawl is ~100k files
— far wider than any executor fleet. (Record-level splitting inside one
file needs the external cdx offset index; out of scope, documented.)
Header names are case-insensitive per spec; `WARC-Type`, `Content-Type`
and `Content-Length` are always emitted by crawlers.

Only `response`/`resource`/`conversion` records carry page content;
`parse_warc(..., types=...)` prunes the rest (request/metadata/warcinfo)
inside the kernel, before anything crosses Arrow.

HTTP payload handling: a `response` body is an HTTP message —
status line + headers + payload. `strip_http_headers=True` (default)
frames the payload at the first CRLFCRLF, the standard CC-MAIN
extraction step.
"""

from __future__ import annotations

import gzip
import io

from pyspark.sql import DataFrame, SparkSession

CONTENT_TYPES = ("response", "resource", "conversion")

_SCHEMA = (
    "file STRING, record_idx INT, warc_type STRING, url STRING, "
    "warc_date STRING, content_type STRING, content BINARY"
)


def _split_members(raw: bytes) -> bytes:
    """Inflate a possibly multi-member gzip stream (or pass through
    plain bytes). gzip.decompress handles concatenated members."""
    if raw[:2] == b"\x1f\x8b":
        return gzip.decompress(raw)
    return raw


def parse_warc_bytes(
    raw: bytes, strip_http_headers: bool = True, types=CONTENT_TYPES
) -> list[dict]:
    """Frame all records in one (decompressed) WARC stream. Pure
    function — the Spark kernel and the tests share it."""
    data = _split_members(raw)
    out = []
    pos, idx = 0, 0
    n = len(data)
    while pos < n:
        # skip inter-record padding (spec: two CRLFs after each body)
        while pos < n and data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        if not data[pos : pos + 5] == b"WARC/":
            raise ValueError(
                f"malformed WARC: expected version line at offset {pos}"
            )
        hdr_end = data.index(b"\r\n\r\n", pos)
        headers: dict[str, str] = {}
        lines = data[pos:hdr_end].split(b"\r\n")
        for line in lines[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("ascii")] = v.strip().decode(
                "utf-8", errors="replace"
            )
        length = int(headers["content-length"])
        body = data[hdr_end + 4 : hdr_end + 4 + length]
        pos = hdr_end + 4 + length
        rec_type = headers.get("warc-type", "")
        if rec_type in types:
            if (
                strip_http_headers
                and rec_type == "response"
                and headers.get("content-type", "").startswith("application/http")
            ):
                cut = body.find(b"\r\n\r\n")
                if cut >= 0:
                    body = body[cut + 4 :]
            out.append(
                {
                    "record_idx": idx,
                    "warc_type": rec_type,
                    "url": headers.get("warc-target-uri", ""),
                    "warc_date": headers.get("warc-date", ""),
                    "content_type": headers.get("content-type", ""),
                    "content": body,
                }
            )
        idx += 1
    return out


def parse_warc(
    spark: SparkSession,
    path: str,
    strip_http_headers: bool = True,
    types=CONTENT_TYPES,
) -> DataFrame:
    """Distributed WARC ingest: one row per content-bearing record.
    Columns: (file, record_idx, warc_type, url, warc_date, content_type,
    content BINARY). Pair with `F.decode(col, 'utf-8')` for text crawls."""
    import pandas as pd

    src = spark.read.format("binaryFile").load(path).select("path", "content")

    def kernel(batches):
        for pdf in batches:
            rows = []
            for path_, raw in zip(pdf["path"], pdf["content"]):
                for rec in parse_warc_bytes(
                    bytes(raw), strip_http_headers=strip_http_headers, types=types
                ):
                    rec["file"] = path_
                    rows.append(rec)
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "file", "record_idx", "warc_type", "url",
                        "warc_date", "content_type", "content",
                    ],
                )

    return src.mapInPandas(kernel, _SCHEMA)


def make_warc_bytes(records, gzipped: bool = True) -> bytes:
    """Serialize (url, date, content-bytes[, warc_type]) tuples to a
    spec-conformant WARC stream — one gzip member per record when
    ``gzipped`` (the Common Crawl layout). Test/fixture helper and the
    write half of a round-trip check; not a bulk sink."""
    chunks = []
    for rec in records:
        url, date, body = rec[0], rec[1], rec[2]
        rec_type = rec[3] if len(rec) > 3 else "resource"
        if isinstance(body, str):
            body = body.encode("utf-8")
        head = (
            b"WARC/1.0\r\n"
            + f"WARC-Type: {rec_type}\r\n".encode()
            + f"WARC-Target-URI: {url}\r\n".encode()
            + f"WARC-Date: {date}\r\n".encode()
            + b"Content-Type: text/plain\r\n"
            + f"Content-Length: {len(body)}\r\n".encode()
            + b"\r\n"
        )
        raw = head + body + b"\r\n\r\n"
        # mtime=0: deterministic member bytes (default stamps wall-clock)
        chunks.append(gzip.compress(raw, mtime=0) if gzipped else raw)
    return b"".join(chunks)


def write_warc_fixture(path: str, records, gzipped: bool = True) -> None:
    with io.open(path, "wb") as f:
        f.write(make_warc_bytes(records, gzipped=gzipped))
