"""Markdown chunking operators (SURVEY §2.H H1-H4, §2.A A1-A3).

Reference semantics (src/rag/doc_processing.py):
 * H1 header split: split at ATX headings ``#``..``######``, carrying the
   heading path as metadata (doc_processing.py:28-38, 92).
 * H2 fixed-size sub-chunking: any chunk longer than ``max_chunk_size``
   (4096 chars, doc_processing.py:25) is sliced into contiguous windows
   (doc_processing.py:135-158) — lossless, reassembly == original.
 * H3 title derivation: ``chunk_title`` = last header, ``enhanced_title`` =
   headers joined with " -> ", ``doc_name`` = Header1 or filename fallback
   (doc_processing.py:112-132).
 * H4 setext→ATX rewrite: ``Title\\n====`` → ``# Title`` (convert_headings.py:18-19).

Spark-first: H2/H3/H4 are pure Catalyst expressions (sequence/transform/
explode, regexp) — JVM codegen, no Python. H1 (stateful header-stack walk)
is an Arrow-batched pandas UDF returning ARRAY<STRUCT> that we explode;
one pass per document, parallel over files.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

MAX_CHUNK_SIZE = 4096  # reference doc_processing.py:25 / config.py:299

_HEADER_SPLIT_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("headers", T.ArrayType(T.StringType())),
            T.StructField("content", T.StringType()),
        ]
    )
)

_ATX = re.compile(r"^(#{1,6})\s+(.*?)\s*#*\s*$")


def _split_markdown(text: str) -> list[dict]:
    """Header-stack walk over one markdown document.

    Matches the reference's MarkdownHeaderTextSplitter configuration
    (doc_processing.py:28-38): split on levels 1-6, heading lines become
    metadata (stripped from content), deeper levels reset when a shallower
    heading appears. ``headers`` is the heading path root→leaf.
    """
    if text is None:
        return []
    stack: list[tuple[int, str]] = []  # (level, title)
    chunks: list[dict] = []
    buf: list[str] = []

    def flush():
        content = "\n".join(buf).strip()
        if content:
            chunks.append(
                {"headers": [t for _, t in stack], "content": content}
            )
        buf.clear()

    in_code = False
    for line in text.split("\n"):
        if line.lstrip().startswith("```"):
            in_code = not in_code
            buf.append(line)
            continue
        m = None if in_code else _ATX.match(line)
        if m:
            flush()
            level = len(m.group(1))
            while stack and stack[-1][0] >= level:
                stack.pop()
            stack.append((level, m.group(2)))
        else:
            buf.append(line)
    flush()
    if not chunks and text.strip() == "":
        return []
    return chunks


@pandas_udf(_HEADER_SPLIT_SCHEMA)
def markdown_header_split(texts: pd.Series) -> pd.Series:
    return texts.map(_split_markdown)


def split_documents(
    df: DataFrame,
    text_col: str = "text",
    url_col: str = "doc_url",
    max_chunk_size: int = MAX_CHUNK_SIZE,
) -> DataFrame:
    """Full reference chunking pipeline: header split (H1) → title metadata
    (H3) → fixed-size sub-chunk (H2). One row in → N chunk rows out.

    Output: original cols + (headers, chunk_title, enhanced_title, doc_name,
    chunk_seq, document).
    """
    exploded = (
        df.withColumn("__chunks", markdown_header_split(F.col(text_col)))
        .select("*", F.posexplode("__chunks").alias("__hseq", "__chunk"))
        .drop("__chunks")
        .withColumn("headers", F.col("__chunk.headers"))
        .withColumn("__content", F.col("__chunk.content"))
        .drop("__chunk")
    )
    # H3 title metadata (reference doc_processing.py:112-132)
    filename = F.regexp_extract(F.col(url_col), r"([^/]+?)(\.mdx?)?$", 1)
    titled = (
        exploded.withColumn("chunk_title", F.coalesce(F.try_element_at("headers", F.lit(-1)), filename))
        .withColumn(
            "enhanced_title",
            F.when(F.size("headers") > 0, F.array_join("headers", " -> ")).otherwise(filename),
        )
        .withColumn("doc_name", F.coalesce(F.try_element_at("headers", F.lit(1)), filename))
    )
    # H2 sub-chunking — pure builtins, lossless contiguous slices
    sub = subchunk(titled, "__content", max_chunk_size, seq_col="__sub_seq", out_col="document")
    w_seq = (
        F.row_number().over(Window.partitionBy(url_col).orderBy("__hseq", "__sub_seq"))
        - 1
    )
    return (
        sub.withColumn("chunk_seq", w_seq.cast("int"))
        .drop("__hseq", "__sub_seq", "__content")
    )


def subchunk(
    df: DataFrame,
    text_col: str,
    max_chunk_size: int = MAX_CHUNK_SIZE,
    seq_col: str = "chunk_seq",
    out_col: str = "chunk",
) -> DataFrame:
    """H2: slice text into contiguous ``max_chunk_size``-char windows with
    sequence/transform/posexplode — no UDF, lossless (concat of slices ==
    original; reference doc_processing.py:155-158)."""
    n_slices = F.greatest(
        F.lit(0), F.floor((F.length(F.col(text_col)) - 1) / max_chunk_size)
    ).cast("int")
    slices = F.transform(
        F.sequence(F.lit(0), n_slices),
        lambda i: F.col(text_col).substr(
            i * max_chunk_size + 1, F.lit(max_chunk_size)
        ),
    )
    return df.select(
        "*", F.posexplode(slices).alias(seq_col, out_col)
    ).drop(text_col)


def setext_to_atx(col: Column) -> Column:
    """H4: rewrite setext headings to ATX (reference convert_headings.py:18-19):
    ``Title\\n====`` → ``# Title``; ``Title\\n----`` → ``## Title``."""
    c = F.regexp_replace(col, r"(?m)^(\S[^\n]*)\n=+[ \t]*$", "# $1")
    return F.regexp_replace(c, r"(?m)^(\S[^\n]*)\n-+[ \t]*$", "## $1")


def scan_markdown_dir(spark, path: str, skip_patterns: list[str] | None = None,
                      limit: int = 0) -> DataFrame:
    """A1-A3: recursive markdown corpus scan as a distributed file source.

    Reference: os.walk keeping .md/.mdx (doc_processing.py:230-252), regex
    skip patterns (doc_processing.py:254-264), file-count limit
    (doc_processing.py:220-226 — which exit(0)s mid-loop; we stop cleanly).
    """
    df = (
        spark.read.option("recursiveFileLookup", True)
        .option("pathGlobFilter", "*.{md,mdx}")
        .text(path, wholetext=True)
        .withColumnRenamed("value", "text")
        .withColumn("doc_url", F.input_file_name())
    )
    for pat in skip_patterns or []:
        df = df.filter(~F.col("doc_url").rlike(pat))
    if limit:
        # deterministic: order before limiting (SURVEY §2.A A3)
        df = df.orderBy("doc_url").limit(limit)
    return df
