"""Chunking operator tests (SURVEY §2.H H1-H4, golden semantics §5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from chatbot_spark.operators.chunking import (
    _split_markdown,
    setext_to_atx,
    split_documents,
    subchunk,
)

MD = """# Title

intro text

## Section A

alpha body

### Deep

deep body

## Section B

beta body
"""


def test_split_markdown_header_paths():
    chunks = _split_markdown(MD)
    assert [c["headers"] for c in chunks] == [
        ["Title"],
        ["Title", "Section A"],
        ["Title", "Section A", "Deep"],
        ["Title", "Section B"],
    ]
    assert chunks[1]["content"] == "alpha body"


def test_split_markdown_shallower_heading_resets_stack():
    chunks = _split_markdown("### deep\n\nx\n\n# top\n\ny\n")
    assert chunks[0]["headers"] == ["deep"]
    assert chunks[1]["headers"] == ["top"]


def test_split_markdown_code_fence_ignored():
    text = "# T\n\n```\n# not a heading\n```\n\nbody"
    chunks = _split_markdown(text)
    assert len(chunks) == 1
    assert "# not a heading" in chunks[0]["content"]


def test_split_markdown_no_headers():
    chunks = _split_markdown("just text\nno headings")
    assert chunks == [{"headers": [], "content": "just text\nno headings"}]


def test_subchunk_lossless(spark):
    df = spark.createDataFrame([(1, "a" * 250), (2, "b" * 100), (3, "c")], "id INT, t STRING")
    out = subchunk(df, "t", max_chunk_size=100, seq_col="seq", out_col="chunk")
    rows = out.orderBy("id", "seq").collect()
    # 250 chars → 3 slices; reassembly == original (doc_processing.py:155-158)
    joined = "".join(r["chunk"] for r in rows if r["id"] == 1)
    assert joined == "a" * 250
    assert [r["seq"] for r in rows if r["id"] == 1] == [0, 1, 2]
    assert len([r for r in rows if r["id"] == 3]) == 1


def test_split_documents_pipeline(spark):
    df = spark.createDataFrame([(MD, "docs/guide/intro.md")], "text STRING, doc_url STRING")
    out = split_documents(df, "text", "doc_url", max_chunk_size=4096)
    rows = out.orderBy("chunk_seq").collect()
    assert rows[0]["doc_name"] == "Title"
    assert rows[1]["chunk_title"] == "Section A"
    assert rows[2]["enhanced_title"] == "Title -> Section A -> Deep"
    assert [r["chunk_seq"] for r in rows] == [0, 1, 2, 3]


def test_split_documents_filename_fallback(spark):
    # no headings → titles fall back to the filename (doc_processing.py:123-131)
    df = spark.createDataFrame(
        [("plain text body", "repo/dir/readme_file.md")], "text STRING, doc_url STRING"
    )
    row = split_documents(df, "text", "doc_url").first()
    assert row["doc_name"] == "readme_file"
    assert row["chunk_title"] == "readme_file"


def test_setext_to_atx(spark):
    df = spark.createDataFrame([("Main\n====\n\nSub\n----\n\nbody",)], "t STRING")
    out = df.select(setext_to_atx(F.col("t")).alias("t")).first()["t"]
    assert out == "# Main\n\n## Sub\n\nbody"
