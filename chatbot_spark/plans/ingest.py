"""Document ingestion pipeline (SURVEY §3.3) — the reference's write path
re-expressed as one Spark job.

Reference flow: MarkdownDocumentsLoader.load → parse_md (header split, size
check, sub-chunk, metadata) → batched insert with uuid ids + component_code
into the LIST partition (embed_docs.py / doc_embedder.py:116-168, 90-114).
Client-side batching (64/4/100-row batches) is a JDBC artifact — Spark's
task parallelism replaces it; the limit is honored pre-embed.

One job: scan → setext rewrite → header split → sub-chunk → titles →
embed (Arrow-batched) → uuid ids → component join → partitioned write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chatbot_spark.operators.chunking import (
    MAX_CHUNK_SIZE,
    scan_markdown_dir,
    setext_to_atx,
    split_documents,
)
from chatbot_spark.operators.embed import embed_documents


def ingest_markdown(
    spark: SparkSession,
    doc_base: str,
    component: str = "observer",
    component_code: int = 1,
    skip_patterns: list[str] | None = None,
    limit: int = 0,
    max_chunk_size: int = MAX_CHUNK_SIZE,
    backend: str = "hash",
    dim: int = 64,
    output_path: str | None = None,
) -> DataFrame:
    """Full §3.3 pipeline from a markdown directory. Returns the corpus
    DataFrame (and writes it partitioned by component_code when
    ``output_path`` is given). Default skip pattern mirrors the CLI
    default ["oracle"] (embed_docs.py:36-42)."""
    docs = scan_markdown_dir(
        spark, doc_base, skip_patterns=skip_patterns if skip_patterns is not None else ["oracle"],
        limit=limit,
    )
    return ingest_documents(
        docs, component=component, component_code=component_code,
        max_chunk_size=max_chunk_size, backend=backend, dim=dim,
        output_path=output_path,
    )


def ingest_documents(
    docs: DataFrame,
    component: str = "observer",
    component_code: int = 1,
    text_col: str = "text",
    url_col: str = "doc_url",
    max_chunk_size: int = MAX_CHUNK_SIZE,
    backend: str = "hash",
    dim: int = 64,
    output_path: str | None = None,
) -> DataFrame:
    """Chunk + embed + id a documents DataFrame into the corpus schema
    (SURVEY §1.3): (id, embedding, document, metadata, component_code)."""
    normalized = docs.withColumn(text_col, setext_to_atx(F.col(text_col)))
    chunks = split_documents(normalized, text_col=text_col, url_col=url_col,
                             max_chunk_size=max_chunk_size)
    embedded = embed_documents(chunks, text_col="document", backend=backend, dim=dim)
    corpus = embedded.select(
        F.expr("uuid()").alias("id"),  # H7 (doc_embedder.py:110)
        F.col("embedding"),
        F.col("document"),
        F.map_from_arrays(
            F.array(
                F.lit("doc_url"), F.lit("doc_name"), F.lit("component"),
                F.lit("chunk_title"), F.lit("enhanced_title"),
            ),
            F.array(
                F.col(url_col), F.col("doc_name"), F.lit(component),
                F.col("chunk_title"), F.col("enhanced_title"),
            ),
        ).alias("metadata"),
        F.lit(component_code).cast("int").alias("component_code"),
    )
    if output_path:
        corpus.write.mode("append").partitionBy("component_code").parquet(output_path)
        return corpus.sparkSession.read.parquet(output_path).filter(
            F.col("component_code") == component_code
        )
    return corpus
