"""Canonical schemas (SURVEY.md §1.3).

The reference's single relational table is
``corpus(id VARCHAR(4096), embedding VECTOR(1024), document LONGTEXT,
metadata JSON, component_code INT, PRIMARY KEY(id, component_code))``
LIST-partitioned by component_code with an HNSW index
(reference: src/tools/load.py:18-37). Spark mapping: Parquet partitioned
by ``component_code``; VECTOR → ARRAY<FLOAT>; JSON metadata →
MAP<STRING,STRING> so metadata predicates stay native columns.
"""

from __future__ import annotations

from pyspark.sql import types as T

# The corpus/vector table (reference load.py:18-37).
CORPUS = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("document", T.StringType(), True),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("component_code", T.IntegerType(), False),
    ]
)

# One chunk post-markdown-split (reference doc_processing.py:41-61 DocumentMeta,
# flattened; "extra allow" overflow lives in `metadata` of CORPUS).
CHUNK = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("doc_url", T.StringType(), True),
        T.StructField("doc_name", T.StringType(), True),
        T.StructField("component", T.StringType(), True),
        T.StructField("chunk_title", T.StringType(), True),
        T.StructField("enhanced_title", T.StringType(), True),
        T.StructField("chunk_seq", T.IntegerType(), True),
        T.StructField("document", T.StringType(), True),
    ]
)

# Partition dimension (reference src/rag/ob.py:35-47; DDL load.py:28-36 is
# source of truth for codes — odp=6, odc=7).
COMPONENT_MAPPING = T.StructType(
    [
        T.StructField("component", T.StringType(), False),
        T.StructField("component_code", T.IntegerType(), False),
    ]
)

# Default name→code map reproduced from the reference DDL (load.py:28-36).
# The reference's Python dict has a duplicate-"odp" bug (ob.py:43-44) which we
# deliberately do NOT replicate (SURVEY.md §7.4).
DEFAULT_COMPONENT_CODES: dict[str, int] = {
    "default_modules": 0,
    "observer": 1,
    "ocp": 2,
    "oms": 3,
    "obd": 4,
    "operator": 5,
    "odp": 6,
    "odc": 7,
    "obshell": 9,
    "miniob": 10,
}

# Search workload.
QUERIES = T.StructType(
    [
        T.StructField("query_id", T.StringType(), False),
        T.StructField("query_text", T.StringType(), True),
        T.StructField("query_embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("components", T.ArrayType(T.StringType()), True),
    ]
)

# JSON interchange record (reference load.py:121-146 / extract.py:62-85).
INTERCHANGE = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("document", T.StringType(), True),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("component_code", T.IntegerType(), True),
    ]
)

# Driver-provided synthetic tables (/root/testdata/sf*/, TESTDATA.md).
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
