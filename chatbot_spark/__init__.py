"""chatbot_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of ob-labs/ChatBot (RAG-over-vector-store),
re-expressed Spark-first for 100 TB scale.

The reference (read-only at /root/reference) is a Python RAG pipeline that
delegates storage + ANN search to OceanBase. This engine reproduces its full
data-processing surface as DataFrame/SQL batch operators — corpus ingestion,
markdown chunking, embedding, vector index build, exact + approximate top-k
similarity search, partition-scoped retrieval, hybrid rerank — plus the
LLM-data-pipeline operators the reference implies but outsources (dedup,
similarity join, text analysis, multimodal columns).

Layout (mirrors SURVEY.md §2 operator inventory):
  session     SparkSession builder tuned for the target (AQE, zstd, Arrow)
  schemas     canonical StructTypes (SURVEY.md §1.3)
  io          sources/sinks: parquet tables, markdown corpus scan, JSON interchange
  functions   column-level expressions: vector distances, text scalars
  operators   chunking, embedding, top-k search, ANN index, dedup, text stats,
              rerank, similarity join, multimodal
  plans       end-to-end pipelines: ingest (§3.3), retrieve (§3.1/3.2), catalog (§2.K)
  streaming   Structured Streaming ingest of the events table (extension)
"""

__version__ = "0.1.0"
