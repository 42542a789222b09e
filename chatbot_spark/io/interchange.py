"""JSON interchange: bulk load + export (SURVEY §2.A A4/A5).

Reference format (src/tools/load.py:121-146 / extract.py:62-85): a JSON
array of ``{id, embedding, document, metadata, component_code}`` records.
The reference loads with per-row INSERT + CAST(... AS VECTOR/JSON) and a
no-cast fallback (load.py:175-186), and exports with a LIMIT/OFFSET
pagination loop (extract.py:129-151). Both are client-cursor artifacts:
in Spark the load is one schema-enforced distributed read (casts happen at
the scan; malformed rows go to a PERMISSIVE corrupt-record column instead
of a fallback INSERT), and the export is one distributed write — no
pagination. ``total`` caps rows like the reference's --total flag.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from chatbot_spark.schemas import INTERCHANGE

EXPORT_FIELDS = ["id", "embedding", "document", "metadata", "component_code"]  # extract.py:19


def load_json_records(
    spark: SparkSession, path: str, corpus_path: str | None = None,
    array_format: bool = True,
) -> DataFrame:
    """A4: read interchange JSON into the corpus schema.
    The reference's CAST chain (load.py:121-146) becomes a declared read
    schema; its fallback-INSERT becomes PERMISSIVE mode (bad rows surface
    in _corrupt_record rather than silently inserting uncast).

    ``array_format=True`` reads the reference's layout (ONE JSON array per
    file, extract.py:162-166) via multiLine; pass False for JSON-lines
    files (what ``export_json``/Spark writes) — multiLine on a lines file
    silently parses only the first record."""
    schema = T.StructType(
        list(INTERCHANGE.fields)
        + [T.StructField("_corrupt_record", T.StringType(), True)]
    )
    df = (
        spark.read.schema(schema)
        .option("multiLine", array_format)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
        .cache()  # Spark requires materialization before filtering on the
        # corrupt-record column (QUERY_ONLY_CORRUPT_RECORD_COLUMN)
    )
    good = (
        df.filter(F.col("_corrupt_record").isNull())
        .drop("_corrupt_record")
        .withColumn("component_code", F.coalesce("component_code", F.lit(0)).cast("int"))
    )
    if corpus_path:
        good.write.mode("append").partitionBy("component_code").parquet(corpus_path)
    return good


def export_json(
    corpus: DataFrame, output_path: str, total: int = -1, fields: list[str] | None = None
) -> None:
    """A5: export the corpus as JSON records (one distributed write; the
    reference's 500-row OFFSET pagination is unnecessary set-at-a-time)."""
    out = corpus.select(*(fields or EXPORT_FIELDS))
    if total and total > 0:
        out = out.limit(total)
    out.write.mode("overwrite").json(output_path)
