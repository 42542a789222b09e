"""Multimodal column operators (SURVEY §2.J J5) — image/audio/video as
opaque BINARY columns with typed metadata, processed by Arrow-batched
``mapInPandas`` stages.

The container has no image/audio codecs, so the decode kernels are
deterministic fakes / clearly-marked stubs (NotImplementedError) — but the
Spark-side plumbing is real and tested: schemas, binaryFile source,
mapInPandas batch shapes, partition sizing. Swapping a real decoder in
changes only the kernel body.

Scale notes: binary payloads ride in the same row as metadata; keep
``spark.sql.files.maxPartitionBytes`` at 128 MB so a partition of
multi-MB blobs still fits executor memory; feature extraction is
mapInPandas (Arrow zero-copy batches), never a row-at-a-time UDF.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("sha", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
    ]
)


def read_binary_dir(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """J5 source: the binaryFile format gives (path, modificationTime,
    length, content BINARY) — the multimodal analog of the markdown scan."""
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", True)
        .load(path)
    )
    return df.select(
        F.col("path").alias("media_id"),
        F.lit("image").alias("modality"),
        F.col("content"),
        F.lit(None).cast("string").alias("mime"),
        F.create_map(F.lit("length"), F.col("length").cast("string")).alias("meta"),
    )


def _fake_decode_image(content: bytes) -> tuple[int, int]:
    """STUB decode: a real kernel would use PIL/libvips here (absent in
    this container). Deterministic fake: dimensions derived from content
    hash so tests are stable."""
    import hashlib

    h = hashlib.md5(content or b"").digest()
    return 64 + h[0] % 192, 64 + h[1] % 192


def extract_image_features(df: DataFrame, dim: int = 16) -> DataFrame:
    """Decode + feature-extract as ONE mapInPandas pass (batch in, batch
    out — the production shape for a real CV model)."""
    import hashlib

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from chatbot_spark.operators.embed import hash_embed_one

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                content = bytes(r["content"] or b"")
                w, h = _fake_decode_image(content)
                sha = hashlib.sha256(content).hexdigest()
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "n_bytes": len(content),
                        "sha": sha,
                        "width": w,
                        "height": h,
                        "embedding": hash_embed_one(sha, dim),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields])

    return df.mapInPandas(kernel, IMAGE_FEATURES_SCHEMA)


def decode_audio(df: DataFrame) -> DataFrame:
    """STUB: real audio decode requires codecs not in this container."""
    raise NotImplementedError(
        "audio decode needs soundfile/ffmpeg (not installed); the plumbing "
        "pattern is extract_image_features — swap the kernel body"
    )


def frame_sample(df: DataFrame, every_n: int = 30) -> DataFrame:
    """STUB: video frame sampling requires ffmpeg (not installed)."""
    raise NotImplementedError(
        "video frame sampling needs ffmpeg (not installed); plumbing "
        "pattern: mapInPandas yielding one row per sampled frame"
    )
