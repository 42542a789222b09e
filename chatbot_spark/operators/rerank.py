"""Hybrid rerank (SURVEY §2.I I7, §2.D D4, §2.E E3/E4).

Reference: BGE-M3 ``compute_score`` fuses dense/sparse/colbert scores with
weights 0.3/0.2/0.5 (src/rag/embedding/bge.py:29-32, 254-265), then sorts
desc and keeps DEFAULT_RERANK_LIMIT=10 (rag_graph.py:405-412, ob.py:31).
Gating: rerank only when enabled AND backend supports it AND >1 component
(rag_graph.py:367-370).

Spark-first: scoring is a column expression over the (small) candidate set
— ≤ k·n_components rows per query — fused scores + a per-query window.
The scorer is pluggable like the embedding backends; the deterministic
hash scorer stands in for the cross-encoder (absent in this container).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_RERANK_LIMIT = 10  # reference ob.py:31
W_DENSE, W_SPARSE, W_COLBERT = 0.3, 0.2, 0.5  # reference bge.py:29-32
# reference bge.py:256-258: rerank inputs are capped at 512 query /
# 8192 passage tokens before scoring
MAX_QUERY_TOKENS, MAX_PASSAGE_TOKENS = 512, 8192


def truncate_tokens(text: Column, max_tokens: int) -> Column:
    """Cap `text` at `max_tokens` whitespace tokens (the engine-portable
    approximation of the reference's model-tokenizer cap, bge.py:256-258).
    Identity — byte-for-byte, whitespace included — for text under the
    cap, so scores of in-cap inputs are unchanged."""
    toks = F.split(text, r"\s+")
    return F.when(F.size(toks) <= max_tokens, text).otherwise(
        F.array_join(F.slice(toks, 1, max_tokens), " ")
    )


def fuse_scores(
    dense: Column, sparse: Column, colbert: Column,
    w_dense: float = W_DENSE, w_sparse: float = W_SPARSE, w_colbert: float = W_COLBERT,
) -> Column:
    """D4 weighted fusion — one row-wise expression."""
    return w_dense * dense + w_sparse * sparse + w_colbert * colbert


def hash_cross_score(query_text: Column, doc_text: Column) -> Column:
    """Deterministic stand-in cross-encoder: md5-derived uniform [0,1)
    from the (query, doc) pair — portable, reproducible, engine-agnostic.
    Inputs are capped like the reference's reranker (512 query / 8192
    passage tokens, bge.py:256-258)."""
    q = truncate_tokens(query_text, MAX_QUERY_TOKENS)
    d = truncate_tokens(doc_text, MAX_PASSAGE_TOKENS)
    h = F.conv(F.substring(F.md5(F.concat_ws("", q, d)), 1, 8), 16, 10)
    return h.cast("double") / F.lit(4294967296.0)


def make_bge_cross_scorer(
    model_name: str = "BAAI/bge-m3",
    w_dense: float = W_DENSE,
    w_sparse: float = W_SPARSE,
    w_colbert: float = W_COLBERT,
    batch_size: int = 64,
):
    """Real cross-encoder scorer — the model-backed twin of
    hash_cross_score (reference src/rag/embedding/bge.py:237-271: BGE-M3
    ``compute_score`` over (query, passage) pairs with
    ``max_query_length=512, max_passage_length=8192,
    weights_for_different_modes=[dense, sparse, colbert]``, reading the
    fused ``colbert+sparse+dense`` score).

    Spark shape: one Arrow batch of pairs per model call (the reference
    scores with batch_size=1, one forward pass per pair — per-Arrow-batch
    batching is the 100 TB form, batches parallel across executors), lazy
    per-executor model singleton like the embedding backends.
    FlagEmbedding isn't in this container — the UDF raises the documented
    NotImplementedError at first use; tests/test_optional_models.py runs
    the real path wherever the lib exists and pins the gate here."""
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    def score_batch(query: "pd.Series", doc: "pd.Series") -> "pd.Series":
        try:
            from FlagEmbedding import BGEM3FlagModel  # noqa: F401
        except ImportError as e:  # pragma: no cover - environment-dependent
            raise NotImplementedError(
                "FlagEmbedding not installed in this environment; "
                "use the deterministic hash_cross_score scorer instead"
            ) from e
        if not hasattr(score_batch, "_model"):  # lazy per-executor singleton
            score_batch._model = BGEM3FlagModel(model_name)
        pairs = list(zip(query.fillna("").tolist(), doc.fillna("").tolist()))
        if not pairs:
            return pd.Series([], dtype="float64")
        res = score_batch._model.compute_score(
            pairs,
            batch_size=min(len(pairs), batch_size),
            max_query_length=MAX_QUERY_TOKENS,   # reference bge.py:256
            max_passage_length=MAX_PASSAGE_TOKENS,  # reference bge.py:257
            weights_for_different_modes=[w_dense, w_sparse, w_colbert],
        )
        fused = res["colbert+sparse+dense"]  # reference bge.py:265
        return pd.Series([float(s) for s in fused])

    # real-class annotations: string hints (future-annotations) don't
    # resolve for locally-defined UDFs
    score_batch.__annotations__ = {
        "query": pd.Series, "doc": pd.Series, "return": pd.Series
    }
    return pandas_udf(T.DoubleType())(score_batch)


def cross_score(query_text: Column, doc_text: Column, scorer: str = "hash", **kwargs) -> Column:
    """Scorer registry mirroring the embedding BACKENDS factory: 'hash'
    (deterministic, engine-agnostic — the test/oracle scorer), 'bge'
    (real BGE-M3 cross-encoder, FlagEmbedding-gated), or 'tiny_cross'
    (the vendored pure-numpy cross-encoder — the real-model serving
    shape with zero blocked deps; models/tiny_encoder.py and
    MODELS_E2E.json's tiny_cross section)."""
    if scorer == "hash":
        return hash_cross_score(query_text, doc_text)
    if scorer == "bge":
        return make_bge_cross_scorer(**kwargs)(query_text, doc_text)
    if scorer == "tiny_cross":
        from chatbot_spark.models.tiny_encoder import make_tiny_cross_scorer

        return make_tiny_cross_scorer(**kwargs)(query_text, doc_text)
    raise ValueError(
        f"unknown cross scorer {scorer!r}; have ['hash', 'bge', 'tiny_cross']"
    )


def rerank(
    candidates: DataFrame,
    query_id: str = "query_id",
    score_col: str = "rerank_score",
    keep: int = DEFAULT_RERANK_LIMIT,
    tie_col: str = "neighbor_id",
) -> DataFrame:
    """E3/E4: order candidates per query by fused score desc, keep top-N."""
    w = Window.partitionBy(query_id).orderBy(F.col(score_col).desc(), F.col(tie_col).asc())
    return (
        candidates.withColumn("rerank_rank", F.row_number().over(w))
        .filter(F.col("rerank_rank") <= keep)
    )


def should_rerank(enabled: bool, backend_has_rerank: bool, n_components: int) -> bool:
    """Reference gating logic (rag_graph.py:367-370)."""
    return enabled and backend_has_rerank and n_components > 1
