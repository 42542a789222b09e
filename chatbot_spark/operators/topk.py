"""Exact top-k similarity search (SURVEY §2.I I4/I5, §2.E E1/E2).

The reference delegates ANN top-k to OceanBase's HNSW index
(src/rag/doc_embedder.py:196-220 ``similarity_search_by_vector``;
index DDL src/tools/load.py:26, DISTANCE=L2, k=10 default src/rag/ob.py:30).
Spark-first re-expression:

  queries (small)  --broadcast-->  cross join with corpus
                                   distance expr (JVM codegen)
                                   slim projection (ids + dist only)
                                   window top-k per query

Scale notes (100 TB corpus, ~25 B rows at 1024-d):
 * The query side is broadcast — the corpus never shuffles for the join;
   the only shuffle is the (query_id, corpus_id, dist) projection feeding
   the per-query window (~24 B/row), not the vectors.
 * Ranking uses squared L2 (monotone in L2) — no sqrt per pair.
 * Partition restriction (reference ``partition_names``) is a plain
   ``component_code IN`` filter that Catalyst turns into Parquet partition
   pruning — scan only the named partitions, exactly like the reference's
   LIST partitions.
 * This exact operator is the correctness oracle; at full scale the ANN
   operators (chatbot_spark.operators.ann) cut the candidate set first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from chatbot_spark.functions.vector import DISTANCES, l2_distance, sq_l2_distance

DEFAULT_SEARCH_LIMIT = 10  # reference src/rag/ob.py:30
DEFAULT_RERANK_LIMIT = 10  # reference src/rag/ob.py:31


def per_component_quota(n_components: int) -> int:
    """Per-partition search limit when not reranking:
    ``max(3, 13 - 3*n)`` (reference src/rag/rag_graph.py:371-375)."""
    return max(3, 13 - 3 * n_components)


def knn_join(
    queries_df: DataFrame,
    corpus_df: DataFrame,
    k: int = DEFAULT_SEARCH_LIMIT,
    metric: str = "l2",
    query_id: str = "query_id",
    query_vec: str = "query_embedding",
    corpus_id: str = "id",
    corpus_vec: str = "embedding",
    extra_cols: list[str] | None = None,
    component_codes: list[int] | None = None,
    include_distance: bool = True,
    two_phase: bool = True,
) -> DataFrame:
    """Exact k-nearest-neighbors of each query row over the corpus.

    Returns (query_id, neighbor_id, rank[, dist, extra_cols...]) with
    rank 1..k per query ordered by ascending distance, ties broken by
    corpus id for determinism.

    ``two_phase`` (default): every query's candidate set is the WHOLE
    corpus, so a single window keyed by query_id funnels N rows into Q
    reducer groups — with few queries that is a built-in skew hotspot at
    scale. Phase 1 ranks within (query_id, scan-partition-id): the same
    slim rows shuffle once but hash across Q×P balanced groups, each
    emitting ≤ k; phase 2 ranks the surviving Q×P×k rows. Output is
    bit-identical to the single-phase plan (total order (dist, id) in
    both phases).
    """
    if component_codes is not None:
        # reference partition_names pushdown (doc_embedder.py:191-192)
        corpus_df = corpus_df.filter(F.col("component_code").isin(component_codes))

    rank_dist = _rank_distance(metric)

    q = queries_df.select(
        F.col(query_id).alias("__qid"), F.col(query_vec).alias("__qvec")
    )
    extra = list(extra_cols or [])
    pairs = corpus_df.join(F.broadcast(q)).select(
        F.col("__qid").alias(query_id),
        F.col(corpus_id).alias("neighbor_id"),
        rank_dist(F.col("__qvec"), F.col(corpus_vec)).alias("__rdist"),
        *extra,
    )

    if two_phase:
        w1 = Window.partitionBy(query_id, "__pid").orderBy(
            F.col("__rdist").asc(), F.col("neighbor_id").asc()
        )
        pairs = (
            pairs.withColumn("__pid", F.spark_partition_id())
            .withColumn("__lrank", F.row_number().over(w1))
            .filter(F.col("__lrank") <= k)
            .drop("__pid", "__lrank")
        )

    w = Window.partitionBy(query_id).orderBy(
        F.col("__rdist").asc(), F.col("neighbor_id").asc()
    )
    out = pairs.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
    if include_distance:
        out = out.withColumn("dist", _reported(metric, F.col("__rdist")))
    return out.drop("__rdist")


def hard_negative_join(
    queries_df: DataFrame,
    corpus_df: DataFrame,
    k: int = DEFAULT_SEARCH_LIMIT,
    exclusion_radius: float = 0.0,
    metric: str = "l2",
    query_id: str = "query_id",
    query_vec: str = "query_embedding",
    corpus_id: str = "id",
    corpus_vec: str = "embedding",
) -> DataFrame:
    """Hard-negative mining for contrastive/embedding-model training (the
    BGE-style dataset-construction step): per anchor, the k NEAREST
    corpus rows that are not too near — rows within ``exclusion_radius``
    (the anchor itself at distance 0, near-duplicates, paraphrases) are
    excluded BEFORE ranking, so the survivors are the hardest VALID
    negatives. Same plan as :func:`knn_join` (broadcast anchors, one
    scan, two-phase skew-safe window) with the exclusion pushed into the
    scan as a map-side filter — at 100 TB the filter costs nothing and
    the candidate set is exact, not a top-k-then-filter approximation
    (which could starve below k when an anchor has many near-dups).

    ``exclusion_radius`` is in REPORTED units (the same units knn_join's
    ``dist`` column uses: L2 distance, or cosine DISTANCE = 1 − sim):
    rows with dist <= r are excluded."""
    if metric not in ("l2", "cosine"):
        raise ValueError(f"unsupported metric {metric!r}")
    rank_dist = _rank_distance(metric)
    q = queries_df.select(
        F.col(query_id).alias("__qid"), F.col(query_vec).alias("__qvec")
    )
    pairs = corpus_df.join(F.broadcast(q)).select(
        F.col("__qid").alias(query_id),
        F.col(corpus_id).alias("neighbor_id"),
        rank_dist(F.col("__qvec"), F.col(corpus_vec)).alias("__rdist"),
    )
    # l2 ranks on SQUARED distance — exclude in squared units so the
    # comparison happens on the exact ranking value (no extra sqrt whose
    # rounding could disagree with the oracle at the boundary)
    thresh = (
        float(exclusion_radius) ** 2 if metric == "l2" else float(exclusion_radius)
    )
    pairs = pairs.filter(F.col("__rdist") > F.lit(thresh))
    order = [F.col("__rdist").asc(), F.col("neighbor_id").asc()]
    w1 = Window.partitionBy(query_id, "__pid").orderBy(*order)
    pairs = (
        pairs.withColumn("__pid", F.spark_partition_id())
        .withColumn("__lrank", F.row_number().over(w1))
        .filter(F.col("__lrank") <= k)
        .drop("__pid", "__lrank")
    )
    w = Window.partitionBy(query_id).orderBy(*order)
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .withColumn("dist", _reported(metric, F.col("__rdist")))
        .drop("__rdist")
    )


def knn_join_per_component(
    queries_df: DataFrame,
    corpus_df: DataFrame,
    n_components: int | None = None,
    k: int | None = None,
    metric: str = "l2",
    **kwargs,
) -> DataFrame:
    """Multi-partition fan-out search (reference rag_graph.py:365-417, I8/E2):
    top-k *per (query, component)* with the reference's quota heuristic.

    The reference loops components and issues one search per partition
    (rag_graph.py:389-401); set-at-a-time this is one filtered scan with a
    window keyed by (query, component) — one job, no N-queries loop.
    """
    if k is None:
        k = DEFAULT_RERANK_LIMIT if n_components is None else per_component_quota(n_components)
    query_id = kwargs.get("query_id", "query_id")
    query_vec = kwargs.get("query_vec", "query_embedding")
    corpus_id = kwargs.get("corpus_id", "id")
    corpus_vec = kwargs.get("corpus_vec", "embedding")
    component_codes = kwargs.get("component_codes")

    if component_codes is not None:
        corpus_df = corpus_df.filter(F.col("component_code").isin(component_codes))

    rank_dist = _rank_distance(metric)
    q = queries_df.select(
        F.col(query_id).alias("__qid"), F.col(query_vec).alias("__qvec")
    )
    pairs = corpus_df.join(F.broadcast(q)).select(
        F.col("__qid").alias(query_id),
        F.col("component_code"),
        F.col(corpus_id).alias("neighbor_id"),
        rank_dist(F.col("__qvec"), F.col(corpus_vec)).alias("__rdist"),
    )
    w = Window.partitionBy(query_id, "component_code").orderBy(
        F.col("__rdist").asc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .withColumn("dist", _reported(metric, F.col("__rdist")))
        .drop("__rdist")
    )


def _rank_distance(metric: str):
    """Distance used for ORDERING — squared L2 ranks identically to L2."""
    if metric == "l2":
        return sq_l2_distance
    return DISTANCES[metric]


def _reported(metric: str, rank_dist: Column) -> Column:
    """Convert the ranking distance back to the metric's reported value."""
    if metric == "l2":
        return F.sqrt(rank_dist)
    return rank_dist


def radius_join(
    queries_df: DataFrame,
    corpus_df: DataFrame,
    radius: float,
    metric: str = "l2",
    query_id: str = "query_id",
    query_vec: str = "query_embedding",
    corpus_id: str = "id",
    corpus_vec: str = "embedding",
    component_codes: list[int] | None = None,
) -> DataFrame:
    """Range search (FAISS ``range_search`` / the vector-store
    score-threshold retrieval mode): ALL corpus rows within ``radius`` of
    each query — no k, no ranking window. The plan is the top-k join's
    first half only: broadcast query side onto the corpus scan, distance
    in the same deterministic fold as :func:`knn_join`, and a pushed
    filter instead of any shuffle — range search is embarrassingly
    parallel (output size is data-dependent, which is exactly why it has
    no per-query window to skew).

    For cosine, ``radius`` is a minimum SIMILARITY (results with
    cos >= radius), matching score-threshold retriever semantics;
    for l2 it is a maximum distance."""
    if component_codes is not None:
        corpus_df = corpus_df.filter(F.col("component_code").isin(component_codes))
    q = queries_df.select(
        F.col(query_id).alias("__qid"), F.col(query_vec).alias("__qvec")
    )
    if metric == "l2":
        from chatbot_spark.functions.vector import l2_distance

        d = l2_distance(F.col("__qvec"), F.col(corpus_vec))
        keep = d <= F.lit(float(radius))
    elif metric == "cosine":
        from chatbot_spark.functions.vector import cosine_similarity

        d = cosine_similarity(F.col("__qvec"), F.col(corpus_vec))
        keep = d >= F.lit(float(radius))
    else:
        raise ValueError(f"unsupported metric {metric!r}")
    return (
        corpus_df.join(F.broadcast(q))
        .select(
            F.col("__qid").alias(query_id),
            F.col(corpus_id).alias("neighbor_id"),
            d.alias("score"),
        )
        .filter(keep)
    )
