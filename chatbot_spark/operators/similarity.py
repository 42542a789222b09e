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
) -> DataFrame:
    """Top-k most-similar corpus rows per query under cosine similarity.
    Output: (query_id, neighbor_id, rank, sim)."""
    q = queries_df.select(F.col(query_id).alias("__qid"), F.col(query_vec).alias("__qvec"))
    pairs = corpus_df.join(F.broadcast(q)).select(
        F.col("__qid").alias(query_id),
        F.col(corpus_id).alias("neighbor_id"),
        cosine_similarity(F.col("__qvec"), F.col(corpus_vec)).alias("sim"),
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
