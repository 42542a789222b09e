from chatbot_spark.functions.vector import (
    cosine_distance,
    cosine_similarity,
    dot_product,
    l2_distance,
    l2_norm,
    normalize,
    sq_l2_distance,
)

__all__ = [
    "cosine_distance",
    "cosine_similarity",
    "dot_product",
    "l2_distance",
    "l2_norm",
    "normalize",
    "sq_l2_distance",
]
