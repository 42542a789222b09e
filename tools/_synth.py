"""Shared deterministic clustered synthetic corpus for the ANN benches.

One recipe, one place: center component j of cluster c is
10·frac(sin(c·131 + j·17)) plus per-(id, j) U(-0.5, 0.5) jitter from the
classic frac(sin(id·12.9898 + j·78.233)·43758.5453) hash — deterministic,
per-component independent — giving N×dim float vectors with the loosely
clustered structure real embedding corpora have. bench_ann_scale / bench_ann_filtered / bench_radius /
bench_ann_10m all import this so a tweak to the recipe cannot silently
break cross-bench comparability.
"""

from __future__ import annotations


def clustered_corpus(
    spark,
    n: int,
    dim: int = 64,
    n_clusters: int = 256,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    extra_cols: dict | None = None,
    id_start: int = 0,
):
    """(persisted corpus DataFrame) with (id_col, vec_col [, extras]).
    ``extra_cols``: name -> Column-builder fn taking the base id column
    (e.g. {"tag": lambda id_: (id_ % 100).cast("int")}).
    ``id_start``: first id — an append batch for a corpus of n rows is
    ``clustered_corpus(spark, 100_000, id_start=n)``, same recipe."""
    from pyspark.sql import functions as F

    base = spark.range(id_start, id_start + n).withColumn(
        "cl", (F.col("id") % n_clusters).cast("int")
    )

    def _frac(x):
        return x - F.floor(x)

    # per-component jitter from a deterministic hash of (id, j): F.rand
    # inside a transform lambda evaluates once per ROW, which collapsed
    # the documented U(-0.5,0.5) per-component noise to a per-row scalar
    # offset (r10 ADVICE) — frac(sin(...)) is i.i.d.-ish per (id, j) and
    # fully reproducible without a seed state
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: (
            10.0 * _frac(F.sin(F.col("cl") * 131 + j * 17))
            + _frac(F.sin(F.col("id") * 12.9898 + j * 78.233) * 43758.5453)
            - 0.5
        ).cast("float"),
    )
    cols = [F.col("id").alias(id_col), vec.alias(vec_col)]
    for name, build in (extra_cols or {}).items():
        cols.append(build(F.col("id")).alias(name))
    corpus = base.select(*cols).persist()
    corpus.count()
    return corpus


def query_batch(corpus, n_queries: int, id_col: str = "vec_id", vec_col: str = "embedding"):
    """First n corpus vectors as the (persisted) query workload."""
    from pyspark.sql import functions as F

    q = (
        corpus.filter(F.col(id_col) < n_queries)
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("query_embedding"),
        )
        .persist()
    )
    q.count()
    return q
