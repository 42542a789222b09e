"""Benchmark decontamination (SURVEY §2.J scope, beyond-reference).

Training corpora must not contain evaluation data: a document that shares
even one long word n-gram with a benchmark item is suspect (the standard
"13-gram overlap" rule from the GPT-3/PaLM data cards, parameterized here).

Spark-first shape, sized for 100 TB of corpus vs MB-scale benchmarks:

 * the benchmark side (eval sets are small — thousands of items) is
   reduced to its DISTINCT n-gram set and **broadcast**, so the corpus
   scan joins map-side with no shuffle of the big side;
 * the corpus explodes to (doc_id, gram) only transiently inside the
   stage — Catalyst pipelines explode → broadcast-hash-join → partial
   count without materializing the exploded relation;
 * only HIT rows (a tiny fraction) reach the one shuffle, the per-doc
   count aggregation.

All hashing/tokenizing uses the same portable primitives as the dedup
family (`operators/dedup.py::shingles`), so a DuckDB oracle reproduces the
flags exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from chatbot_spark.operators.dedup import shingles


def benchmark_ngrams(benchmark: DataFrame, text_col: str = "text", n: int = 8) -> DataFrame:
    """Distinct word n-grams of the benchmark set — the broadcast probe set.

    One column ``gram``. Deduplicated both within each item
    (``shingles`` is distinct per doc) and across items.
    """
    return (
        benchmark.select(F.explode(shingles(F.col(text_col), n)).alias("gram"))
        .distinct()
    )


def ngram_overlap_flags(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """Flag corpus docs sharing >= 1 word ``n``-gram with the benchmark.

    Returns (id_col, n_hit_grams) for contaminated docs only — at scale
    the clean majority should never leave the map stage. Join the result
    back (left anti) to drop contaminated docs from a training mix.
    """
    grams = benchmark_ngrams(benchmark, text_col=text_col, n=n)
    corpus_grams = corpus.select(
        F.col(id_col), F.explode(shingles(F.col(text_col), n)).alias("gram")
    )
    hits = corpus_grams.join(F.broadcast(grams), "gram")
    return hits.groupBy(id_col).agg(F.count("*").alias("n_hit_grams"))


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """Corpus minus contaminated docs (left anti join on the flag set)."""
    flagged = ngram_overlap_flags(
        corpus, benchmark, text_col=text_col, id_col=id_col, n=n
    ).select(id_col)
    return corpus.join(flagged, id_col, "left_anti")


def containment_scores(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_id_col: str = "bench_id",
    n: int = 8,
) -> DataFrame:
    """Per-(corpus doc, benchmark item) CONTAINMENT — |S(b) ∩ S(d)| / |S(b)|
    over word n-gram sets — reduced to each doc's strongest match.

    The n-gram-overlap rule above flags on ANY shared gram; containment is
    the graded form real data cards use (e.g. Dolma's paragraph/QA
    containment thresholds): how much of the benchmark ITEM is inside the
    doc. Same scale shape — the benchmark side (grams + per-item sizes) is
    broadcast, the corpus explodes transiently, only hit pairs reach the
    aggregation; ties on the max break to the lowest benchmark id so the
    verdict row is deterministic.

    Returns (id_col, bench_id_col, containment, n_common) — one row per
    corpus doc that shares at least one gram, carrying its best-matching
    benchmark item.
    """
    from pyspark.sql import Window

    bg = benchmark.select(
        F.col(bench_id_col), F.explode(shingles(F.col(text_col), n)).alias("gram")
    )
    sizes = bg.groupBy(bench_id_col).agg(F.count("*").alias("__nb"))
    corpus_grams = corpus.select(
        F.col(id_col), F.explode(shingles(F.col(text_col), n)).alias("gram")
    )
    pair_hits = (
        corpus_grams.join(F.broadcast(bg), "gram")
        .groupBy(id_col, bench_id_col)
        .agg(F.count("*").alias("n_common"))
        .join(F.broadcast(sizes), bench_id_col)
        .withColumn("containment", F.col("n_common") / F.col("__nb"))
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("containment").desc(), F.col(bench_id_col).asc()
    )
    return (
        pair_hits.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(id_col, bench_id_col, "containment", "n_common")
    )
