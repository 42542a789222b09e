"""Hashed/count n-gram language-model quality scoring (CCNet recipe,
beyond-reference §2.J scope).

CCNet (Wenzek et al. 2020) buckets web documents into head/middle/tail by
the perplexity of a small LM trained on a clean corpus; the buckets drive
what reaches training. The reference has no corpus-quality machinery at
all, so this is engine work, shaped like the fastText scorer
(workload `hashed_quality_score`): a count-based model small enough to
broadcast, applied as one narrow join+agg pass.

Float discipline: real perplexity is a log-sum — transcendental, not
bit-reproducible across engines. This operator scores in integer "bits":
the per-bigram cost of a seen bigram is

    bitlen(count(prefix)) - bitlen(count(bigram))       (>= 0)

where bitlen(x) = length(bin(x)) = floor(log2 x) + 1 — an exact integer
surrogate of -log2 P(w2|w1) with < 1 bit quantization, and unseen bigrams
pay a flat backoff penalty. Every quantity is BIGINT, so the whole score
is bit-identical on any engine and any partitioning, and the DuckDB
oracle replays it verbatim.

Scale shape (100 TB): the model is the bigram table of the CLEAN slice —
vocabulary-sized, not corpus-sized (CCNet's LM is 5-gram KenLM over
Wikipedia; here counts over the clean residue class). Training is one
map-side-combinable groupBy; scoring explodes each doc's bigrams
transiently and joins the broadcast model (spill to a shuffle join only
if the vocab outgrows the broadcast threshold — same contract as the
decontamination operator). Bucketing applies FIXED thresholds, exactly
like CCNet applies precomputed per-language cutoffs — no global sort, no
single-partition window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["doc_bigrams", "train_bigram_counts", "score_lm_bits"]

BACKOFF_BITS = 20


def doc_bigrams(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Explode each document's whitespace bigrams: (id, w1, w2).

    The pair stream is built inside the array (slice + element_at — a
    narrow map) and exploded once; docs with < 2 tokens contribute no
    rows on any engine.
    """
    # let-bound: referenced inside the per-pair lambda, the split would
    # re-run for every bigram position (O(len²) per doc — the r13 no-CSE-
    # through-lambdas finding).
    from chatbot_spark.operators.textstats import let

    pairs = let(
        F.split(F.col(text_col), " "),
        lambda w: F.transform(
            F.slice(w, 1, F.greatest(F.size(w) - 1, F.lit(0))),
            lambda x, i: F.struct(
                x.alias("w1"), F.element_at(w, i + F.lit(2)).alias("w2")
            ),
        ),
    )
    return (
        docs.select(F.col(id_col).alias("__id"), F.explode(pairs).alias("bg"))
        .select("__id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    )


def train_bigram_counts(
    train_docs: DataFrame | None,
    text_col: str = "text",
    id_col: str = "doc_id",
    bigrams: DataFrame | None = None,
) -> DataFrame:
    """The model: (w1, w2, bg_cnt, pre_cnt) over the clean slice.

    pre_cnt is the prefix total Σ_w2 bg_cnt — derived from the bigram
    table itself so P(w2|w1) mass is consistent by construction.
    Pass ``bigrams`` (a pre-built — typically persisted — doc_bigrams
    stream) to share ONE corpus explode between training and scoring
    instead of re-scanning the source per consumer.
    """
    bg = bigrams if bigrams is not None else doc_bigrams(train_docs, text_col, id_col)
    counts = bg.groupBy("w1", "w2").agg(F.count("*").alias("bg_cnt"))
    pre = counts.groupBy("w1").agg(F.sum("bg_cnt").alias("pre_cnt"))
    return counts.join(pre, "w1")


def _bitlen(c: Column) -> Column:
    return F.length(F.bin(c))


def score_lm_bits(
    docs: DataFrame | None,
    model: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    backoff_bits: int = BACKOFF_BITS,
    broadcast_model: bool = True,
    bigrams: DataFrame | None = None,
) -> DataFrame:
    """Per-document integer LM score: (id, n_bigrams, total_bits,
    score_milli) where score_milli = total_bits*1000 div n_bigrams —
    avg bits/bigram in exact milli-units. Lower = more fluent under the
    clean-slice model. ``bigrams`` shares a pre-built stream as in
    train_bigram_counts."""
    bg = bigrams if bigrams is not None else doc_bigrams(docs, text_col, id_col)
    m = F.broadcast(model) if broadcast_model else model
    joined = bg.join(m, ["w1", "w2"], "left")
    bits = F.when(
        F.col("bg_cnt").isNotNull(),
        _bitlen(F.col("pre_cnt")) - _bitlen(F.col("bg_cnt")),
    ).otherwise(F.lit(backoff_bits))
    return (
        joined.groupBy("__id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.sum(bits).cast("long").alias("total_bits"),
        )
        .select(
            F.col("__id").alias(id_col),
            "n_bigrams",
            "total_bits",
            F.expr("total_bits * 1000 div n_bigrams").alias("score_milli"),
        )
    )
