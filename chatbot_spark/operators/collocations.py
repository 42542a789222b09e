"""PMI collocation mining — corpus-level word-association statistics
(Church & Hanks 1990), the classic phrase/collocation detector a
training-data pipeline runs for tokenizer vocabulary candidates,
boilerplate phrase discovery, and stereotype/bias audits.

Spark-first shape: ONE tokenize pass is persisted and feeds both the
unigram and the adjacent-bigram aggregation (map-side combinable,
keyed by token / token pair — the natural shuffle keys); the two corpus
totals ride a broadcast 1-row join. Nothing is ever all-pairs: only
ADJACENT pairs are counted, so the exchange volume is O(tokens), and
support floors cut the tail before the scoring join.

Scoring avoids transcendentals (the module-wide float discipline): the
reported statistic is the PMI *ratio* p(x,y)/(p(x)p(y)) — the exact
exp(PMI), monotone in PMI — computed in DOUBLE with a pinned
multiply/divide order so DuckDB replays it bit-for-bit; log-space PMI
exists in libm-dependent engines only (same reason bm25's lucene idf
mode is not oracle-gated, lexical.py).

100 TB: two aggregations over the token stream + token-keyed joins of
the (support-filtered) pair table against the unigram table (AQE
broadcasts it when small, sort-merge on the token key when not);
skewed head tokens are just big groups of a BIGINT count — map-side
combine absorbs them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from chatbot_spark.operators.textstats import tokens

__all__ = ["pmi_collocations"]


def pmi_collocations(
    docs: DataFrame,
    text_col: str = "text",
    min_pair: int = 5,
    min_unigram: int = 10,
) -> DataFrame:
    """(w1, w2, c_xy, pmi_ratio) for adjacent token pairs with
    c_xy >= min_pair and both unigram counts >= min_unigram.

    pmi_ratio = (c_xy/B) / ((c_x/N)(c_y/N)) computed as the pinned
    DOUBLE expression ((c_xy*N)/B) * (N/(c_x*c_y)) — every operand cast
    to double first, every step IEEE correctly-rounded, so any engine
    replaying the same shape produces the identical bits. > 1 means the
    pair co-occurs more than independence predicts."""
    tk = (
        docs.select(tokens(F.col(text_col)).alias("toks"))
        .filter(F.size("toks") >= 1)
        .persist()
    )
    uni = tk.select(F.explode("toks").alias("w"))
    ucnt = uni.groupBy("w").agg(F.count("*").cast("long").alias("c_w"))
    n_tok = uni.agg(F.count("*").cast("long").alias("n_tok"))
    pairs = (
        tk.filter(F.size("toks") >= 2)
        .select(
            F.explode(
                F.arrays_zip(
                    F.slice(F.col("toks"), 1, F.size("toks") - 1).alias("w1"),
                    F.slice(F.col("toks"), 2, F.size("toks") - 1).alias("w2"),
                )
            ).alias("p")
        )
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    n_bi = pairs.agg(F.count("*").cast("long").alias("n_bi"))
    pcnt = (
        pairs.groupBy("w1", "w2")
        .agg(F.count("*").cast("long").alias("c_xy"))
        .filter(F.col("c_xy") >= int(min_pair))
    )
    strong = ucnt.filter(F.col("c_w") >= int(min_unigram))
    # token-keyed joins: AQE broadcasts the unigram side when it fits
    # (it does here); at web-corpus vocabulary sizes these degrade
    # gracefully to sort-merge on the token key — never hinted broadcast,
    # a 50M-row vocab must not be forced driver-side
    scored = (
        pcnt.join(strong.select(F.col("w").alias("w1"), F.col("c_w").alias("c_x")), "w1")
        .join(strong.select(F.col("w").alias("w2"), F.col("c_w").alias("c_y")), "w2")
        .crossJoin(F.broadcast(n_tok))
        .crossJoin(F.broadcast(n_bi))
    )
    ratio = (
        (F.col("c_xy").cast("double") * F.col("n_tok").cast("double"))
        / F.col("n_bi").cast("double")
    ) * (
        F.col("n_tok").cast("double")
        / (F.col("c_x").cast("double") * F.col("c_y").cast("double"))
    )
    out = scored.select(
        "w1", "w2", "c_xy", F.round(ratio, 6).alias("pmi_ratio")
    ).localCheckpoint(eager=True)
    tk.unpersist()
    return out
