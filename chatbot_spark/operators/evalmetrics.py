"""Retrieval ranking-quality metrics (beyond-reference §2.I scope).

The reference ships a RAG retrieval stack but no way to MEASURE it
(src/rag/doc_embedder.py returns top-k and hopes). Ranking evaluation —
average precision, reciprocal rank, precision@k of a system ranking
against a relevance set — is what turns "the index returns something"
into "the index is 0.97 as good as exact search", and it is the metric
layer the ANN-family recall SLOs in this repo report through.

Float discipline: AP and MRR are textbook-defined as rational numbers
(hits/rank fractions). Computed in DOUBLE their sum order would be
engine-dependent; computed in exact integer parts-per-million (BIGINT
floor division, then BIGINT sums — order-independent) the whole metric
is bit-reproducible, and the DuckDB oracle must agree hash-for-hash.
The ppm floor loses < 1e-6 per term — far below any decision threshold
a retrieval eval feeds.

Scale shape (100 TB): the operator itself only ever touches ranked
RESULT lists — Q×k rows, never the corpus. The expensive inputs
(system = an ANN index search, truth = an exact scan or a held-out
judgment table) are produced upstream by the search operators; the
metric join is (query_id, doc_id) equi-join plus one per-query window
over ≤ k rows. Nothing here is corpus-sized.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ndcg_gain_ppm(rank: int, scale: int = 10**6) -> int:
    """The binary-relevance DCG gain at ``rank`` as an exact integer:
    floor(scale / log2(rank+1)). Computed ONCE driver-side (math.log2 on
    small ints is correctly rounded and platform-stable) and embedded in
    the plan as a literal — the oracle embeds the same constants, so the
    NDCG algebra downstream is pure BIGINT and bit-reproducible."""
    return int(scale / math.log2(rank + 1))

__all__ = ["ndcg_gain_ppm", "ranking_metrics"]


def ranking_metrics(
    system: DataFrame,
    truth: DataFrame,
    query_col: str = "query_id",
    doc_col: str = "neighbor_id",
    rank_col: str = "rank",
    ppm_scale: int = 10**6,
    ndcg_k: int | None = None,
) -> DataFrame:
    """Per-query AP / MRR / hit metrics of ``system`` against ``truth``.

    ``system``: (query, doc, rank) ranked retrieval lists, rank 1-based
    dense per query; PRECONDITION: (query, doc) unique and ranks unique
    per query (the contract every search operator here emits — a doc
    listed twice would double-count its relevance and a duplicated rank
    would make the cumulative-hits window order-ambiguous). ``truth``: (query, doc) relevance sets (ranks in
    ``truth`` are ignored; membership defines relevance). Queries absent
    from ``truth`` contribute nothing (semi-join semantics on the
    truth-side normalizer); system rows for them are dropped. The
    converse — queries present in ``truth`` with ZERO system rows (the
    retriever answered nothing) — emit an all-zero metric row (n_hits
    0, ap/mrr/p@k/ndcg 0 ppm), so macro-averages correctly penalize
    unanswered queries instead of silently dropping them (round-6
    ADVICE).

    Returns one row per query:

      n_hits     relevant docs retrieved (BIGINT)
      ap_ppm     (sum over hit ranks i of ppm*hits<=i div i) div n_rel
      mrr_ppm    ppm div first-hit rank, 0 when nothing relevant returned
      p_at_k_ppm ppm * n_hits div n_returned
      ndcg_ppm   (when ``ndcg_k`` is set) ppm * DCG div IDCG with binary
                 gains g(i) = floor(ppm/log2(i+1)) embedded as integer
                 literals; IDCG sums g(1..min(n_rel, ndcg_k))

    All floor divisions on BIGINT — exact, order-independent,
    bit-identical on any engine and partitioning.
    """
    scale = int(ppm_scale)
    rel = truth.select(
        F.col(query_col).alias("__q"), F.col(doc_col).alias("__d")
    ).distinct()
    n_rel = rel.groupBy("__q").agg(F.count("*").cast("long").alias("__n_rel"))
    sys_rows = system.select(
        F.col(query_col).alias("__q"),
        F.col(doc_col).alias("__d"),
        F.col(rank_col).cast("long").alias("__r"),
    )
    joined = sys_rows.join(
        rel.withColumn("__rel", F.lit(1)), ["__q", "__d"], "left"
    ).select("__q", "__r", F.coalesce("__rel", F.lit(0)).cast("long").alias("__rel"))
    w = Window.partitionBy("__q").orderBy("__r")
    scored = joined.select(
        "__q",
        "__r",
        "__rel",
        F.sum("__rel").over(w).alias("__cum"),
    ).select(
        "__q",
        "__rel",
        "__r",
        F.when(
            F.col("__rel") == 1, F.expr(f"__cum * {scale} div __r")
        ).otherwise(F.lit(0)).alias("__prec_ppm"),
        F.when(F.col("__rel") == 1, F.col("__r")).alias("__hit_rank"),
    )
    aggs = [
        F.sum("__rel").cast("long").alias("n_hits"),
        F.sum("__prec_ppm").cast("long").alias("__ap_num"),
        F.min("__hit_rank").alias("__first_hit"),
        F.count("*").cast("long").alias("__n_ret"),
    ]
    if ndcg_k is not None:
        k = int(ndcg_k)
        # gain lookup as a literal CASE over rank — integer constants
        # identical to the oracle's (ndcg_gain_ppm is deterministic)
        gain = F.lit(0).cast("long")
        for r in range(k, 0, -1):
            gain = F.when(F.col("__r") == r, F.lit(ndcg_gain_ppm(r, scale))).otherwise(gain)
        scored = scored.withColumn(
            "__gain",
            F.when((F.col("__rel") == 1) & (F.col("__r") <= k), gain).otherwise(
                F.lit(0).cast("long")
            ),
        )
        aggs.append(F.sum("__gain").cast("long").alias("__dcg"))
    agg = scored.groupBy("__q").agg(*aggs)
    # LEFT join from the truth-side normalizer: a truth query with no
    # system rows still gets a row (all aggregates NULL → coalesced 0)
    out_cols = [
        F.col("__q").alias(query_col),
        F.coalesce("n_hits", F.lit(0).cast("long")).alias("n_hits"),
        F.coalesce(
            F.expr("__ap_num div __n_rel"), F.lit(0).cast("long")
        ).alias("ap_ppm"),
        F.coalesce(
            F.expr(f"{scale} div __first_hit"), F.lit(0).cast("long")
        ).alias("mrr_ppm"),
        F.coalesce(
            F.expr(f"n_hits * {scale} div __n_ret"), F.lit(0).cast("long")
        ).alias("p_at_k_ppm"),
    ]
    joined_agg = n_rel.join(agg, "__q", "left")
    if ndcg_k is not None:
        k = int(ndcg_k)
        # IDCG = cumulative ideal gain at min(n_rel, k): literal lookup
        cum = 0
        idcg = F.lit(0).cast("long")
        prefix = []
        for r in range(1, k + 1):
            cum += ndcg_gain_ppm(r, scale)
            prefix.append(cum)
        for r in range(k, 0, -1):
            idcg = F.when(
                F.least(F.col("__n_rel"), F.lit(k)) == r, F.lit(prefix[r - 1])
            ).otherwise(idcg)
        joined_agg = joined_agg.withColumn("__idcg", idcg)
        out_cols.append(
            F.coalesce(
                F.when(
                    F.col("__idcg") > 0, F.expr(f"__dcg * {scale} div __idcg")
                ).otherwise(F.lit(0).cast("long")),
                F.lit(0).cast("long"),  # truth-only query: __dcg is NULL
            ).alias("ndcg_ppm")
        )
    return joined_agg.select(*out_cols)
