"""Diversity-aware selection: MMR rerank and greedy k-center coreset.

Beyond-reference scope required by the north star (training-data curation
and retrieval quality): the reference's rerank is relevance-only
(src/rag/rag_graph.py:405-412 sorts fused scores desc and truncates); a
production retrieval stack additionally needs *diversified* results
(Carbonell & Goldstein's Maximal Marginal Relevance, SIGIR'98) and a
corpus-curation counterpart — the Gonzalez greedy k-center sweep that
picks a maximally-spread coreset per cell (the "select the most diverse
exemplars" step of dataset pruning pipelines).

Both are the same computational shape and share one Spark design:

1. Candidate pools are SMALL by contract (top-N retrieval shortlist, or a
   per-cell sample) while the number of pools is UNBOUNDED (millions of
   queries / cells at 100 TB). So the pairwise similarity matrix is built
   as a within-pool self-join — a single shuffle on the pool key, N² rows
   per pool, never a global cross join — with the similarity computed by
   the same Catalyst zip_with/aggregate fold as every other vector op
   (functions/vector.py), JVM-side and bit-reproducible.
2. The greedy selection loop (inherently sequential in k, but k ≤ ~20 and
   each step is O(N) given incremental max/min tracking) runs as ONE
   ``groupBy(pool).applyInPandas`` pass: Arrow-batched, one Python task
   per pool partition, no driver state, no iteration over Spark jobs.
   Embarrassingly parallel across pools — the 1000-executor path.

Float discipline: the pandas kernel does NOT recompute similarities — it
consumes the Catalyst-computed doubles and performs only IEEE compare /
max / the scalar score expression ``lam*rel - (1-lam)*maxsim``, which any
engine reproduces bit-for-bit (the DuckDB oracles replay the full greedy
unrolled round by round). Ties break on ascending id in both engines.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from chatbot_spark.functions.vector import cosine_similarity, l2_distance


def _pool_pairs(
    cands: DataFrame,
    pool_col: str,
    id_col: str,
    vec_col: str,
    rel_col: str | None,
    sim: str,
) -> tuple[DataFrame, DataFrame]:
    """All ordered within-pool pairs (a, b) INCLUDING the a == b self-row
    (sim NULL) so single-candidate pools still reach the kernel. One
    shuffle on the pool key; N² rows per pool by the small-pool contract.

    The candidate set fans out to both pair sides — persisted once so an
    upstream retrieval subtree (e.g. the MMR shortlist's top-k window)
    isn't computed twice. Small by the shortlist/cell contract. Returns
    (pairs, persisted_base); the CALLER owns the cache lifetime and must
    unpersist the base after materializing its result (round-6 ADVICE:
    no session-lifetime cache pinning)."""
    base = cands.select(
        F.col(pool_col).cast("long").alias("__pool"),
        F.col(id_col).cast("long").alias("__id"),
        F.col(vec_col).alias("__v"),
        *(
            [F.col(rel_col).cast("double").alias("__rel")]
            if rel_col is not None
            else [F.lit(0.0).alias("__rel")]
        ),
    ).persist()
    a = base.select(
        "__pool",
        F.col("__id").alias("__a"),
        F.col("__v").alias("__va"),
        F.col("__rel").alias("__rel_a"),
    )
    b = base.select(
        F.col("__pool").alias("__pool_b"),
        F.col("__id").alias("__b"),
        F.col("__v").alias("__vb"),
    )
    pairs = a.join(b, a["__pool"] == b["__pool_b"])
    measure = (
        cosine_similarity(F.col("__va"), F.col("__vb"))
        if sim == "cosine"
        else l2_distance(F.col("__va"), F.col("__vb"))
    )
    return (
        pairs.select(
            "__pool",
            "__a",
            "__b",
            "__rel_a",
            F.when(F.col("__a") != F.col("__b"), measure).alias("__s"),
        ),
        base,
    )


def mmr_select(
    cands: DataFrame,
    k: int,
    lam: float = 0.7,
    pool_col: str = "query_id",
    id_col: str = "neighbor_id",
    vec_col: str = "embedding",
    rel_col: str = "rel",
) -> DataFrame:
    """Maximal Marginal Relevance over per-pool candidate shortlists.

    Greedy: step 1 takes the relevance argmax; step i takes
    ``argmax( lam*rel(c) - (1-lam)*max_{s in selected} sim(c, s) )`` with
    ties on ascending id. Returns one row per selected candidate:
    (pool, rank, id, mmr_score, rel).

    ``sim`` is candidate-candidate cosine computed JVM-side; the kernel
    only compares/combines those doubles, so results replay exactly in
    any IEEE engine (the workload oracle unrolls all k rounds).
    """
    one_minus_lam = 1.0 - lam  # evaluated once, mirrored as (1.0 - lam) in SQL
    pairs, base = _pool_pairs(
        cands, pool_col, id_col, vec_col, rel_col, sim="cosine"
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pool = pdf["__pool"].iloc[0]
        rel = {}
        sims = {}
        for a, b, r, s in zip(pdf["__a"], pdf["__b"], pdf["__rel_a"], pdf["__s"]):
            a = int(a)
            rel[a] = float(r)
            if not pd.isna(s):
                sims[(a, int(b))] = float(s)
        remaining = sorted(rel)
        selected: list[int] = []
        out_rank, out_id, out_score, out_rel = [], [], [], []
        for step in range(1, min(k, len(remaining)) + 1):
            best_id, best_score = None, None
            for c in remaining:  # ascending id → strict > keeps smallest on ties
                ms = max(sims[(c, s)] for s in selected) if selected else 0.0
                score = lam * rel[c] - one_minus_lam * ms
                if best_score is None or score > best_score:
                    best_id, best_score = c, score
            selected.append(best_id)
            remaining.remove(best_id)
            out_rank.append(step)
            out_id.append(best_id)
            out_score.append(best_score)
            out_rel.append(rel[best_id])
        return pd.DataFrame(
            {
                "__pool": [pool] * len(out_id),
                "rank": out_rank,
                "__id": out_id,
                "mmr_score": out_score,
                "rel": out_rel,
            }
        )

    out = pairs.groupBy("__pool").applyInPandas(
        kernel,
        "__pool LONG, rank INT, __id LONG, mmr_score DOUBLE, rel DOUBLE",
    ).select(
        F.col("__pool").alias(pool_col),
        F.col("rank").cast("long").alias("rank"),
        F.col("__id").alias(id_col),
        "mmr_score",
        "rel",
    )
    # k rows per pool — materialize, then release the candidate cache
    out = out.localCheckpoint(eager=True)
    base.unpersist()
    return out


def k_center_select(
    points: DataFrame,
    k: int,
    pool_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Greedy k-center (Gonzalez farthest-first) per pool: seed with the
    smallest id, then repeatedly add the point with the LARGEST distance
    to its nearest already-selected center (ties on ascending id).
    Returns (pool, rank, id, radius) where radius is the selected point's
    min-distance to the prior centers at selection time (the classic
    non-increasing coverage-radius sequence; the seed reports 0.0).

    The 2-approximation workhorse of coreset/exemplar selection. At
    100 TB the pool key is a k-means cell or stratum (the
    operators/similarity.py clustering machinery), keeping every pool's
    N² pair block bounded — the same blocked-never-all-pairs discipline
    as the dedup family.
    """
    pairs, base = _pool_pairs(points, pool_col, id_col, vec_col, None, sim="l2")

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pool = pdf["__pool"].iloc[0]
        dists = {}
        ids = set()
        for a, b, s in zip(pdf["__a"], pdf["__b"], pdf["__s"]):
            a = int(a)
            ids.add(a)
            if not pd.isna(s):
                dists[(a, int(b))] = float(s)
        remaining = sorted(ids)
        seed = remaining.pop(0)
        # min-distance to the selected set, folded incrementally
        mind = {c: dists[(c, seed)] for c in remaining}
        out_rank, out_id, out_rad = [1], [seed], [0.0]
        for step in range(2, min(k, len(ids)) + 1):
            best_id, best_d = None, None
            for c in remaining:  # ascending id → strict > keeps smallest on ties
                d = mind[c]
                if best_d is None or d > best_d:
                    best_id, best_d = c, d
            remaining.remove(best_id)
            del mind[best_id]
            for c in remaining:
                d = dists[(c, best_id)]
                if d < mind[c]:
                    mind[c] = d
            out_rank.append(step)
            out_id.append(best_id)
            out_rad.append(best_d)
        return pd.DataFrame(
            {
                "__pool": [pool] * len(out_id),
                "rank": out_rank,
                "__id": out_id,
                "radius": out_rad,
            }
        )

    out = pairs.groupBy("__pool").applyInPandas(
        kernel, "__pool LONG, rank INT, __id LONG, radius DOUBLE"
    ).select(
        F.col("__pool").alias(pool_col),
        F.col("rank").cast("long").alias("rank"),
        F.col("__id").alias(id_col),
        "radius",
    )
    # k rows per pool — materialize, then release the candidate cache
    out = out.localCheckpoint(eager=True)
    base.unpersist()
    return out
