"""ANN crossover benchmark: exact vs IVF top-k at corpus sizes where the
index can actually pay for itself (the driver's embeddings table is 2k
rows — overhead-bound; BASELINE.md §C points here).

Synthesizes a deterministic N×64 corpus with loosely clustered structure
(cluster centers + noise — the shape real embedding corpora have), then
measures per-search wall time of exact vs IVF (amortizing one build) and
the recall of IVF against exact.

Usage: PYTHONPATH=/root/repo python tools/bench_ann_scale.py [N] [nlist] [nprobe]
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    nlist = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    nprobe = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    dim, n_clusters, n_queries, k = 64, 256, 10, 10

    from pyspark.sql import functions as F

    from chatbot_spark.operators.ann import IVFIndex, recall_at_k
    from chatbot_spark.operators.topk import knn_join
    from chatbot_spark.session import get_spark

    spark = get_spark("ann-scale")

    # shared deterministic clustered corpus (tools/_synth.py — the one
    # recipe every ANN bench imports): center(id % n_clusters) +
    # U(-0.5, 0.5) seeded noise, engine-side expressions only
    from _synth import clustered_corpus, query_batch

    corpus = clustered_corpus(spark, n, dim=dim, n_clusters=n_clusters)
    queries = query_batch(corpus, n_queries)

    def timed(build_fn):
        """First run pays codegen/plan warmup; the timed run constructs a
        FRESH DataFrame (new RDD lineage) so Spark cannot reuse the first
        run's shuffle files — the warm time is real compute."""
        build_fn().collect()
        t0 = time.time()
        out = build_fn().collect()
        return out, time.time() - t0

    exact_rows, t_exact = timed(
        lambda: knn_join(queries, corpus, k=k, metric="l2", corpus_id="vec_id")
    )

    t0 = time.time()
    index = IVFIndex.build(corpus, vec_col="embedding", id_col="vec_id", nlist=nlist)
    index.indexed.persist().count()
    t_build = time.time() - t0

    approx_rows, t_search = timed(lambda: index.search(queries, k=k, nprobe=nprobe))

    exact_df = spark.createDataFrame(exact_rows)
    approx_df = spark.createDataFrame(approx_rows)
    rec = recall_at_k(approx_df, exact_df)

    # IVF-PQ: same cell pruning + 16-byte residual ADC codes (32×
    # smaller than the 64-d float rows) + exact re-rank of the shortlist
    from chatbot_spark.operators.ivfpq import IVFPQIndex

    t0 = time.time()
    ivfpq = IVFPQIndex.build(
        corpus, vec_col="embedding", id_col="vec_id", nlist=nlist, m=16, ksub=32
    )
    ivfpq.encoded.persist().count()
    t_pq_build = time.time() - t0
    # shortlist sized to the candidate pool: ~nprobe/nlist of the corpus
    # passes ADC, so a fixed 100 starves at 1M rows (recall 0.84); 500
    # costs one more tiny equi-join and restores the SLO
    ivfpq_rows, t_pq_search = timed(
        lambda: ivfpq.search(queries, k=k, nprobe=nprobe, rerank=500, corpus=corpus)
    )
    rec_pq = recall_at_k(spark.createDataFrame(ivfpq_rows), exact_df)

    # Sharded NSW graph: shard count scaled so one shard holds ~2k rows
    # (beam insertion is sequential per shard but shards build in
    # parallel); search walks only the routed shards' graphs
    from chatbot_spark.operators.hnsw import NSWGraphIndex

    nsw_nlist = max(nlist, n // 2000)
    t0 = time.time()
    nsw = NSWGraphIndex.build(
        corpus, vec_col="embedding", id_col="vec_id", nlist=nsw_nlist, m=16,
        ef_construction=64,
    )
    nsw.graph.persist().count()
    t_nsw_build = time.time() - t0
    nsw_rows, t_nsw_search = timed(
        lambda: nsw.search(queries, k=k, nprobe=nprobe, ef_search=64)
    )
    rec_nsw = recall_at_k(spark.createDataFrame(nsw_rows), exact_df)

    # kNG variant: same sharding, BLAS-vectorized kNN-graph construction
    # (one Gram matrix per shard instead of sequential beam insertions) —
    # the build-throughput path; search/recall envelopes are identical
    t0 = time.time()
    nsw_knn = NSWGraphIndex.build(
        corpus, vec_col="embedding", id_col="vec_id", nlist=nsw_nlist, m=16,
        method="knn",
    )
    nsw_knn.graph.persist().count()
    t_knng_build = time.time() - t0
    knng_rows, t_knng_search = timed(
        lambda: nsw_knn.search(queries, k=k, nprobe=nprobe, ef_search=64)
    )
    rec_knng = recall_at_k(spark.createDataFrame(knng_rows), exact_df)

    print(json.dumps({
        "n": n, "dim": dim, "nlist": nlist, "nprobe": nprobe, "k": k,
        "exact_search_sec": round(t_exact, 3),
        "ivf_build_sec": round(t_build, 3),
        "ivf_search_sec": round(t_search, 3),
        "speedup_search": round(t_exact / t_search, 2),
        "recall_at_10": round(rec, 4),
        "ivfpq_build_sec": round(t_pq_build, 3),
        "ivfpq_search_sec": round(t_pq_search, 3),
        "ivfpq_speedup_search": round(t_exact / t_pq_search, 2),
        "ivfpq_recall_at_10": round(rec_pq, 4),
        "nsw_nlist": nsw_nlist,
        "nsw_build_sec": round(t_nsw_build, 3),
        "nsw_search_sec": round(t_nsw_search, 3),
        "nsw_speedup_search": round(t_exact / t_nsw_search, 2),
        "nsw_recall_at_10": round(rec_nsw, 4),
        "knng_build_sec": round(t_knng_build, 3),
        "knng_build_speedup_vs_insert": round(t_nsw_build / t_knng_build, 2),
        "knng_search_sec": round(t_knng_search, 3),
        "knng_recall_at_10": round(rec_knng, 4),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
