"""Routed radius-search benchmark (r10): exact range scan vs the IVF
triangle-inequality-pruned route at a corpus size where pruning pays.

The clustered corpus (same construction as bench_ann_scale.py) gives the
pruning real structure: most cells sit far from any query, so the
shortlist drops them outright. Reported per radius: probed-cell fraction,
wall-clock vs the exact scan, and a row-count equality check (the
completeness proof lives in the radius_search_routed oracle; here we
re-assert it cheaply at scale).

Usage: PYTHONPATH=/root/repo python tools/bench_radius.py [N] [nlist]
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    nlist = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    dim, n_clusters, n_queries = 64, 256, 10

    from pyspark.sql import functions as F

    from chatbot_spark.operators.ann import IVFIndex
    from chatbot_spark.operators.topk import radius_join
    from chatbot_spark.session import get_spark

    spark = get_spark("radius-bench")

    from _synth import clustered_corpus, query_batch

    corpus = clustered_corpus(spark, n, dim=dim, n_clusters=n_clusters)
    queries = query_batch(corpus, n_queries)

    t0 = time.time()
    idx = IVFIndex.build(
        corpus, vec_col="embedding", id_col="vec_id", nlist=nlist
    ).with_cell_stats()
    idx.indexed.persist().count()
    idx.centroids.persist().count()
    t_build = time.time() - t0

    def timed(build_fn):
        build_fn().count()
        t0 = time.time()
        out = build_fn()
        rows = out.count()
        return out, rows, time.time() - t0

    results = []
    # cluster noise is U(-0.5,0.5)^64 around the center: r=2 captures the
    # query's own cluster core; r=4 reaches cluster fringes
    for r in (2.0, 4.0):
        exact_df, n_exact, t_exact = timed(
            lambda: radius_join(
                queries, corpus, radius=r, metric="l2", corpus_id="vec_id",
                corpus_vec="embedding",
            )
        )
        routed_df, n_routed, t_routed = timed(
            lambda: idx.radius_search(queries, r)
        )
        # probed-cell count from the prune rule itself (the plan-string
        # isin can render as INSET and defeat a regex): union over
        # queries of cells with d(q, centroid) <= r + cell_radius
        import numpy as np

        crows = idx.centroids.orderBy("centroid_id").collect()
        C = np.array([row["centroid"] for row in crows])
        rad = np.array([row["radius"] for row in crows])
        Q = np.array([row[1] for row in queries.collect()])
        d = np.sqrt(
            ((Q[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        )  # (q, cells)
        probed = int(((d <= r + rad[None, :]).any(axis=0)).sum())
        results.append({
            "radius": r,
            "n_matches": n_exact,
            "rows_equal": n_exact == n_routed,
            "probed_cells": probed,
            "probed_fraction": round(probed / nlist, 4),
            "exact_sec": round(t_exact, 3),
            "routed_sec": round(t_routed, 3),
            "speedup": round(t_exact / t_routed, 2),
        })

    print(json.dumps({
        "metric": "radius_routed",
        "n": n, "dim": dim, "nlist": nlist, "n_queries": n_queries,
        "build_with_stats_sec": round(t_build, 3),
        "radii": results,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
