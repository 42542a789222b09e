"""Hierarchy payoff microbench (round-5 verdict item 5): does the
layer-0 beam walk stay flat as SHARD SIZE grows 10×?

The Spark-side search wall time is dominated by per-shard Arrow→numpy
materialization (O(shard rows) with or without a hierarchy), so the
hierarchical-descent claim is measured where it lives: the in-process
beam walk over one shard graph. For shard sizes n = 2k → 20k (the 10×
span) this builds the real kNN shard graph + upper layers with the real
operators (no reimplementation), then beam-searches 50 queries per
configuration:

  * ``entry0``  — the pre-hierarchy behavior: fixed entry 0;
  * ``descent`` — greedy upper-layer descent entry, dual-seeded with 0
                  (exactly what NSWGraphIndex.search runs).

Reported per configuration: mean visited-node count (the beam length —
the quantity that must stay flat) and mean per-query walk ms. Writes
``BENCH_HNSW_LAYERS.json`` at the repo root and prints one JSON line.

Usage: PYTHONPATH=/root/repo python tools/bench_hnsw_layers.py [sizes...]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_corpus(n: int, dim: int = 64, n_clusters: int = 64):
    """Clustered synthetic shard (same shape bench_ann_scale uses)."""
    import numpy as np

    rng = np.random.default_rng(42)
    centers = rng.normal(scale=10.0, size=(n_clusters, dim))
    cl = rng.integers(0, n_clusters, size=n)
    return centers[cl] + rng.normal(scale=1.0, size=(n, dim))


def main() -> int:
    import numpy as np

    from chatbot_spark.operators.hnsw import (
        _assign_levels,
        _beam_search,
        _build_knn_graph,
        _build_upper_layers,
        _descend_entry,
    )

    sizes = [int(a) for a in sys.argv[1:]] or [2000, 6300, 20000]
    m, ef, n_queries = 16, 64, 50
    rng = np.random.default_rng(7)
    results = []
    for n in sizes:
        X = make_corpus(n)
        t0 = time.time()
        adj = _build_knn_graph(X, m)
        t_graph = time.time() - t0
        levels = _assign_levels(list(range(n)), m, n)
        t0 = time.time()
        layers = _build_upper_layers(X, levels, m)
        t_layers = time.time() - t0
        queries = rng.normal(scale=10.0, size=(n_queries, X.shape[1]))

        def run(use_descent: bool):
            visited, walk_s = [], 0.0
            for q in queries:
                stats: dict = {}
                t0 = time.time()
                if use_descent:
                    e = _descend_entry(X, layers, q)
                    _beam_search(
                        X, adj, q, ef=ef, entry=e,
                        extra_entries=(0,) if e != 0 else (), stats=stats,
                    )
                else:
                    _beam_search(X, adj, q, ef=ef, entry=0, stats=stats)
                walk_s += time.time() - t0
                visited.append(stats["visited"])
            return (
                round(float(np.mean(visited)), 1),
                round(walk_s / n_queries * 1000, 3),
            )

        v0, ms0 = run(False)
        vd, msd = run(True)
        results.append(
            {
                "shard_rows": n,
                "graph_build_sec": round(t_graph, 3),
                "layer_build_sec": round(t_layers, 3),
                "entry0_visited": v0,
                "entry0_walk_ms": ms0,
                "descent_visited": vd,
                "descent_walk_ms": msd,
            }
        )

    first, last = results[0], results[-1]
    payload = {
        "metric": "hnsw_layer_walk",
        "m": m,
        "ef_search": ef,
        "n_queries": n_queries,
        "configs": results,
        "descent_visited_growth_10x": round(
            last["descent_visited"] / first["descent_visited"], 3
        ),
        "entry0_visited_growth_10x": round(
            last["entry0_visited"] / first["entry0_visited"], 3
        ),
        "descent_walk_ms_growth_10x": round(
            last["descent_walk_ms"] / first["descent_walk_ms"], 3
        ),
    }
    with open(os.path.join(REPO, "BENCH_HNSW_LAYERS.json"), "w") as f:
        f.write(json.dumps(payload, separators=(",", ":")) + "\n")
    print(json.dumps(payload, separators=(",", ":")))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
