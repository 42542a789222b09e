"""PageRank scale bench: the oracle query ranks 50 hosts (correctness);
this tool shows the same operator's Pregel loop scaling on a synthetic
graph big enough that broadcast shortcuts stop applying — nodes and
edges generated distributed (spark.range, no driver materialization),
supersteps timed at increasing edge counts.

Writes BENCH_PAGERANK.json: [{n_nodes, n_edges, iterations, wall_sec,
sec_per_superstep_per_medge}]. Linear-ish growth in edges at fixed
iterations is the pass signal — each superstep is edges ⋈ rank +
groupBy(dst) + nodes left join, all keyed exchanges, state O(nodes).

Usage: PYTHONPATH=/root/repo python tools/bench_pagerank.py [max_scale]
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F


def synth_edges(spark, n_nodes: int, avg_deg: int):
    """Deterministic multiplicative-scramble graph, generated distributed:
    node i links to (a*i + c) % n for several (a, c) pairs — bijective
    per rule (odd multipliers), so in/out degree stay balanced."""
    rules = [(7, 1), (13, 2), (29, 5), (97, 11), (193, 17)][:avg_deg]
    base = spark.range(n_nodes).select(F.col("id").alias("src"))
    parts = [
        base.select(
            "src", ((F.col("src") * a + c) % n_nodes).alias("dst")
        )
        for a, c in rules
    ]
    e = parts[0]
    for p in parts[1:]:
        e = e.union(p)
    return e


def main() -> int:
    max_scale = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from chatbot_spark.operators.graph import pagerank_integer
    from chatbot_spark.session import get_spark

    spark = get_spark("bench_pagerank", master="local[32]", shuffle_partitions=32)
    out = []
    iterations = 3
    for scale in range(max_scale):
        n_nodes = 100_000 * (4**scale)
        avg_deg = 5
        edges = synth_edges(spark, n_nodes, avg_deg)
        t0 = time.time()
        res = pagerank_integer(edges, iterations=iterations)
        total = res.agg(F.sum("rank")).collect()[0][0]
        wall = time.time() - t0
        n_edges = n_nodes * avg_deg
        out.append(
            {
                "n_nodes": n_nodes,
                "n_edges": n_edges,
                "iterations": iterations,
                "wall_sec": round(wall, 2),
                "sec_per_superstep_per_medge": round(
                    wall / iterations / (n_edges / 1e6), 3
                ),
                "total_mass": int(total),
            }
        )
        print(out[-1], flush=True)
    with open("BENCH_PAGERANK.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote BENCH_PAGERANK.json")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
