"""Graph-suite scale bench: the oracle queries rank ~120 hosts
(correctness); this tool runs the SAME operators on synthetic graphs
big enough that per-round overheads stop dominating — nodes and edges
generated distributed (spark.range, no driver materialization).

Per scale: triangle_count (degree-orientation wedge join), peel_layers
(k-core cascade), bfs_layers (multi-source frontier expansion), and
hits_integer (two Pregel passes/round). Writes BENCH_GRAPH.json:
[{n_nodes, n_edges, triangle_sec, n_triangle_nodes, peel_sec,
peel_layers, bfs_sec, bfs_reached, hits_sec}]. Sub-linear-in-edges
growth per operator is the pass signal — every exchange is keyed, no
operator holds more than O(nodes) driver-visible state.

Usage: PYTHONPATH=/root/repo python tools/bench_graph_suite.py [max_scale]
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def synth_edges(spark, n_nodes: int):
    """Deterministic scramble graph + ring chords so triangles exist:
    ring (i, i+1), chord (i, i+2) on evens, scramble (i, 7i+1)."""
    base = spark.range(n_nodes).select(F.col("id").alias("src"))
    parts = [
        base.select("src", ((F.col("src") + 1) % n_nodes).alias("dst")),
        base.filter(F.col("src") % 2 == 0).select(
            "src", ((F.col("src") + 2) % n_nodes).alias("dst")
        ),
        base.select("src", ((F.col("src") * 7 + 1) % n_nodes).alias("dst")),
    ]
    e = parts[0]
    for p in parts[1:]:
        e = e.union(p)
    return e


def main() -> int:
    from chatbot_spark.operators.graph import (
        bfs_layers,
        hits_integer,
        peel_layers,
        triangle_count,
    )
    from chatbot_spark.session import get_spark

    max_scale = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    spark = get_spark(
        "bench-graph", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    out = []
    n_nodes = 200_000
    for _ in range(max_scale):
        e = synth_edges(spark, n_nodes).persist()
        n_edges = e.count()
        rec = {"n_nodes": n_nodes, "n_edges": n_edges}

        t0 = time.time()
        tc = triangle_count(e)
        rec["n_triangle_nodes"] = tc.count()
        rec["triangle_sec"] = round(time.time() - t0, 2)

        t0 = time.time()
        pl = peel_layers(e, k=3)
        rec["peel_layers"] = pl.agg(F.max("layer")).collect()[0][0]
        rec["peel_sec"] = round(time.time() - t0, 2)

        t0 = time.time()
        bf = bfs_layers(e, seeds=[0, n_nodes // 2], max_depth=40)
        rec["bfs_reached"] = bf.count()
        rec["bfs_sec"] = round(time.time() - t0, 2)

        t0 = time.time()
        hits_integer(e, iterations=3).count()
        rec["hits_sec"] = round(time.time() - t0, 2)

        e.unpersist()
        out.append(rec)
        print(json.dumps(rec))
        n_nodes *= 4
    with open(os.path.join(REPO, "BENCH_GRAPH.json"), "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
