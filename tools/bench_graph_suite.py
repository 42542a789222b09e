"""Graph-suite scale bench: the oracle queries rank ~120 hosts
(correctness); this tool runs the SAME operators on synthetic graphs
big enough that per-round overheads stop dominating — nodes and edges
generated distributed (spark.range, no driver materialization).

Per scale: triangle_count (degree-orientation wedge join), peel_layers
(k-core cascade), bfs_layers (multi-source frontier expansion),
hits_integer (two Pregel passes/round), lpa_communities at rounds=12
(the r6 plan-growth regression point: wall-clock must stay linear in
rounds, no driver blow-up), and incremental_lpa (64 rewired edges
refreshed from stored history vs full rerun — frontier ≪ rebuild is the
pass signal). Writes BENCH_GRAPH.json: [{n_nodes, n_edges, triangle_sec,
n_triangle_nodes, peel_sec, peel_layers, bfs_sec, bfs_reached, hits_sec,
lpa12_sec, lpa_full_sec, lpa_incr_sec, lpa_incr_speedup, cc_full_sec,
cc_incr_sec, cc_rebuild_sec, cc_incr_speedup}] — the cc_* entries are
connected components on a 1024-block island graph: full solve, the
contraction refresh after 64 bridges, and the union rebuild it beats.
Sub-linear-in-edges growth per operator is the pass signal — every
exchange is keyed, no operator holds more than O(nodes) driver-visible
state.

Usage: PYTHONPATH=/root/repo python tools/bench_graph_suite.py [n_scales] [start_nodes]
``start_nodes`` (default 200000) lets a big scale re-run alone after a
memory-config fix; results MERGE into BENCH_GRAPH.json by n_nodes
(existing rows at other scales are kept). Scales ≥ ~13M nodes need
SPARK_GRAFT_DRIVER_MEM=64g (the 8g default OOMs).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
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
        _symmetrize,
        bfs_layers,
        hits_integer,
        incremental_lpa_stored,
        lpa_communities,
        peel_layers,
        triangle_count,
        write_lpa_snapshot,
    )
    from chatbot_spark.session import get_spark

    max_scale = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    n_nodes = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    spark = get_spark(
        "bench-graph", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    out = []
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

        # LPA deep-rounds point (r6 verdict: pre-fix, rounds=12 doubled
        # the lazy plan 12x and the driver choked analyzing it; post-fix
        # wall-clock must stay linear in rounds)
        t0 = time.time()
        lpa_communities(e, rounds=12).count()
        rec["lpa12_sec"] = round(time.time() - t0, 2)

        # incremental LPA (stored path): a LOCAL-structure graph (ring +
        # even chords — the sorted-host web-graph layout, where a crawl
        # delta touches an id-local neighborhood) stored with RANGE
        # bucketing; rewire 64 local edges, then refresh from the
        # partition-pruned snapshot vs the full from-scratch rerun on
        # the updated graph. Snapshot/adjacency writes are SETUP (the
        # state a pipeline already owns), not part of either timing.
        local = (
            spark.range(n_nodes)
            .select(F.col("id").alias("src"))
            .select("src", ((F.col("src") + 1) % n_nodes).alias("dst"))
            .union(
                spark.range(n_nodes)
                .filter(F.col("id") % 2 == 0)
                .select(
                    F.col("id").alias("src"),
                    ((F.col("id") + 2) % n_nodes).alias("dst"),
                )
            )
            .persist()
        )
        local.count()
        nb = 256
        span = max(1, n_nodes // nb)
        range_bucket = lambda c, n: (F.floor(c / span)).cast("int")  # noqa: E731
        snap_dir = tempfile.mkdtemp(prefix="cbs_lpa_snap_")
        write_lpa_snapshot(
            local, snap_dir, rounds=4, n_buckets=nb, bucket_of=range_bucket
        )
        removed = local.filter(
            (F.col("src") < 64) & (F.col("dst") == (F.col("src") + 1) % n_nodes)
        )
        added = removed.select("src", ((F.col("src") + 3) % n_nodes).alias("dst"))
        upd = local.exceptAll(removed).union(added).persist()
        und_upd = _symmetrize(upd, "src", "dst").withColumn(
            "__bucket", range_bucket(F.col("u"), nb)
        )
        upd_adj = os.path.join(snap_dir, "upd_adj")
        und_upd.repartition(nb, F.col("__bucket")).write.partitionBy(
            "__bucket"
        ).parquet(upd_adj)
        changed = removed.union(added).localCheckpoint(eager=True)
        t0 = time.time()
        incremental_lpa_stored(
            spark, snap_dir, upd_adj, changed, rounds=4, n_buckets=nb,
            bucket_py=lambda i: i // span,
        ).count()
        rec["lpa_incr_sec"] = round(time.time() - t0, 2)
        t0 = time.time()
        lpa_communities(upd, rounds=4).count()
        rec["lpa_full_sec"] = round(time.time() - t0, 2)
        rec["lpa_incr_speedup"] = round(
            rec["lpa_full_sec"] / max(rec["lpa_incr_sec"], 1e-9), 2
        )
        upd.unpersist()
        shutil.rmtree(snap_dir, ignore_errors=True)

        local.unpersist()

        # connected components: island graph (1024-node blocks, intra-
        # block ring + scramble chord so each island converges in O(log)
        # rounds), solved from scratch; then 64 bridge edges chain the
        # first 65 islands and the contraction refresh recomputes — its
        # cost must track the DELTA (a 65-node contracted chain), not
        # |E|, while the honest comparison point is the from-scratch
        # rebuild on the union graph
        from chatbot_spark.operators.components import (
            connected_components,
            incremental_components,
        )

        blk = (F.col("id") - (F.col("id") % 1024)).alias("blk")
        off = (F.col("id") % 1024).alias("off")
        isl_base = spark.range(n_nodes).select(F.col("id").alias("src"), blk, off)
        islands = (
            isl_base.select(
                "src", (F.col("blk") + (F.col("off") + 1) % 1024).alias("dst")
            )
            .union(
                isl_base.select(
                    "src",
                    (F.col("blk") + (F.col("off") * 7 + 1) % 1024).alias("dst"),
                )
            )
            .persist()
        )
        islands.count()
        bridges = spark.range(64).select(
            (F.col("id") * 1024).alias("src"),
            ((F.col("id") + 1) * 1024 % n_nodes).alias("dst"),
        )
        t0 = time.time()
        prev = connected_components(islands, rounds=8).localCheckpoint(eager=True)
        rec["cc_full_sec"] = round(time.time() - t0, 2)
        t0 = time.time()
        incremental_components(prev, bridges, rounds=6).count()
        rec["cc_incr_sec"] = round(time.time() - t0, 2)
        t0 = time.time()
        union_labels = connected_components(
            islands.union(bridges), rounds=8
        ).localCheckpoint(eager=True)
        rec["cc_rebuild_sec"] = round(time.time() - t0, 2)
        rec["cc_incr_speedup"] = round(
            rec["cc_rebuild_sec"] / max(rec["cc_incr_sec"], 1e-9), 2
        )

        # decremental CC (the r8 delete verb): remove the 64 bridges from
        # the union graph — only the one merged 65-island chain (65×1024
        # nodes, FIXED size) is affected, so the refresh cost must stay
        # flat while the graph grows; the honest comparison is the
        # from-scratch solve on the remaining graph (cc_full_sec, measured
        # above on the identical island graph this run)
        from chatbot_spark.operators.components import decremental_components

        t0 = time.time()
        decremental_components(union_labels, islands, bridges, rounds=8).count()
        rec["cc_decr_sec"] = round(time.time() - t0, 2)
        rec["cc_decr_speedup"] = round(
            rec["cc_full_sec"] / max(rec["cc_decr_sec"], 1e-9), 2
        )

        # stored-snapshot decremental refresh (r8 verdict item 3): the
        # label + edge tables live as bucket-partitioned parquet (the
        # state a pipeline owns between crawls — the write is SETUP),
        # the refresh reads them PRUNED and returns the label delta.
        # Honest comparison: the from-scratch solve on this run's
        # identical island graph (cc_full_sec) — refresh vs rebuild.
        from chatbot_spark.operators.components import (
            decremental_components_stored,
            write_components_snapshot,
        )

        snap_cc = tempfile.mkdtemp(prefix="cbs_cc_snap_")
        write_components_snapshot(
            islands.union(bridges), snap_cc, rounds=8, n_buckets=64
        )
        t0 = time.time()
        decremental_components_stored(
            spark, snap_cc, bridges, rounds=8, n_buckets=64
        ).count()
        rec["cc_decr_stored_sec"] = round(time.time() - t0, 2)
        rec["cc_decr_stored_speedup"] = round(
            rec["cc_full_sec"] / max(rec["cc_decr_stored_sec"], 1e-9), 2
        )
        shutil.rmtree(snap_cc, ignore_errors=True)
        islands.unpersist()

        # giant-component decremental point (r9 verdict item 1): the
        # web-graph common case — ONE connected component holding every
        # node (the synth graph: ring keeps it connected, the scramble
        # chord keeps the diameter logarithmic), remove one intra-
        # component edge. The affected node set is the WHOLE graph
        # (~n_nodes rows), so past the 1M-row default gate the node-set
        # broadcast is dropped for shuffle joins — the point records
        # that the gated path COMPLETES with flat-ish cost where an
        # ungated broadcast would ship ~|V| rows to every executor
        # (OOM at web scale). PREV labels are setup (untimed).
        giant_prev = connected_components(e, rounds=None).localCheckpoint(
            eager=True
        )
        one_edge = spark.range(1).select(
            F.lit(0).cast("long").alias("src"), F.lit(1).cast("long").alias("dst")
        )
        e_remaining = e.filter(
            ~((F.col("src") == 0) & (F.col("dst") == 1))
        )
        t0 = time.time()
        decremental_components(
            giant_prev, e_remaining, one_edge, rounds=None
        ).count()
        rec["cc_decr_giant_sec"] = round(time.time() - t0, 2)
        rec["cc_decr_giant_gated"] = bool(n_nodes > 1_000_000)

        e.unpersist()
        out.append(rec)
        print(json.dumps(rec))
        n_nodes *= 4
    # merge by n_nodes so a single-scale re-run updates its row without
    # dropping the other scales' committed points
    path = os.path.join(REPO, "BENCH_GRAPH.json")
    prev = []
    if os.path.exists(path):
        try:
            with open(path) as f:
                prev = json.load(f)
        except (OSError, ValueError):
            prev = []
    merged = {r["n_nodes"]: r for r in prev}
    merged.update({r["n_nodes"]: r for r in out})
    with open(path, "w") as f:
        json.dump([merged[k] for k in sorted(merged)], f, indent=1)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
