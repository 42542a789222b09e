"""k-anonymity/l-diversity audit (operators/privacy.py) and deterministic
label propagation (operators/graph.py::lpa_communities) on hand-built
inputs where the right answer is checkable by eye."""

from __future__ import annotations

from chatbot_spark.operators.graph import lpa_communities
from chatbot_spark.operators.privacy import k_anonymity_report


def test_k_anonymity_report_hand_computed(spark):
    # classes: (A,1)x3 segs {s1,s2}; (A,2)x1 seg {s1}; (B,1)x5 seg {s1}
    rows = [
        ("A", 1, "s1"), ("A", 1, "s2"), ("A", 1, "s1"),
        ("A", 2, "s1"),
        ("B", 1, "s1"), ("B", 1, "s1"), ("B", 1, "s1"),
        ("B", 1, "s1"), ("B", 1, "s1"),
    ]
    df = spark.createDataFrame(rows, "region string, band int, seg string")
    got = k_anonymity_report(df, ["region", "band"], "seg", k=5, l=2).collect()[0]
    assert got["n_classes"] == 3
    assert got["n_rows"] == 9
    assert got["classes_below_k"] == 2          # (A,1) size 3, (A,2) size 1
    assert got["rows_below_k"] == 4
    assert got["classes_below_l"] == 2          # (A,2) and (B,1) are homogeneous
    assert got["rows_below_l"] == 6
    assert got["min_class_size"] == 1
    assert got["min_l"] == 1


def test_lpa_two_cliques_with_bridge(spark):
    # 0-1-2 triangle and 10-11-12 triangle joined by one bridge 2-10:
    # labels collapse to the clique minimum; the bridge is too weak to
    # merge them (each side's majority stays internal)
    edges = [
        (0, 1), (1, 2), (0, 2),
        (10, 11), (11, 12), (10, 12),
        (2, 10),
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["label"] for r in lpa_communities(df, rounds=4).collect()}
    assert got[0] == got[1] == got[2] == 0
    assert got[10] == got[11] == got[12]
    assert got[10] != got[0]


def test_lpa_tie_breaks_to_smallest_label_and_ignores_self_loops(spark):
    # path 5-6 plus a self-loop on 6: after round 1 both nodes hold the
    # other's start label... with the deterministic smallest-label tie
    # rule the pair converges to {5: 5's orbit} — assert the run is a
    # pure function (two invocations identical) and self-loops are inert
    edges = [(5, 6), (6, 6)]
    df = spark.createDataFrame(edges, "src long, dst long")
    a = sorted((r["node"], r["label"]) for r in lpa_communities(df, rounds=3).collect())
    b = sorted((r["node"], r["label"]) for r in lpa_communities(df, rounds=3).collect())
    assert a == b
    assert len(a) == 2  # the self-loop added no phantom node behavior


# ---------------------------------------------------------------------------
# round-7: incremental LPA — frontier refresh must be BIT-EQUAL to the
# from-scratch run on the updated graph (the induction incremental_lpa's
# docstring states), including edge removals, additions, and new nodes.


def _scratch(spark, edges, rounds):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r["node"]: r["label"]
        for r in lpa_communities(df, rounds=rounds).collect()
    }


def _incr(spark, base_edges, upd_edges, rounds):
    from chatbot_spark.operators.graph import incremental_lpa, lpa_with_history

    base = spark.createDataFrame(base_edges, "src long, dst long")
    upd = spark.createDataFrame(upd_edges, "src long, dst long")
    changed = sorted(
        (set(map(tuple, base_edges)) ^ set(map(tuple, upd_edges)))
    )
    ch = spark.createDataFrame(changed or [(0, 0)], "src long, dst long")
    hist = lpa_with_history(base, rounds=rounds)
    got = incremental_lpa(upd, ch, hist)
    return {r["node"]: r["label"] for r in got.collect()}


def test_incremental_lpa_edge_addition_matches_scratch(spark):
    base = [(0, 1), (1, 2), (3, 4), (4, 5), (5, 3), (6, 7)]
    upd = base + [(2, 3)]  # bridge the chain into the triangle
    assert _incr(spark, base, upd, 3) == _scratch(spark, upd, 3)


def test_incremental_lpa_edge_removal_matches_scratch(spark):
    base = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5), (5, 3)]
    upd = [e for e in base if e != (2, 3)]  # cut the bridge
    assert _incr(spark, base, upd, 4) == _scratch(spark, upd, 4)


def test_incremental_lpa_new_nodes_and_vanished_nodes(spark):
    base = [(0, 1), (1, 2), (10, 11)]
    # 10-11 removed entirely (nodes vanish); new nodes 20, 21 appear
    upd = [(0, 1), (1, 2), (20, 21), (2, 20)]
    assert _incr(spark, base, upd, 3) == _scratch(spark, upd, 3)


def test_incremental_lpa_empty_delta_is_identity(spark):
    base = [(0, 1), (1, 2), (2, 0), (4, 5)]
    got = _incr(spark, base, base, 3)
    assert got == _scratch(spark, base, 3)


def test_incremental_lpa_two_clique_bridge_flip(spark):
    # the canonical two-clique graph: moving the bridge must re-resolve
    # the contested node identically to scratch
    k1 = [(0, 1), (0, 2), (1, 2)]
    k2 = [(5, 6), (5, 7), (6, 7)]
    base = k1 + k2 + [(2, 5)]
    upd = k1 + k2 + [(0, 7)]
    assert _incr(spark, base, upd, 4) == _scratch(spark, upd, 4)


def test_incremental_lpa_stored_matches_scratch_with_pruned_reads(spark, tmp_path):
    """The bucket-partitioned stored refresh: same recurrence as
    incremental_lpa (scratch equality on the updated graph), and every
    adjacency/history scan in the final round's plan carries a __bucket
    partition filter (the sub-O(E) access path)."""
    from pyspark.sql import functions as F

    from chatbot_spark.operators.graph import (
        _symmetrize,
        incremental_lpa_stored,
        write_lpa_snapshot,
    )

    base = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5), (5, 3), (8, 9)]
    upd = [e for e in base if e != (2, 3)] + [(0, 8)]
    base_df = spark.createDataFrame(base, "src long, dst long")
    upd_df = spark.createDataFrame(upd, "src long, dst long")
    snap = str(tmp_path / "snap")
    write_lpa_snapshot(base_df, snap, rounds=3, n_buckets=4)
    upd_adj = str(tmp_path / "upd_adj")
    (
        _symmetrize(upd_df, "src", "dst")
        .withColumn("__bucket", (F.col("u") % 4).cast("int"))
        .write.partitionBy("__bucket")
        .parquet(upd_adj)
    )
    changed = spark.createDataFrame(
        [(2, 3), (0, 8)], "src long, dst long"
    )
    delta = incremental_lpa_stored(
        spark, snap, upd_adj, changed, rounds=3, n_buckets=4
    )
    got_delta = {r["node"]: r["label"] for r in delta.collect()}
    scratch = _scratch(spark, upd, 3)
    # delta rows must agree with scratch on the updated graph…
    for node, label in got_delta.items():
        assert scratch[node] == label, (node, label, scratch.get(node))
    # …and stitching delta over stored H_3 reproduces scratch exactly
    h3 = {
        r["node"]: r["label"]
        for r in spark.read.parquet(f"{snap}/hist")
        .filter("__round = 3")
        .collect()
    }
    stitched = {n: got_delta.get(n, h3.get(n)) for n in scratch}
    assert stitched == scratch
