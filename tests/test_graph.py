from __future__ import annotations

from pyspark.sql import functions as F

from chatbot_spark.operators.graph import pagerank_integer


def _ref_pagerank(edges, iterations=5, scale=10**12, num=85, den=100):
    """Serial reference of the exact integer recurrence."""
    e = sorted({(s, d) for s, d in edges if s != d})
    nodes = sorted({s for s, _ in e} | {d for _, d in e})
    outdeg = {}
    for s, _ in e:
        outdeg[s] = outdeg.get(s, 0) + 1
    r0 = scale // len(nodes)
    rank = {v: r0 for v in nodes}
    for _ in range(iterations):
        inc = {v: 0 for v in nodes}
        for s, d in e:
            inc[d] += rank[s] // outdeg[s]
        rank = {
            v: ((den - num) * r0) // den + (num * inc[v]) // den for v in nodes
        }
    return rank


def test_pagerank_matches_serial_reference(spark):
    edges = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (0, 1), (1, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["rank"]
        for r in pagerank_integer(df, iterations=5).collect()
    }
    assert got == _ref_pagerank(edges)


def test_pagerank_sink_gains_source_base_only(spark):
    # 3 is a pure source (base term only), 2 a sink accumulating mass.
    edges = [(0, 2), (1, 2), (3, 0), (3, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["rank"]
        for r in pagerank_integer(df, iterations=3).collect()
    }
    ref = _ref_pagerank(edges, iterations=3)
    assert got == ref
    base = ((100 - 85) * (10**12 // 4)) // 100
    assert got[3] == base  # no in-edges: base term exactly
    assert got[2] == max(got.values())  # the sink outranks everyone


def test_pagerank_zero_iterations_uniform(spark):
    df = spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long")
    got = pagerank_integer(df, iterations=0).collect()
    assert {r["rank"] for r in got} == {10**12 // 2}


def test_pagerank_total_mass_conserved_no_dangling(spark):
    # every node has out-edges -> total mass stays within integer-floor
    # loss of the exact recurrence (each of n nodes floors twice per
    # round against den, each edge contribution floors once).
    edges = [(i, (i * 3 + 1) % 7) for i in range(7)] + [
        (i, (i + 2) % 7) for i in range(7)
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    total = (
        pagerank_integer(df, iterations=4)
        .agg(F.sum("rank").alias("t"))
        .collect()[0]["t"]
    )
    assert 0.995 * 10**12 < total <= 10**12


def test_pagerank_warm_start_matches_recurrence_on_coalesced_init(spark):
    # warm-start == applying the recurrence with init = coalesce(prev, r0'):
    # node 4 is new in the delta graph and must start from the NEW r0.
    base_edges = [(0, 1), (1, 2), (2, 0)]
    delta_edges = base_edges + [(3, 4), (4, 0), (2, 3)]
    b = spark.createDataFrame(base_edges, "src long, dst long")
    d = spark.createDataFrame(delta_edges, "src long, dst long")
    warm = pagerank_integer(b, iterations=3)
    got = {
        r["node"]: r["rank"]
        for r in pagerank_integer(d, iterations=2, init=warm).collect()
    }

    prev = _ref_pagerank(base_edges, iterations=3)
    scale, num, den = 10**12, 85, 100
    nodes = {0, 1, 2, 3, 4}
    r0 = scale // len(nodes)
    rank = {v: prev.get(v, r0) for v in nodes}
    e = sorted(set(delta_edges))
    outdeg = {}
    for s, _ in e:
        outdeg[s] = outdeg.get(s, 0) + 1
    for _ in range(2):
        inc = {v: 0 for v in nodes}
        for s, t in e:
            inc[t] += rank[s] // outdeg[s]
        rank = {v: ((den - num) * r0) // den + (num * inc[v]) // den for v in nodes}
    assert got == rank
