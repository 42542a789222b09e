"""Routed radius (range) search over the IVF index (r10): per-cell
radii + triangle-inequality pruning — complete by construction (a cell
with d(q, centroid) > r + cell_radius cannot contain a match)."""

import re

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def fixture(spark):
    rng = np.random.default_rng(41)
    # two well-separated clusters so pruning has something to prune
    rows = [
        (
            int(i),
            [float(x) for x in rng.standard_normal(8) * 0.3
             + (0.0 if i % 2 else 20.0)],
        )
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "id long, embedding array<double>")
    queries = [(int(i), rows[i][1]) for i in (0, 2, 4)]
    qdf = spark.createDataFrame(
        queries, "query_id long, query_embedding array<double>"
    )
    return rows, df, queries, qdf


def _brute(rows, queries, r):
    out = {}
    for qid, qv in queries:
        q = np.array(qv)
        out[qid] = sorted(
            i for i, v in rows if float(np.linalg.norm(np.array(v) - q)) <= r
        )
    return out


def _got(hits):
    out = {}
    for row in hits.collect():
        out.setdefault(row["query_id"], []).append(row["neighbor_id"])
    return {k: sorted(v) for k, v in out.items()}


def test_radius_routed_complete_and_pruned(spark, fixture, tmp_path):
    from chatbot_spark.operators.ann import IVFIndex

    rows, df, queries, qdf = fixture
    IVFIndex.build(
        df, vec_col="embedding", id_col="id", nlist=8
    ).with_cell_stats().write(str(tmp_path / "ivf"))
    loaded = IVFIndex.load(spark, str(tmp_path / "ivf"))
    assert "radius" in loaded.centroids.columns  # stats survive write/load
    hits = loaded.radius_search(qdf, 1.5)
    assert _got(hits) == _brute(rows, queries, 1.5)
    # the far cluster's cells must be pruned out of the scan
    plan = hits._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"centroid_id#\d+ IN \(([^)]*)\)", plan)
    assert m is not None
    assert 0 < len(m.group(1).split(",")) < 8


def test_radius_routed_append_growth_stays_complete(spark, fixture):
    """A stale (too small) cell radius after append would silently drop
    matches — append must tighten radii from the delta."""
    from chatbot_spark.operators.ann import IVFIndex

    rows, df, queries, qdf = fixture
    rng = np.random.default_rng(43)
    idx = IVFIndex.build(
        df, vec_col="embedding", id_col="id", nlist=8
    ).with_cell_stats()
    far_rows = [
        (1000 + j, [float(x) for x in rng.standard_normal(8) * 0.3 + 22.0])
        for j in range(10)
    ]
    grown = idx.append(
        spark.createDataFrame(far_rows, "id long, embedding array<double>")
    )
    all_rows = rows + far_rows
    hits = grown.radius_search(qdf, 3.5)
    assert _got(hits) == _brute(all_rows, queries, 3.5)


def test_radius_routed_cosine_metric(spark, fixture):
    from chatbot_spark.operators.ann import IVFIndex

    rows, df, queries, qdf = fixture
    idx = IVFIndex.build(
        df, vec_col="embedding", id_col="id", nlist=8, metric="cosine"
    ).with_cell_stats()
    r = 0.05  # cosine distance threshold
    hits = idx.radius_search(qdf, r)

    def brute_cos():
        out = {}
        for qid, qv in queries:
            q = np.array(qv)
            qn = q / np.linalg.norm(q)
            out[qid] = sorted(
                i for i, v in rows
                if 1.0 - float(
                    np.dot(np.array(v), qn) / np.linalg.norm(np.array(v))
                ) <= r + 1e-12
            )
        return out

    got = _got(hits)
    want = brute_cos()
    vec_by_id = dict(rows)
    q_by_id = dict(queries)
    # boundary rows can flip on the float fold — allow a symmetric
    # difference only within 1e-9 of the threshold itself
    for qid in want:
        sym = set(got.get(qid, [])) ^ set(want[qid])
        for i in sym:
            v = np.array(vec_by_id[i])
            q = np.array(q_by_id[qid])
            d = 1.0 - float(
                np.dot(v, q / np.linalg.norm(q)) / np.linalg.norm(v)
            )
            assert abs(d - r) < 1e-9, (qid, i, d)


def test_radius_routed_ip_refuses(spark, fixture):
    from chatbot_spark.operators.ann import IVFIndex

    rows, df, queries, qdf = fixture
    idx = IVFIndex.build(
        df, vec_col="embedding", id_col="id", nlist=4,
        metric="inner_product",
    )
    with pytest.raises(ValueError, match="radius_search is undefined"):
        idx.radius_search(qdf, 1.0)
