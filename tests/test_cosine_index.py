"""Cosine-metric ANN indexes (r10): cosine = l2 over unit vectors —
build() normalizes rows once, search() normalizes the query and reports
dist = ||u-v||^2/2 = 1 - cos. The metric persists with the written index
and a mismatched query metric refuses loudly."""

import numpy as np
import pytest
from pyspark.sql import functions as F


def _brute_cos_topk(rows, queries, k, pred=lambda t: True):
    out = {}
    kept = [(i, np.array(v)) for i, v, t in rows if pred(t)]
    for qid, qv in queries:
        q = np.array(qv)
        qn = q / np.linalg.norm(q)
        scored = sorted(
            (1.0 - float(np.dot(v, qn) / np.linalg.norm(v)), i)
            for i, v in kept
        )
        out[qid] = [i for _, i in scored[:k]]
    return out


@pytest.fixture(scope="module")
def fixture(spark):
    rng = np.random.default_rng(31)
    rows = [
        (int(i), [float(x) for x in rng.standard_normal(8) + 0.3], int(i % 5))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "id long, embedding array<double>, tag int")
    queries = [(int(i), rows[i][1]) for i in range(5)]
    qdf = spark.createDataFrame(
        queries, "query_id long, query_embedding array<double>"
    )
    return rows, df, queries, qdf


def _got(hits):
    out = {}
    for r in hits.orderBy("query_id", "rank").collect():
        out.setdefault(r["query_id"], []).append(r["neighbor_id"])
    return out


def test_ivf_cosine_fullprobe_exact(spark, fixture, tmp_path):
    from chatbot_spark.operators.ann import IVFIndex

    rows, df, queries, qdf = fixture
    IVFIndex.build(
        df.select("id", "embedding"), vec_col="embedding", id_col="id",
        nlist=4, metric="cosine",
    ).write(str(tmp_path / "ivf"))
    loaded = IVFIndex.load(spark, str(tmp_path / "ivf"))
    assert loaded.metric == "cosine"  # metric survives write/load
    hits = loaded.search(qdf, k=10, nprobe=4)
    assert _got(hits) == _brute_cos_topk(rows, queries, 10)
    # reported dist IS the cosine distance (1 - cos), not an l2 artifact
    top = hits.filter("rank = 1").filter(
        F.col("query_id") == F.col("neighbor_id")
    )
    assert top.count() == 5  # self-match first at cos distance ~0
    assert all(abs(r["dist"]) < 1e-9 for r in top.collect())


def test_nsw_cosine_wholeshardbeam_exact(spark, fixture, tmp_path):
    from chatbot_spark.operators.hnsw import NSWGraphIndex

    rows, df, queries, qdf = fixture
    NSWGraphIndex.build(
        df.select("id", "embedding"), vec_col="embedding", id_col="id",
        nlist=3, m=8, ef_construction=64, method="knn", metric="cosine",
    ).write(str(tmp_path / "nsw"))
    loaded = NSWGraphIndex.load(spark, str(tmp_path / "nsw"))
    assert loaded.metric == "cosine"
    hits = loaded.search(qdf, k=10, nprobe=3, ef_search=300)
    assert _got(hits) == _brute_cos_topk(rows, queries, 10)


def test_cosine_append_normalizes_new_rows(spark, fixture):
    from chatbot_spark.operators.ann import IVFIndex

    rows, df, queries, qdf = fixture
    idx = IVFIndex.build(
        df.filter("id < 200").select("id", "embedding"),
        vec_col="embedding", id_col="id", nlist=4, metric="cosine",
    )
    grown = idx.append(df.filter("id >= 200").select("id", "embedding"))
    assert grown.metric == "cosine"
    hits = grown.search(qdf, k=10, nprobe=4)
    assert _got(hits) == _brute_cos_topk(rows, queries, 10)


def test_metric_mismatch_refuses(spark, fixture, tmp_path):
    from chatbot_spark.operators.ann import IVFIndex
    from chatbot_spark.plans.retrieve import RetrieveConfig, retrieve

    rows, df, queries, qdf = fixture
    corpus = df.withColumn(
        "document", F.concat(F.lit("d-"), F.col("id").cast("string"))
    )
    cos_path = str(tmp_path / "cos")
    l2_path = str(tmp_path / "l2")
    IVFIndex.build(
        corpus.select("id", "embedding"), vec_col="embedding", id_col="id",
        nlist=4, metric="cosine",
    ).write(cos_path)
    IVFIndex.build(
        corpus.select("id", "embedding"), vec_col="embedding", id_col="id",
        nlist=4,
    ).write(l2_path)
    with pytest.raises(ValueError, match="built for 'cosine'"):
        retrieve(qdf, corpus, RetrieveConfig(
            mode="universal", k=10, metric="l2", index_path=cos_path,
            recall_slo=1.0,
        ))
    with pytest.raises(ValueError, match="built for 'l2'"):
        retrieve(qdf, corpus, RetrieveConfig(
            mode="universal", k=10, metric="cosine", index_path=l2_path,
            recall_slo=1.0,
        ))


def test_cosine_composes_with_filtered_search(spark, fixture, tmp_path):
    """Metric and filter are orthogonal contracts: a cosine NSW search
    under an allowed-id mask is exact over the filtered corpus at the
    whole-shard beam."""
    from chatbot_spark.operators.hnsw import NSWGraphIndex

    rows, df, queries, qdf = fixture
    idx = NSWGraphIndex.build(
        df.select("id", "embedding"), vec_col="embedding", id_col="id",
        nlist=3, m=8, ef_construction=64, method="knn", metric="cosine",
    )
    allowed = df.filter("tag % 2 = 0").select("id")
    hits = idx.search(qdf, k=10, nprobe=3, ef_search=300, allowed=allowed)
    assert _got(hits) == _brute_cos_topk(
        rows, queries, 10, pred=lambda t: t % 2 == 0
    )


def test_routed_sql_cosine_routes_and_matches(spark, fixture, tmp_path):
    """cosine_dist over a COSINE-registered index routes onto it; values
    match the SQL's direct fold at 6dp (the normalize-then-l2 fold
    differs only in final-ULP float error) and ORDER matches exactly."""
    from chatbot_spark.operators.ann import IVFIndex
    from chatbot_spark.plans.sqlroute import (
        register_corpus_index,
        register_sql_distance_functions,
        routed_sql,
        unregister_corpus_index,
    )

    rows, df, queries, qdf = fixture
    view = "cossql_t"
    df.withColumn("embedding", F.col("embedding").cast("array<float>")) \
        .createOrReplaceTempView(view)
    register_sql_distance_functions(spark)
    path = str(tmp_path / "ivf")
    IVFIndex.build(
        spark.table(view), vec_col="embedding", id_col="id", nlist=4,
        metric="cosine",
    ).write(path)
    register_corpus_index(view, path, metric="cosine")
    try:
        sql = (
            "SELECT id AS neighbor_id, cosine_dist(embedding, "
            f"(SELECT embedding FROM {view} WHERE id = 3)) AS dist "
            f"FROM {view} ORDER BY dist, id LIMIT 10"
        )
        exact = [(r[0], round(r[1], 6)) for r in spark.sql(sql).collect()]
        routed_df = routed_sql(spark, sql)
        assert "parquet" in (
            routed_df._jdf.queryExecution().executedPlan().toString().lower()
        )
        assert [(r[0], round(r[1], 6)) for r in routed_df.collect()] == exact
    finally:
        unregister_corpus_index(view)
