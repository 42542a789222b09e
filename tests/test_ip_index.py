"""Inner-product (MIPS) ANN indexes (r10): the augmentation reduction
[x, sqrt(M^2-||x||^2)] / [q, 0] makes the l2 machinery rank by
descending inner product exactly; dist reports -<x,q>. M^2 freezes at
build, persists with the index, and append refuses rows past it."""

import numpy as np
import pytest
from pyspark.sql import functions as F


def _brute_ip_topk(rows, queries, k, pred=lambda t: True):
    out = {}
    kept = [(i, np.array(v)) for i, v, t in rows if pred(t)]
    for qid, qv in queries:
        q = np.array(qv)
        scored = sorted((-float(np.dot(v, q)), i) for i, v in kept)
        out[qid] = [i for _, i in scored[:k]]
    return out


@pytest.fixture(scope="module")
def fixture(spark):
    rng = np.random.default_rng(37)
    # deliberately NON-unit norms (norms spread 1x-4x): inner product
    # disagrees with both l2 and cosine here, so a wrong reduction shows
    rows = [
        (
            int(i),
            [float(x) for x in rng.standard_normal(8) * (1 + i % 4)],
            int(i % 6),
        )
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


def test_ivf_ip_fullprobe_exact(spark, fixture, tmp_path):
    from chatbot_spark.operators.ann import IVFIndex

    rows, df, queries, qdf = fixture
    IVFIndex.build(
        df.select("id", "embedding"), vec_col="embedding", id_col="id",
        nlist=4, metric="inner_product",
    ).write(str(tmp_path / "ivf"))
    loaded = IVFIndex.load(spark, str(tmp_path / "ivf"))
    assert loaded.metric == "inner_product"
    assert loaded.m2 is not None  # frozen M^2 survives write/load
    hits = loaded.search(qdf, k=10, nprobe=4)
    assert _got(hits) == _brute_ip_topk(rows, queries, 10)
    # reported dist IS -<x,q>: check one value against numpy
    r0 = hits.filter("rank = 1").filter("query_id = 0").first()
    v = dict((i, v) for i, v, t in rows)[r0["neighbor_id"]]
    want = -float(np.dot(np.array(v), np.array(queries[0][1])))
    assert abs(r0["dist"] - want) < 1e-9


def test_nsw_ip_wholeshardbeam_exact(spark, fixture, tmp_path):
    from chatbot_spark.operators.hnsw import NSWGraphIndex

    rows, df, queries, qdf = fixture
    NSWGraphIndex.build(
        df.select("id", "embedding"), vec_col="embedding", id_col="id",
        nlist=3, m=8, ef_construction=64, method="knn",
        metric="inner_product",
    ).write(str(tmp_path / "nsw"))
    loaded = NSWGraphIndex.load(spark, str(tmp_path / "nsw"))
    assert loaded.metric == "inner_product" and loaded.m2 is not None
    hits = loaded.search(qdf, k=10, nprobe=3, ef_search=300)
    assert _got(hits) == _brute_ip_topk(rows, queries, 10)


def test_ip_append_augments_and_refuses_overflow(spark, fixture):
    from chatbot_spark.operators.ann import IVFIndex
    from chatbot_spark.operators.hnsw import NSWGraphIndex

    rows, df, queries, qdf = fixture
    ivf = IVFIndex.build(
        df.filter("id < 200").select("id", "embedding"),
        vec_col="embedding", id_col="id", nlist=4, metric="inner_product",
    )
    # the held-out rows have norms <= the full corpus max only if the max
    # norm landed in the first 200 — filter appended rows to within M
    import math

    ok_ids = [
        i for i, v, t in rows
        if i >= 200 and sum(x * x for x in v) <= ivf.m2
    ]
    grown = ivf.append(
        df.filter(F.col("id").isin(ok_ids)).select("id", "embedding")
    )
    sub = [r for r in rows if r[0] < 200 or r[0] in set(ok_ids)]
    hits = grown.search(qdf, k=10, nprobe=4)
    assert _got(hits) == _brute_ip_topk(sub, queries, 10)

    big = spark.createDataFrame(
        [(999, [math.sqrt(ivf.m2) * 2.0] * 8)], "id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="frozen M"):
        ivf.append(big)
    nsw = NSWGraphIndex.build(
        df.select("id", "embedding"), vec_col="embedding", id_col="id",
        nlist=3, m=8, ef_construction=64, method="knn",
        metric="inner_product",
    )
    with pytest.raises(ValueError, match="frozen M"):
        nsw.append(big)


def test_ip_metric_mismatch_refuses(spark, fixture, tmp_path):
    from chatbot_spark.operators.ann import IVFIndex
    from chatbot_spark.plans.retrieve import RetrieveConfig, retrieve

    rows, df, queries, qdf = fixture
    corpus = df.withColumn(
        "document", F.concat(F.lit("d-"), F.col("id").cast("string"))
    )
    path = str(tmp_path / "ip")
    IVFIndex.build(
        corpus.select("id", "embedding"), vec_col="embedding", id_col="id",
        nlist=4, metric="inner_product",
    ).write(path)
    with pytest.raises(ValueError, match="built for 'inner_product'"):
        retrieve(qdf, corpus, RetrieveConfig(
            mode="universal", k=10, metric="l2", index_path=path,
            recall_slo=1.0,
        ))


def test_ip_composes_with_filtered_search(spark, fixture):
    from chatbot_spark.operators.ann import IVFIndex

    rows, df, queries, qdf = fixture
    idx = IVFIndex.build(
        df, vec_col="embedding", id_col="id", nlist=4,
        metric="inner_product",
    )
    hits = idx.search(qdf, k=10, nprobe=4, where="tag < 3")
    assert _got(hits) == _brute_ip_topk(rows, queries, 10, lambda t: t < 3)


def test_routed_sql_ip_routes_and_matches(spark, fixture, tmp_path):
    from chatbot_spark.operators.ann import IVFIndex
    from chatbot_spark.plans.sqlroute import (
        register_corpus_index,
        register_sql_distance_functions,
        routed_sql,
        unregister_corpus_index,
    )

    rows, df, queries, qdf = fixture
    view = "ipsql_t"
    df.withColumn("embedding", F.col("embedding").cast("array<float>")) \
        .createOrReplaceTempView(view)
    register_sql_distance_functions(spark)
    path = str(tmp_path / "ivf")
    IVFIndex.build(
        spark.table(view), vec_col="embedding", id_col="id", nlist=4,
        metric="inner_product",
    ).write(path)
    register_corpus_index(view, path, metric="inner_product")
    try:
        sql = (
            "SELECT id AS neighbor_id, ip_dist(embedding, "
            f"(SELECT embedding FROM {view} WHERE id = 3)) AS dist "
            f"FROM {view} ORDER BY dist, id LIMIT 10"
        )
        exact = [(r[0], round(r[1], 6)) for r in spark.sql(sql).collect()]
        routed_df = routed_sql(spark, sql)
        assert "parquet" in (
            routed_df._jdf.queryExecution().executedPlan().toString().lower()
        )
        assert [(r[0], round(r[1], 6)) for r in routed_df.collect()] == exact
        # metric mismatch: l2_dist over the ip index refuses loudly
        bad = (
            "SELECT id AS neighbor_id, l2_dist(embedding, "
            f"(SELECT embedding FROM {view} WHERE id = 3)) AS dist "
            f"FROM {view} ORDER BY dist, id LIMIT 10"
        )
        with pytest.raises(ValueError, match="routed_sql"):
            routed_sql(spark, bad)
    finally:
        unregister_corpus_index(view)
