"""plans/sqlroute.py — raw-SQL top-k routing onto a registered index
(SURVEY §4 item (a), round-9 verdict item 6): transparency at slo=1.0,
loud refusal on metric mismatch, and exact-scan pass-through for every
shape the index can't serve."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    from chatbot_spark.operators.ann import IVFIndex
    from chatbot_spark.plans.sqlroute import (
        register_corpus_index,
        register_sql_distance_functions,
        unregister_corpus_index,
    )

    register_sql_distance_functions(spark)
    rng = np.random.default_rng(11)
    rows = [
        (int(i), [float(x) for x in rng.standard_normal(8)], f"doc-{i}")
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "id long, embedding array<float>, document string")
    df.createOrReplaceTempView("sqlroute_t")
    path = os.path.join(str(tmp_path_factory.mktemp("sqlroute")), "ivf")
    IVFIndex.build(
        df.select("id", "embedding"), vec_col="embedding", id_col="id", nlist=4
    ).write(path)
    register_corpus_index("sqlroute_t", path, metric="l2")
    yield "sqlroute_t"
    unregister_corpus_index("sqlroute_t")


_Q = "(SELECT embedding FROM sqlroute_t WHERE id = 3)"


def _routed_plan_used(df) -> bool:
    # the routed plan reads the written index (parquet scan of cells/),
    # the exact plan scans only the in-memory temp view
    return "cells" in df._jdf.queryExecution().executedPlan().toString() or (
        "parquet" in df._jdf.queryExecution().optimizedPlan().toString().lower()
    )


def test_routed_equals_exact_bit_for_bit(spark, corpus):
    from chatbot_spark.plans.sqlroute import routed_sql

    sql = (
        f"SELECT id AS neighbor_id, l2_dist(embedding, {_Q}) AS dist "
        f"FROM {corpus} ORDER BY dist, id LIMIT 10"
    )
    exact = [(r[0], r[1]) for r in spark.sql(sql).collect()]
    routed_df = routed_sql(spark, sql)
    routed = [(r[0], r[1]) for r in routed_df.collect()]
    assert routed == exact  # values AND order, doubles bit-for-bit
    assert _routed_plan_used(routed_df)  # it actually took the index


def test_routed_serves_document_and_arg_order(spark, corpus):
    from chatbot_spark.plans.sqlroute import routed_sql

    # swapped args + document payload + ORDER BY the full expression.
    # Spark's own SQL-UDF impl REFUSES a UDF in Sort
    # (UNSUPPORTED_SQL_UDF_USAGE), so the exact baseline must use the
    # alias form — the rewrite handles the expression form too, a shape
    # plain spark.sql can't even run.
    sql = (
        f"SELECT document, id, l2_dist({_Q}, embedding) AS d "
        f"FROM {corpus} ORDER BY l2_dist({_Q}, embedding) ASC LIMIT 5"
    )
    alias_form = (
        f"SELECT document, id, l2_dist({_Q}, embedding) AS d "
        f"FROM {corpus} ORDER BY d ASC LIMIT 5"
    )
    exact = [tuple(r) for r in spark.sql(alias_form).collect()]
    routed = [tuple(r) for r in routed_sql(spark, sql).collect()]
    assert routed == exact


def test_metric_mismatch_refuses_loudly(spark, corpus):
    from chatbot_spark.plans.sqlroute import routed_sql

    sql = (
        f"SELECT id, cosine_dist(embedding, {_Q}) AS d "
        f"FROM {corpus} ORDER BY d LIMIT 5"
    )
    with pytest.raises(ValueError, match="cosine.*l2|l2.*cosine"):
        routed_sql(spark, sql)


@pytest.mark.parametrize(
    "sql",
    [
        # unregistered table
        "SELECT id, l2_dist(embedding, {q}) AS d FROM sqlroute_other ORDER BY d LIMIT 5",
        # DESC: farthest-first is not a NN query
        "SELECT id, l2_dist(embedding, {q}) AS d FROM {t} ORDER BY d DESC LIMIT 5",
        # ranking on a non-indexed column
        "SELECT id, l2_dist(embedding2, {q}) AS d FROM {t} ORDER BY d LIMIT 5",
        # extra un-servable select column
        "SELECT id, embedding, l2_dist(embedding, {q}) AS d FROM {t} ORDER BY d LIMIT 5",
        # query arg references the corpus row (self-distance): not
        # routable (all-zero dists, so tie-break by id for determinism)
        "SELECT id, l2_dist(embedding, embedding) AS d FROM {t} ORDER BY d, id LIMIT 5",
        # no LIMIT / no ORDER BY shape
        "SELECT id, l2_dist(embedding, {q}) AS d FROM {t} LIMIT 5",
    ],
)
def test_pass_through_shapes(spark, corpus, sql):
    """Non-matching shapes must fall back to spark.sql verbatim — same
    answer as the exact form (or the exact form's own analysis error)."""
    from chatbot_spark.plans.sqlroute import routed_sql

    q = sql.format(t=corpus, q=_Q)
    try:
        want = [tuple(r) for r in spark.sql(q).collect()]
        want_err = None
    except Exception as e:
        want, want_err = None, type(e)
    if want_err is not None:
        with pytest.raises(want_err):
            routed_sql(spark, q).collect()
    else:
        got = [tuple(r) for r in routed_sql(spark, q).collect()]
        assert sorted(map(repr, got)) == sorted(map(repr, want))


def test_sql_udfs_match_dataframe_functions(spark, corpus):
    """The SQL scalar UDFs fold bit-identically to functions/vector.py."""
    from chatbot_spark.functions.vector import cosine_distance, l2_distance

    df = spark.table(corpus).limit(50)
    q = spark.table(corpus).filter(F.col("id") == 3).select(
        F.col("embedding").alias("qe")
    )
    j = df.crossJoin(F.broadcast(q))
    got = j.selectExpr("id", "l2_dist(embedding, qe) AS a", "cosine_dist(embedding, qe) AS b")
    want = j.select(
        "id",
        l2_distance(F.col("embedding"), F.col("qe")).alias("a"),
        cosine_distance(F.col("embedding"), F.col("qe")).alias("b"),
    )
    lg = {r["id"]: (r["a"], r["b"]) for r in got.collect()}
    lw = {r["id"]: (r["a"], r["b"]) for r in want.collect()}
    assert lg == lw


def test_two_distance_calls_pass_through(spark, corpus):
    """Two distance calls = two DIFFERENT rankings in one select list —
    routing would serve one call's value for both columns and could
    validate the ORDER BY against the wrong one (review finding r10):
    must pass through and return exactly the exact scan's answer."""
    from chatbot_spark.plans.sqlroute import routed_sql

    sql = (
        f"SELECT id AS neighbor_id, l2_dist(embedding, {_Q}) AS a, "
        f"l2_dist(embedding, (SELECT embedding FROM {corpus} WHERE id = 7)) AS b "
        f"FROM {corpus} ORDER BY b, id LIMIT 10"
    )
    exact = spark.sql(sql).collect()
    routed_df = routed_sql(spark, sql)
    assert "cells" not in (
        routed_df._jdf.queryExecution().executedPlan().toString()
    )
    assert routed_df.collect() == exact
    # the two columns must differ (ranking by b, reporting a correctly)
    assert any(abs(r["a"] - r["b"]) > 1e-9 for r in exact)


def test_metric_mismatch_on_unroutable_shape_passes_through(spark, corpus):
    """The refuse-loudly contract applies only to SQL that WOULD route:
    a cosine_dist query over the l2 index that cannot route anyway
    (ORDER BY id — not a NN query) must pass through verbatim, not raise
    (review finding r10)."""
    from chatbot_spark.plans.sqlroute import routed_sql

    sql = (
        f"SELECT id AS neighbor_id, cosine_dist(embedding, {_Q}) AS d "
        f"FROM {corpus} ORDER BY id ASC LIMIT 10"
    )
    exact = spark.sql(sql).collect()
    assert routed_sql(spark, sql).collect() == exact  # no ValueError

    # and the mismatch on a ROUTABLE shape still raises
    import pytest as _pytest

    routable = (
        f"SELECT id AS neighbor_id, cosine_dist(embedding, {_Q}) AS d "
        f"FROM {corpus} ORDER BY d, id LIMIT 10"
    )
    with _pytest.raises(ValueError, match="routed_sql"):
        routed_sql(spark, routable)
