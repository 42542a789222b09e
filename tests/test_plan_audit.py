"""Structural anti-pattern gate over the declared query surface: no
row-at-a-time Python UDF (BatchEvalPython) may appear in any plan — every
Python crossing must be Arrow-batched (ArrowEvalPython / mapInPandas /
applyInPandasWithState). Row UDFs are the classic 10-100x hot-path tax at
100 TB; this test keeps them out permanently.

Queries with eager side effects (streaming drains, corpus writes, file
synthesis) get their own pass below: every SQL execution they trigger —
streaming micro-batches, foreachBatch merges, temp-corpus writes — is
audited through the SQL status store's physical plan descriptions, so the
no-row-UDF gate holds over ALL declared plans, lazy and eager alike.
"""

from __future__ import annotations

import pytest

# queries whose BUILDER is eager (writes temp corpora, drains streams,
# synthesizes files) — audited via the status store in the EAGER test,
# where every execution they fire is captured, not just the returned plan
EAGER = {
    "stream_hourly_rollup", "stream_sessionize", "stream_boundary_sessionize",
    "stream_dedup", "stream_static_join", "stream_interval_join",
    "stream_left_outer_join", "stream_upsert", "stream_retract_rollup",
    "stream_point_in_time",
    "ingest_pipeline",
    "compact_small_files", "incremental_join_view_stored",
    "range_layout_pruning", "json_roundtrip", "csv_orc_roundtrip",
    "markdown_scan", "media_features", "audio_features", "video_frames",
    "catalog_roundtrip", "ivf_knn", "ivf_append_fullprobe", "lsh_knn",
    "pq_knn", "ivfpq_knn", "graph_knn", "graph_knn_fullprobe",
    "graph_knn_deleted",
    "rag_pipeline_e2e",
    "retrieve_routed", "retrieve_routed_pruned",
    "retrieve_routed_nsw", "retrieve_routed_nsw_pruned",
    "decremental_components_stored", "mixed_edge_batch_stored",
    "stream_edge_crud_components",
}


def test_no_row_at_a_time_python_udf_in_any_declared_query(spark):
    from chatbot_spark.workload import SPARK_QUERIES

    sf_dir = "/root/testdata/sf0.001"
    offenders = []
    audited = 0
    for name, fn in SPARK_QUERIES.items():
        if name in EAGER:
            continue
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        audited += 1
        if "BatchEvalPython" in plan:
            offenders.append(name)
    assert audited >= 70  # the audit really covers the surface
    assert offenders == []


def test_no_row_udf_in_any_eager_query_execution(spark):
    """The EAGER half of the gate: run each side-effecting query at
    sf0.001 and audit EVERY SQL execution it fired — temp-corpus writes,
    index builds, streaming micro-batches (they register SQL executions
    too), foreachBatch merge batches — via the shared SQLAppStatusStore.
    This is strictly stronger than auditing the returned DataFrame: the
    drain/write paths are exactly where a row UDF could otherwise hide."""
    from chatbot_spark.workload import SPARK_QUERIES

    store = spark._jsparkSession.sharedState().statusStore()

    def last_execution_id() -> int:
        lst = store.executionsList()
        n = lst.size()
        return lst.apply(n - 1).executionId() if n else -1

    sf_dir = "/root/testdata/sf0.001"
    offenders = []
    audited = 0
    for name in sorted(EAGER & set(SPARK_QUERIES)):
        before = last_execution_id()
        df = SPARK_QUERIES[name](spark, sf_dir)
        # drive the returned plan too, so it lands in the store as well
        df.write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        lst = store.executionsList()
        seen = 0
        for i in range(lst.size()):
            e = lst.apply(i)
            if e.executionId() <= before:
                continue
            seen += 1
            if "BatchEvalPython" in e.physicalPlanDescription():
                offenders.append((name, int(e.executionId())))
        assert seen >= 1, f"{name} fired no auditable execution"
        audited += 1
    assert audited >= 20  # the eager surface really is covered
    assert offenders == []
