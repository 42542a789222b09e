"""Structural anti-pattern gate over the declared query surface: no
row-at-a-time Python UDF (BatchEvalPython) may appear in any plan — every
Python crossing must be Arrow-batched (ArrowEvalPython / mapInPandas /
applyInPandasWithState). Row UDFs are the classic 10-100x hot-path tax at
100 TB; this test keeps them out permanently.

Queries with eager side effects (streaming drains, corpus writes, file
synthesis) are skipped here — building their DataFrame runs multi-second
jobs; their plans are audited piecemeal in PLANS.md instead.
"""

from __future__ import annotations

import pytest

# queries whose BUILDER is eager (writes temp corpora, drains streams,
# synthesizes files) — excluded to keep this audit fast
EAGER = {
    "stream_hourly_rollup", "stream_sessionize", "stream_boundary_sessionize",
    "stream_dedup", "stream_static_join", "stream_interval_join",
    "stream_left_outer_join", "ingest_pipeline", "compact_small_files",
    "range_layout_pruning", "json_roundtrip", "csv_orc_roundtrip",
    "markdown_scan", "media_features", "audio_features", "video_frames",
    "catalog_roundtrip", "ivf_knn", "ivf_knn_fullprobe", "lsh_knn",
    "pq_knn", "ivfpq_knn", "rag_pipeline_e2e",
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
