"""Plan-shape regression pins for the scan-collapse work (round 6).

Lazy DataFrame subtrees with multiple consumers re-execute per consumer
unless persisted; in iterative/composed operators that compounds — the
unpersisted host_pagerank plan contained 68 parquet scans of the corpus,
web_curation_pipeline 71, t5_span_corrupt 7. These tests pin the
POST-fix source-scan counts (InMemoryFileIndex occurrences in the
formatted physical plan) with a small allowance, so a refactor that
drops a persist or adds an unshared consumer fails loudly instead of
silently multiplying corpus reads at 100 TB.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

# query -> max allowed source scans in the formatted plan. Values are the
# measured post-fix counts + 1 headroom (legitimate multi-table queries
# scan each TABLE once; these bounds are far below the broken state).
SCAN_BUDGET = {
    "host_pagerank": 3,
    "incremental_pagerank": 4,
    "web_curation_pipeline": 4,
    "t5_span_corrupt": 2,
    "lm_quality_buckets": 2,
    "equi_depth_histogram": 2,
    "dpo_pair_mining": 4,
    "bm25_topk": 4,
    "fuzzy_name_pairs": 2,
    "weighted_sample": 2,
    "ngram_novelty": 3,
    "sft_pair_assembly": 2,
    "mlm_example_build": 2,
    "phrase_search": 2,
    "incremental_embed": 4,
    # r6b analytics family (measured + 1 headroom; frequent_pairs and the
    # iterative graph queries checkpoint eagerly, so their declared plans
    # are cache scans — nothing to pin there)
    "event_transitions": 2,
    "cohort_retention": 2,
    "active_user_stickiness": 3,
    "revenue_wow_growth": 2,
    "snapshot_diff": 3,
}


def _scan_count(df) -> int:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue().count("Location: InMemoryFileIndex")


@pytest.mark.parametrize("name", sorted(SCAN_BUDGET))
def test_source_scan_budget(spark, name):
    from chatbot_spark.workload import SPARK_QUERIES

    df = SPARK_QUERIES[name](spark, "/root/testdata/sf0.001")
    n = _scan_count(df)
    assert n <= SCAN_BUDGET[name], (
        f"{name}: {n} source scans (budget {SCAN_BUDGET[name]}) — a shared "
        "subtree lost its persist, or a new consumer needs one"
    )
