"""Shuffle-volume audit — the scale-killer scan, measured instead of
eyeballed. For each audited query: input records, shuffle write/read
records and shuffle bytes, diffed from Spark's status-API stage metrics
before vs after the run. The number that matters at 100 TB is the ROW
AMPLIFICATION shuffle_write_records / input_records: a query that
shuffles (a large multiple of) what it scans re-materializes the
dataset across the network every run and becomes exchange-bound at
1000 executors no matter how good the kernels are.

Rows, not bytes, on the scan side: this Spark build's vectorized
parquet reader reports only footer/metadata bytes in the stage
inputBytes metric (11 MB lineitem scan → 17 KB reported), while
inputRecords is exact — so the denominator is records. Shuffle BYTES
are tracked exactly and are reported as absolute volume.

Interpreting row ratios (written into SHUFFLE_AUDIT.json):
  ~0      map-side-only (broadcast joins, pushed filters, partial aggs
          collapsing to few groups) — scales on scan bandwidth alone;
  <~0.5   healthy reduction (map-side combine; count-distinct Expand
          partials land here: distinct combos per partition);
  ~1-2    one or two full re-partitions of the input (sorts, joins on
          the fact key, windowed dedup) — acceptable when the op IS a
          re-layout or keyed join;
  >>1     amplification — pair explosion or multi-pass shuffling; must
          be justified per query (pair generators are output-bound by
          design) or fixed.

Usage: PYTHONPATH=/root/repo python tools/audit_shuffle.py [sf_dir] [query ...]
Defaults: sf0.1 and the 20 largest-input headline entries. Writes
``SHUFFLE_AUDIT.json`` and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# default audit set: the shuffle-interesting headline entries (joins,
# windows, dedup, pair generators, layout writers) — floor-bound scans
# tell us nothing about exchanges
DEFAULT_QUERIES = [
    "pricing_summary",
    "revenue_by_nation",
    "late_sole_supplier",
    "market_share",
    "big_orders",
    "min_cost_supplier",
    "top_supplier_revenue",
    "asof_purchase_click",
    "sessionize",
    "knn_exact_l2",
    "embedding_neardup",
    "minhash_lsh_neardup",
    "simhash_neardup",
    "dedup_exact",
    "paragraph_dedup",
    "exact_substring_dedup",
    "semantic_dedup_bucketed",
    "dataprep_pipeline",
    "fuzzy_name_pairs",
    "dsir_select",
    "encode_tokens",
    "capped_class_sample",
    "salted_event_counts",
    "events_hopping_window",
    # r6 web-curation / training-example family
    "host_pagerank",
    "phrase_search",
    "lm_quality_buckets",
    "web_curation_pipeline",
    "t5_span_corrupt",
    "ngram_novelty",
    "sft_pair_assembly",
    "equi_depth_histogram",
    # r6b graph/analytics family
    "frequent_pairs",
    "host_triangles",
    "event_transitions",
    "cohort_retention",
    "retrieval_eval",
    # r6c diversity/quality/maintenance family
    "mmr_diversified",
    "rm3_expanded_search",
    "incremental_join_view",
    "lpa_communities",
    # r7 incremental-maintenance family
    "incremental_join_view_stored",
    "incremental_lpa",
    "k_anonymity_audit",
    "constraint_audit",
    "ols_daily_trend",
    "point_in_time_features",
    # r7b sketch/graph/text family
    "hdr_quantile_sketch",
    "host_components",
    "incremental_components",
    "pmi_collocations",
    "mad_outlier_audit",
    "prefix_jaccard_neardup",
    # r7c/r8 composition + streaming + sketch-store family (round-7
    # verdict item 5: every headline entry above ~2 s is audited)
    "neardup_clusters_exact",
    "stream_components",
    "hdr_sketch_slice",
    "decremental_components",
    "prefix_jaccard_adversarial",
    "mixed_edge_batch_components",
    "retrieve_routed",
    # r9 family: stored-snapshot refreshes, NSW-routed read path, the
    # hash-free ExactSubstr twin, the z-set streaming CRUD fold, and the
    # token-budget mixture
    "decremental_components_stored",
    "mixed_edge_batch_stored",
    "retrieve_routed_nsw",
    "exact_substring_sa",
    "stream_edge_crud_components",
    "token_budget_mixture",
    # r10 family: filtered routed search — the IVF where-pushdown path
    # (predicate inside the cells scan, zero extra exchanges expected)
    # and the NSW emit-mask path (one allowed-id join onto the probed
    # shards — the mask's exchange cost is exactly what to watch)
    "retrieve_filtered_ivf",
    "retrieve_filtered_nsw",
    "retrieve_filtered_auto",
    # r12 family: the cosine pins' restructured checked projection adds
    # a Q×k broadcast join back to the raw vectors (the dist_ok
    # invariant) — watch that it stays broadcast, never a shuffle of
    # the corpus
    "retrieve_routed_cosine",
    "routed_sql_cosine",
]


# Per-query justification for row amplification > 2 — the audit fails
# loud on any NEW flagged query with no entry here (design review gate).
JUSTIFIED = {
    "prefix_jaccard_neardup": (
        "candidate-pair generation IS the operator (the frequent_pairs "
        "discipline): prefix buckets emit (id_a, id_b) id tuples — never "
        "text — bounded by sum over PREFIX shingles of df(p)^2 after the "
        "length prune; on the Zipf corpus prefixes hit the rare tail so "
        "the remaining >2 ratio is the shingle explode + df/rank "
        "exchanges (O(tokens) rows vs a doc-count denominator), and the "
        "complete pair set is the contract the naive-join oracle pins"
    ),
    "prefix_jaccard_adversarial": (
        "the SAME operator pinned on the 31-token worst-case corpus, "
        "where every shingle is corpus-frequent and the prefix filter "
        "legitimately cannot prune (sum df(p)^2 is near-quadratic by "
        "construction); kept small (sf0.01 correctness pin) — the "
        "realistic regime is prefix_jaccard_neardup + BENCH_PREFIXJOIN"
    ),
    "neardup_clusters_exact": (
        "composition of prefix_jaccard_neardup (see its entry) with "
        "4 hash-to-min CC rounds over the pair graph: each round "
        "re-exchanges O(V+E) (node, label) tuples — ids and labels, "
        "never text; per-round volume flat (the Pregel contract), and "
        "the convergence assertion adds one O(V) probe round"
    ),
    "mixed_edge_batch_components": (
        "three composed CC solves (snapshot build + decremental slice "
        "re-solve + incremental contracted solve), each re-exchanging "
        "O(V+E) (node, label) longs per pinned round plus a convergence "
        "probe — the Pregel contract three times over; the denominator "
        "is one documents scan while the work is graph-round-bound"
    ),
    "stream_components": (
        "three AvailableNow micro-batches, each folding a delta into "
        "the stored snapshot via incremental_components: per batch the "
        "contracted solve re-exchanges its delta-sized graph over 6 "
        "pinned rounds + the O(V) stitch/write — (node, label) longs "
        "only; per-batch volume is O(delta + touched), not corpus"
    ),
    "dataprep_pipeline": (
        "n-gram pair generation IS the operator: 5k docs explode to ~1.1M "
        "hashed 3-gram/pair rows (~10 B/row — hashes, never text); "
        "output-bound by design"
    ),
    "fuzzy_name_pairs": (
        "deletion-neighborhood blocking emits k+1 hashed variants per name "
        "by construction; compute measured output-bound in r4"
    ),
    "exact_substring_dedup": (
        "one (md5, id, start) tuple per 50-gram position (Lee et al.); the "
        "exchange carries 24-byte hashes, never document text"
    ),
    "semantic_dedup_bucketed": (
        "cell-pair candidate emission after triangle-inequality pruning; "
        "pair set proven equal to exact (r5)"
    ),
    "late_sole_supplier": (
        "fact join shuffle (lineitem+orders on orderkey) + the "
        "two-count-distinct Expand (x2 partials) - the TPC-H Q21 cost; "
        "one lineitem scan since r6"
    ),
    "lm_quality_buckets": (
        "the scoring grain is the bigram: O(tokens) rows cross the model "
        "join and the doc reduce vs a doc-count input denominator; rows "
        "are (w1, w2, ids), never documents"
    ),
    "web_curation_pipeline": (
        "composition of the LM bigram grain (see lm_quality_buckets) "
        "with the Pregel edge exchanges; no stage exceeds its "
        "individually audited shape"
    ),
    "t5_span_corrupt": (
        "example assembly is per-token by definition: the (doc, pos) "
        "postings exchange and mask/island joins carry token-position "
        "tuples, bounded by O(tokens) with ~6% masked"
    ),
    "ngram_novelty": (
        "one md5 per 8-gram position crosses the corpus-count exchange "
        "(the dedup-family discipline: hashes + ids, never text); "
        "denominator is doc rows"
    ),
    "phrase_search": (
        "postings explode is join-filtered by the broadcast phrase side "
        "BEFORE any exchange; the wide shuffles carry only matched "
        "anchor votes (tokens x phrase terms that hit)"
    ),
    "host_pagerank": (
        "five supersteps re-exchange the O(edges) contribution stream "
        "(2 link rules per doc) plus the O(nodes) rank table - the "
        "Pregel contract; per-round volume is flat, never compounding"
    ),
    "sft_pair_assembly": (
        "one keyed exchange of the event stream for the frame window "
        "(ratio ~1); the pair-numbering window reuses the partitioning"
    ),
    "frequent_pairs": (
        "the within-basket pair self-join IS the operator: C(k,2) pair "
        "rows per basket after the a-priori item prune; rows are "
        "(basket, item, item) ids, never payloads"
    ),
    "host_triangles": (
        "wedge enumeration at the oriented pivot: out-degree bounded "
        "O(sqrt m) by the degree orientation, wedges close immediately "
        "against the edge set — the Suri–Vassilvitskii contract"
    ),
    "frequent_triples": (
        "the within-basket triple self-join IS the operator (the "
        "frequent_pairs contract one order up): C(k,3) candidate rows "
        "per basket AFTER the a-priori prune to frequent pairs — rows "
        "are (basket, item, item, item) ids, never payloads; "
        "output-bound by the support threshold"
    ),
    "exact_substring_sa": (
        "the class tables are per-POSITION by definition (one row per "
        "token position crosses each of the O(log w) prefix-doubling "
        "relabel exchanges — fixed-size (id, pos, class) tuples, never "
        "text) vs a doc-count denominator; the md5 window form "
        "(exact_substring_dedup) is the 1-exchange production default, "
        "this is its hash-free exactness twin"
    ),
    "stream_edge_crud_components": (
        "three composed solves across the micro-batches (batch 1 "
        "incrementally solves the full arriving graph from empty, batch "
        "2 runs the decremental slice + incremental contracted solves), "
        "each re-exchanging O(V+E) (node, label) longs per pinned round "
        "plus convergence probes — the Pregel contract through the "
        "stream; per-batch volume is O(delta + touched), the denominator "
        "is one documents scan"
    ),
}


def stage_totals(ui: str) -> dict:
    """Sum shuffle/input metrics over all completed stages so far."""
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app_id = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
        )
    )
    tot = {
        "shuffle_write_b": 0, "shuffle_read_b": 0, "input_rec": 0,
        "shuffle_write_rec": 0, "shuffle_read_rec": 0, "tasks": 0,
        "spill_b": 0,
    }
    for s in stages:
        tot["shuffle_write_b"] += s.get("shuffleWriteBytes", 0)
        tot["shuffle_read_b"] += s.get("shuffleReadBytes", 0)
        tot["input_rec"] += s.get("inputRecords", 0)
        tot["shuffle_write_rec"] += s.get("shuffleWriteRecords", 0)
        tot["shuffle_read_rec"] += s.get("shuffleReadRecords", 0)
        tot["spill_b"] += s.get("diskBytesSpilled", 0)
        tot["tasks"] += s.get("numCompleteTasks", 0)
    return tot


def _rejustify(path: str) -> int:
    """Recompute the flagged/unjustified blocks of an EXISTING artifact
    from the current JUSTIFIED table — measurements are deterministic,
    so a justification text added after a sweep must not force re-running
    55 sf1 queries to refresh two derived fields."""
    with open(path) as f:
        payload = json.load(f)
    flagged = sorted(
        (
            (name, r)
            for name, r in payload["queries"].items()
            if r["row_amplification"] is not None and r["row_amplification"] > 2.0
        ),
        key=lambda kv: -kv[1]["row_amplification"],
    )
    unjustified = [n for n, _ in flagged if n not in JUSTIFIED]
    payload["row_amplified_gt_2"] = {
        n: JUSTIFIED.get(n, "UNJUSTIFIED — design review required")
        for n, _ in flagged
    }
    payload["unjustified"] = unjustified
    with open(path, "w") as f:
        f.write(json.dumps(payload, separators=(",", ":")) + "\n")
    print(json.dumps({"unjustified": unjustified, "flagged": [n for n, _ in flagged]}))
    return 1 if unjustified else 0


def main() -> int:
    argv = sys.argv[1:]
    # --json PATH: write the artifact somewhere other than
    # SHUFFLE_AUDIT.json (e.g. SHUFFLE_AUDIT_SF1.json for the sf1
    # derivation — r8 verdict item 6 — without clobbering the sf0.1 one)
    out_file = os.path.join(REPO, "SHUFFLE_AUDIT.json")
    if "--json" in argv:
        i = argv.index("--json")
        out_file = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    if "--rejustify" in argv:
        return _rejustify(out_file)
    sf_dir = argv[0] if argv else "/root/testdata/sf0.1"
    names = argv[1:] or DEFAULT_QUERIES

    from chatbot_spark.session import get_spark
    from chatbot_spark.workload import SPARK_QUERIES

    spark = get_spark(
        "shuffle-audit",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.showConsoleProgress": "false",
            # the before/after diff is a SUM over retained completed
            # stages: iterative/streaming queries (localCheckpoint per
            # round, foreachBatch) run thousands of stages, and default
            # retention (1000) EVICTS earlier stages mid-audit — the
            # "after" sum then undercounts and the delta goes negative
            # (r8: neardup_clusters_exact/stream_components read None)
            "spark.ui.retainedStages": "100000",
            "spark.ui.retainedJobs": "100000",
        },
    )
    ui = spark.sparkContext.uiWebUrl
    mb = 1.0 / (1024 * 1024)

    results = {}
    for name in names:
        if name not in SPARK_QUERIES:
            print(f"WARN unknown query {name}", file=sys.stderr)
            continue
        before = stage_totals(ui)
        SPARK_QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        after = stage_totals(ui)
        spark.catalog.clearCache()
        in_rec = after["input_rec"] - before["input_rec"]
        sw_rec = after["shuffle_write_rec"] - before["shuffle_write_rec"]
        sw_b = after["shuffle_write_b"] - before["shuffle_write_b"]
        results[name] = {
            "input_records": in_rec,
            "shuffle_write_records": sw_rec,
            "shuffle_read_records": after["shuffle_read_rec"]
            - before["shuffle_read_rec"],
            "shuffle_write_mb": round(sw_b * mb, 2),
            "shuffle_read_mb": round(
                (after["shuffle_read_b"] - before["shuffle_read_b"]) * mb, 2
            ),
            "spill_mb": round((after["spill_b"] - before["spill_b"]) * mb, 2),
            "tasks": after["tasks"] - before["tasks"],
            "row_amplification": round(sw_rec / in_rec, 3) if in_rec > 0 else None,
        }

    flagged = sorted(
        (
            (name, r)
            for name, r in results.items()
            if r["row_amplification"] is not None and r["row_amplification"] > 2.0
        ),
        key=lambda kv: -kv[1]["row_amplification"],
    )
    unjustified = [n for n, _ in flagged if n not in JUSTIFIED]
    payload = {
        "metric": "shuffle_audit",
        "sf_dir": sf_dir,
        "queries": results,
        "row_amplified_gt_2": {
            n: JUSTIFIED.get(n, "UNJUSTIFIED — design review required")
            for n, _ in flagged
        },
        "unjustified": unjustified,
    }
    with open(out_file, "w") as f:
        f.write(json.dumps(payload, separators=(",", ":")) + "\n")
    print(json.dumps(payload, separators=(",", ":")))
    spark.stop()
    return 1 if unjustified else 0


if __name__ == "__main__":
    raise SystemExit(main())
