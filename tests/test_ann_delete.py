"""Tombstone deletes on the NSW graph index (hnsw.py::delete /
compact_deletes): exactness of the filtered search, persistence through
write/load, tombstone survival across append, and the shard-local
compaction contract (untouched shards keep their graphs byte-for-byte).
"""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from chatbot_spark.operators.hnsw import NSWGraphIndex


def _corpus(spark, n=60, d=8, shift=0):
    rows = [
        (i, [float(((i * 37 + j * 11 + shift) % 97)) / 97.0 for j in range(d)])
        for i in range(shift, shift + n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _queries(corpus, n=3):
    return corpus.filter(F.col("vec_id") % 17 == 0).limit(n).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_embedding"),
    )


def _exact_topk(corpus, queries, k, exclude):
    from chatbot_spark.operators.topk import knn_join

    rem = corpus.filter(~F.col("vec_id").isin(sorted(exclude)))
    return knn_join(
        queries, rem, k=k, metric="l2", corpus_id="vec_id", corpus_vec="embedding"
    )


def _rows(df):
    return sorted(
        (r["query_id"], r["neighbor_id"], r["rank"]) for r in df.collect()
    )


def test_tombstoned_fullprobe_equals_exact_over_remaining(spark):
    corpus = _corpus(spark)
    idx = NSWGraphIndex.build(
        corpus, vec_col="embedding", id_col="vec_id", nlist=2, m=4,
        ef_construction=32,
    )
    dead = {3, 12, 30, 41}
    got = idx.delete(dead).search(
        _queries(corpus), k=5, nprobe=2, ef_search=1_000_000
    )
    want = _exact_topk(corpus, _queries(corpus), 5, dead)
    assert _rows(got) == _rows(want)
    # deleted ids never appear
    assert not any(n in dead for _, n, _r in _rows(got))


def test_compaction_rebuilds_only_affected_shards(spark):
    corpus = _corpus(spark)
    idx = NSWGraphIndex.build(
        corpus, vec_col="embedding", id_col="vec_id", nlist=3, m=4,
        ef_construction=32,
    )
    g = idx.graph.persist()
    g.count()
    # pick one victim id; its shard is the only one allowed to change
    victim = 7
    victim_shard = g.filter(F.col("vec_id") == victim).select("shard").collect()[0][0]
    compacted = idx.delete([victim]).compact_deletes(m=4, ef_construction=32)
    assert compacted.tombstones == frozenset()
    # victim gone
    assert compacted.graph.filter(F.col("vec_id") == victim).count() == 0
    # untouched shards byte-identical (same ids, positions, neighbors)
    keep_before = sorted(
        map(tuple, g.filter(F.col("shard") != victim_shard)
            .select("shard", "pos", "vec_id").collect())
    )
    keep_after = sorted(
        map(tuple, compacted.graph.filter(F.col("shard") != victim_shard)
            .select("shard", "pos", "vec_id").collect())
    )
    assert keep_before == keep_after
    g.unpersist()


def test_tombstones_survive_write_load_and_append(spark):
    corpus = _corpus(spark)
    idx = NSWGraphIndex.build(
        corpus, vec_col="embedding", id_col="vec_id", nlist=2, m=4,
        ef_construction=32,
    ).delete([5, 9])
    path = os.path.join(tempfile.mkdtemp(prefix="cbs_tomb_"), "nsw")
    idx.write(path)
    loaded = NSWGraphIndex.load(spark, path, vec_col="embedding", id_col="vec_id")
    assert loaded.tombstones == frozenset({5, 9})
    grown = loaded.append(_corpus(spark, n=10, shift=1000), m=4, ef_construction=32)
    assert grown.tombstones == frozenset({5, 9})
    got = grown.search(_queries(corpus), k=5, nprobe=2, ef_search=1_000_000)
    assert not any(n in (5, 9) for _, n, _r in _rows(got))


def test_delete_is_idempotent_and_absent_ids_are_noops(spark):
    corpus = _corpus(spark, n=20)
    idx = NSWGraphIndex.build(
        corpus, vec_col="embedding", id_col="vec_id", nlist=1, m=4,
        ef_construction=32,
    )
    a = idx.delete([1, 999_999]).delete([1])
    assert a.tombstones == frozenset({1, 999_999})
    # compacting with an absent-only leftover id still clears the set
    c = a.compact_deletes(m=4, ef_construction=32)
    assert c.tombstones == frozenset()
    assert c.graph.filter(F.col("vec_id") == 1).count() == 0
