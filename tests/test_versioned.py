"""io/versioned.py — the shared versioned-commit protocol (round-9
verdict item 3): crash-replay idempotence for the graphcrud store (the
round-9 ADVICE double-fold), copy-on-write versioned component
snapshots, and the shared vacuum matrix across all four stores."""

import os

import pytest
from pyspark.sql import functions as F


def _fold_batches(spark, state, batches, start=0):
    from chatbot_spark.streaming.graphcrud import edge_crud_writer

    fold = edge_crud_writer(state)
    for i, rows in enumerate(batches, start=start):
        fold(spark.createDataFrame(rows, "op string, src long, dst long"), i)
    return fold


def _labels(spark, state):
    from chatbot_spark.streaming.graphcrud import read_latest_version

    return {
        r["node"]: r["component"]
        for r in read_latest_version(
            spark, state, "labels", "node long, component long"
        ).collect()
    }


def test_graphcrud_replay_after_commit_is_noop(spark, tmp_path):
    """Crash window 2 (ADVICE medium): batch b committed, checkpoint
    lost, batch b REPLAYED — the old max-version read folded the delta
    twice; the pointer protocol must short-circuit instead."""
    state = str(tmp_path / "s")
    adds = [("add", 0, 1), ("add", 2, 3)]
    churn = [("del", 0, 1), ("add", 1, 2)]
    fold = _fold_batches(spark, state, [adds, churn])
    want = _labels(spark, state)
    # replay batch 1 (same id, same data) — must not re-fold
    fold(spark.createDataFrame(churn, "op string, src long, dst long"), 1)
    assert _labels(spark, state) == want
    # the del/add already netted: a double-fold would have driven the
    # (0,1) count to -2 / (1,2) to +2 and survived a later single del
    from chatbot_spark.streaming.graphcrud import read_latest_version

    counts = {
        (r["src"], r["dst"]): r["cnt"]
        for r in read_latest_version(
            spark, state, "counts", "src long, dst long, cnt long"
        ).collect()
    }
    assert counts == {(2, 3): 1, (1, 2): 1}


def test_graphcrud_replay_before_commit_rederives(spark, tmp_path):
    """Crash window 1: v{b} fully written but CURRENT never repointed
    (crash between write and commit). The replay must re-derive v{b}
    from v{b-1} — reading prev via the pointer, never via max-dir."""
    from chatbot_spark.io import versioned

    state = str(tmp_path / "s")
    adds = [("add", 0, 1), ("add", 2, 3)]
    churn = [("del", 0, 1), ("add", 1, 2)]
    fold = _fold_batches(spark, state, [adds, churn])
    want = _labels(spark, state)
    # simulate the crash: repoint CURRENT back to v0 (v1 is now an
    # orphaned, fully-written version dir — exactly the crash image)
    versioned.commit(state, "v0")
    fold(spark.createDataFrame(churn, "op string, src long, dst long"), 1)
    assert versioned.current_version(state) == "v1"
    assert _labels(spark, state) == want


def test_graphcrud_ignores_stray_dirs(spark, tmp_path):
    """ADVICE low: a stray non-numeric 'v'-entry (temp dir) used to
    ValueError the stream; pointer-only resolution never lists dirs."""
    state = str(tmp_path / "s")
    os.makedirs(os.path.join(state, "v_tmp"))
    _fold_batches(spark, state, [[("add", 0, 1)]])
    assert _labels(spark, state) == {0: 0, 1: 0}


def test_graphcrud_vacuum_retains_keep(spark, tmp_path):
    state = str(tmp_path / "s")
    _fold_batches(
        spark,
        state,
        [[("add", 0, 1)], [("add", 1, 2)], [("add", 2, 3)], [("add", 3, 4)]],
    )
    vers = sorted(d for d in os.listdir(state) if d.startswith("v"))
    assert vers == ["v2", "v3"]  # keep_versions=2 default
    assert _labels(spark, state) == {i: 0 for i in range(5)}


def _mk_edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_components_versioned_cow_refresh(spark, tmp_path):
    """apply_component_delta_versioned: new commit equals the logical
    merge, the previous commit stays readable & byte-identical (time
    travel), and untouched bucket FILES are shared by hardlink (same
    inode) — the O(delta) commit claim, checked at the filesystem."""
    from chatbot_spark.io import versioned
    from chatbot_spark.operators.components import (
        apply_component_delta_versioned,
        commit_components_snapshot,
    )

    state = str(tmp_path / "cc")
    # many small components so most buckets are untouched by the delta
    edges = _mk_edges(spark, [(i, i + 1000) for i in range(200)])
    assert commit_components_snapshot(edges, state, rounds=4) == "v0"
    prev = {
        r["node"]: r["component"]
        for r in spark.read.parquet(f"{state}/v0/labels_by_node").collect()
    }
    delta = spark.createDataFrame(
        [(7, 3), (1007, 3)], "node long, component long"
    )
    vname = apply_component_delta_versioned(
        spark, state, delta, keep_versions=10
    )
    assert vname == "v1" and versioned.current_version(state) == "v1"
    cur = {
        r["node"]: r["component"]
        for r in spark.read.parquet(f"{state}/v1/labels_by_node").collect()
    }
    want = dict(prev)
    want[7] = 3
    want[1007] = 3
    assert cur == want
    # time travel: v0 unchanged
    old = {
        r["node"]: r["component"]
        for r in spark.read.parquet(f"{state}/v0/labels_by_node").collect()
    }
    assert old == prev
    # hardlink sharing: an untouched bucket's parquet files share inodes
    touched = {7 % 64, 1007 % 64, 3 % 64}
    shared = 0
    for b in range(64):
        if b in touched:
            continue
        d0 = f"{state}/v0/labels_by_node/__bucket={b}"
        d1 = f"{state}/v1/labels_by_node/__bucket={b}"
        if not os.path.isdir(d0):
            continue
        for f0 in os.listdir(d0):
            if f0.endswith(".parquet"):
                assert os.stat(os.path.join(d0, f0)).st_ino == os.stat(
                    os.path.join(d1, f0)
                ).st_ino
                shared += 1
    assert shared > 0  # the CoW actually shared something


def test_components_versioned_vacuum(spark, tmp_path):
    from chatbot_spark.operators.components import (
        apply_component_delta_versioned,
        commit_components_snapshot,
    )

    state = str(tmp_path / "cc")
    commit_components_snapshot(
        _mk_edges(spark, [(i, i + 100) for i in range(20)]), state, rounds=3
    )
    for v in range(1, 4):
        apply_component_delta_versioned(
            spark,
            state,
            spark.createDataFrame([(v, 0)], "node long, component long"),
            keep_versions=2,
        )
    vers = sorted(d for d in os.listdir(state) if d != "CURRENT")
    assert vers == ["v2", "v3"]


@pytest.mark.parametrize("keep", [1, 2])
def test_vacuum_matrix_semantics(tmp_path, keep):
    """The shared vacuum contract, store-independent: never the pointer
    target, newest `keep` retained by recency, stray names ignored."""
    from chatbot_spark.io import versioned

    state = str(tmp_path / "s")
    os.makedirs(state)
    import time

    for i in range(4):
        os.makedirs(os.path.join(state, f"v{i}"))
        os.utime(os.path.join(state, f"v{i}"), (i, i))
    os.makedirs(os.path.join(state, "v_tmp"))  # must be ignored
    versioned.commit(state, "v1")  # pointer deliberately NOT the newest
    removed = versioned.vacuum(state, keep=keep)
    left = sorted(
        d for d in os.listdir(state) if d not in ("CURRENT", "v_tmp")
    )
    assert "v1" in left  # pointer target survives any keep
    if keep == 2:
        assert left == ["v1", "v2", "v3"] and removed == ["v0"]
    else:
        assert left == ["v1", "v3"] and sorted(removed) == ["v0", "v2"]
    del time


def test_link_tree_skips_and_links(tmp_path):
    from chatbot_spark.io import versioned

    src = tmp_path / "src"
    (src / "a").mkdir(parents=True)
    (src / "b").mkdir()
    (src / "a" / "f1").write_text("x")
    (src / "b" / "f2").write_text("y")
    (src / "top").write_text("z")
    dst = tmp_path / "dst"
    n = versioned.link_tree(str(src), str(dst), skip={"b"})
    assert n == 2
    assert (dst / "a" / "f1").read_text() == "x"
    assert not (dst / "b").exists()
    assert os.stat(src / "a" / "f1").st_ino == os.stat(dst / "a" / "f1").st_ino


def test_graphcrud_refuses_pre_r10_layout(spark, tmp_path):
    """An old-layout store (counts/v{n} + labels/v{n}, no CURRENT) read
    as empty would silently discard every folded count while the stream
    checkpoint skips the consumed events — must refuse with a migration
    hint instead (review finding r10)."""
    import os

    import pytest as _pytest

    from chatbot_spark.streaming.graphcrud import read_latest_version

    state = str(tmp_path / "legacy")
    os.makedirs(os.path.join(state, "counts", "v0"))
    with _pytest.raises(RuntimeError, match="pre-r10 layout"):
        read_latest_version(spark, state, "counts", "src long, dst long")


def test_index_meta_unreadable_raises_not_l2(spark, tmp_path):
    """meta/ EXISTS but is unreadable: loading must raise, never default
    to l2 — a cosine index silently degraded to l2 ranks raw queries
    against unit-normalized stored vectors with no error anywhere
    (review finding r10). Absent meta/ (pre-metric layout) still loads
    as l2."""
    import os
    import shutil

    import numpy as np
    import pytest as _pytest

    from chatbot_spark.operators.ann import IVFIndex

    rng = np.random.default_rng(3)
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in rng.standard_normal(4)]) for i in range(50)],
        "id long, embedding array<double>",
    )
    path = str(tmp_path / "ivf")
    IVFIndex.build(df, vec_col="embedding", id_col="id", nlist=2,
                   metric="cosine").write(path)
    # corrupt meta/: parquet dir replaced by a garbage file
    shutil.rmtree(os.path.join(path, "meta"))
    os.makedirs(os.path.join(path, "meta"))
    with open(os.path.join(path, "meta", "part-00000.parquet"), "w") as f:
        f.write("not parquet")
    with _pytest.raises(Exception):
        IVFIndex.load(spark, path)
    # absent meta/ = pre-metric layout -> l2 default, no raise
    shutil.rmtree(os.path.join(path, "meta"))
    assert IVFIndex.load(spark, path).metric == "l2"
