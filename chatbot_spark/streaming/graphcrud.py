"""Streaming CRUD maintenance of a connected-components snapshot under
an out-of-order edge event feed — the z-set completion of the graph
family's streaming contract.

``stream_components`` (workload) folds ADD-only micro-batches: additions
commute, so delivery order never matters there. A real change feed also
carries REMOVALS, and removals do NOT commute with the additions they
revert — a ``del`` delivered before its ``add`` (the classic CDC
out-of-order case) would be dropped as unknown and the edge would
wrongly survive. The fix is the same signed-multiplicity algebra the
retraction-aware rollups use (streaming/stateful.py): the maintained
edge state is a Z-SET — ``(src, dst) -> net count`` where ``add`` is +1
and ``del`` is -1 — and an edge EXISTS iff its net count is positive.
Per batch:

1. fold the batch's signed deltas into the stored count table (one
   keyed outer merge — O(batch + touched keys));
2. edges whose net crossed ``>0 -> <=0`` are the batch's effective
   REMOVALS, ``<=0 -> >0`` its effective ADDITIONS — note a del arriving
   before its add nets to -1 (absent), and the later add nets back to 0
   (still absent): both orders converge to the same state;
3. refresh the label snapshot in the documented exact order — removals
   first via :func:`decremental_components` (affected-slice re-solve),
   then additions via :func:`incremental_components` (contracted
   solve);
4. write counts + labels as version ``v{batch_id}`` (the versioned-
   commit contract: a crash replay rewrites its own version,
   idempotent).

Because the final count table is a pure function of the event MULTISET
(not its batch split or arrival order), the drained snapshot equals
from-scratch CC on the net-positive edge set under ANY delivery order —
the workload oracle pins exactly that equality.

100 TB: the count merge is one keyed exchange over O(batch + touched)
rows; the label refresh costs what its batch delta touches (the
decremental/incremental contracts, including the giant-component
broadcast gate). Nothing ever re-walks the corpus.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["edge_crud_writer", "read_latest_version"]


def _latest_version(root: str) -> int | None:
    if not os.path.isdir(root):
        return None
    vs = [int(d[1:]) for d in os.listdir(root) if d.startswith("v")]
    return max(vs) if vs else None


def read_latest_version(spark, root: str, schema: str) -> DataFrame:
    v = _latest_version(root)
    if v is None:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(os.path.join(root, f"v{v}"))


def edge_crud_writer(
    state_dir: str,
    rounds: int | None = None,
    assert_converged: bool = False,
):
    """foreachBatch writer folding an (op, src, dst) edge event feed —
    ``op`` in {'add', 'del'} — into ``{state_dir}/counts`` and
    ``{state_dir}/labels`` versioned snapshots. See module docstring."""
    from chatbot_spark.operators.components import (
        decremental_components,
        incremental_components,
    )

    counts_root = os.path.join(state_dir, "counts")
    labels_root = os.path.join(state_dir, "labels")

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        prev_counts = read_latest_version(
            spark, counts_root, "src long, dst long, cnt long"
        )
        prev_labels = read_latest_version(
            spark, labels_root, "node long, component long"
        )
        delta = (
            batch_df.select(
                F.col("src").cast("long").alias("src"),
                F.col("dst").cast("long").alias("dst"),
                F.when(F.col("op") == "add", F.lit(1))
                .otherwise(F.lit(-1))
                .cast("long")
                .alias("d"),
            )
            .groupBy("src", "dst")
            .agg(F.sum("d").alias("d"))
        )
        merged = (
            prev_counts.join(delta, ["src", "dst"], "full_outer")
            .select(
                "src",
                "dst",
                F.coalesce("cnt", F.lit(0)).alias("__old"),
                (
                    F.coalesce("cnt", F.lit(0)) + F.coalesce("d", F.lit(0))
                ).alias("cnt"),
            )
            .persist()
        )
        appearing = merged.filter(
            (F.col("__old") <= 0) & (F.col("cnt") > 0)
        ).select("src", "dst")
        disappearing = merged.filter(
            (F.col("__old") > 0) & (F.col("cnt") <= 0)
        ).select("src", "dst")
        # removals first (the documented exact order): the remaining
        # graph G1 = previously-present edges minus the disappearing set
        remaining = merged.filter(
            (F.col("__old") > 0) & (F.col("cnt") > 0)
        ).select("src", "dst")
        if disappearing.isEmpty():
            after_rm = prev_labels
        else:
            after_rm = decremental_components(
                prev_labels, remaining, disappearing,
                rounds=rounds, assert_converged=assert_converged,
            )
        if appearing.isEmpty():
            labels = after_rm
        else:
            labels = incremental_components(
                after_rm, appearing,
                rounds=rounds, assert_converged=assert_converged,
            )
        # keep only live count rows (net != 0 keeps pending negative
        # tombstones so a late add still nets to absent); labels keep
        # every node ever seen (removal never deletes nodes)
        (
            merged.filter(F.col("cnt") != 0)
            .select("src", "dst", "cnt")
            .write.mode("overwrite")
            .parquet(os.path.join(counts_root, f"v{batch_id}"))
        )
        labels.write.mode("overwrite").parquet(
            os.path.join(labels_root, f"v{batch_id}")
        )
        merged.unpersist()

    return fold
