"""Driver-side parquet IO for METADATA-SIZED index tables (r13, guide
§1.2 per-task work / §5 "the driver should do almost no data work" —
inverted: these tables do almost no DATA work, so Spark should do no
JOB work for them).

Every ANN index family persists, next to its data-sized table (cells /
graph / codes), a handful of driver-resident side tables: centroids
(bounded by nlist — they exist because a driver-side numpy fit produced
them), codebooks (m x ksub rows), scalar-quantizer bounds (1 row), the
metric/m2 meta row, tombstone id sets. A Spark parquet write JOB has a
~0.5-0.7 s floor regardless of payload (committer setup, task launch,
rename protocol), and a read-back costs a scan job plus footer
inference — measured ~1.4-2 s of pure scheduling per index write+load
at any scale, since these tables never grow with the corpus. Writing
and reading them DRIVER-SIDE via pyarrow is ~2 ms and is exactly as
portable: the on-disk artifact is a standard parquet part file plus the
same empty ``_SUCCESS`` marker Spark's committer leaves (the marker is
load-bearing: plans/retrieve._index_content_stamp fingerprints it).

Scope guard: these helpers are for tables whose size is bounded by
CONSTRUCTION (nlist, m x ksub, |tombstones|), never for corpus-sized
data — the data tables keep the distributed write/scan. Non-local
paths (object stores, hdfs) fall back to the Spark writer/reader, so
cluster deployments behave exactly as before.
"""

from __future__ import annotations

import os
import re
import shutil
import uuid

__all__ = [
    "is_local_path",
    "write_small_parquet",
    "read_small_arrow",
    "read_small_df",
]


def is_local_path(path: str) -> bool:
    """True when ``path`` addresses the local filesystem (no scheme, or
    an explicit file: scheme) — the only case the pyarrow fast path
    handles; everything else takes the Spark fallback.

    Allowlist, not blocklist (r13 ADVICE): any URI scheme other than
    file: — including single-slash forms like ``dbfs:/x`` or
    ``alluxio:/x`` — goes through Spark, so index side tables can never
    silently land on the driver's local disk while the data tables go
    through the Hadoop FS. A Windows drive letter (``C:\\x``) is not a
    scheme; RFC 3986 schemes are >= 2 chars here, which keeps those
    local."""
    m = re.match(r"^([A-Za-z][A-Za-z0-9+.\-]+):", path)
    if m is None:
        return True
    return m.group(1).lower() == "file"


def _strip_scheme(path: str) -> str:
    if path.startswith("file://"):
        return path[len("file://"):]
    if path.startswith("file:"):
        return path[len("file:"):]
    return path


def write_small_parquet(spark, path: str, table) -> None:
    """Overwrite-write a driver-resident ``pyarrow.Table`` as a parquet
    dataset at ``path`` (one part file + ``_SUCCESS``), with zero Spark
    jobs on local paths. Layout-compatible with a Spark write: any
    ``spark.read.parquet(path)`` (or pyarrow read) sees the same data."""
    if not is_local_path(path):
        spark.createDataFrame(table).write.mode("overwrite").parquet(path)
        return
    import pyarrow.parquet as pq

    local = _strip_scheme(path)
    tmp = f"{local}.__smallio_tmp__{uuid.uuid4().hex[:8]}"
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(table, os.path.join(tmp, "part-00000.parquet"))
    with open(os.path.join(tmp, "_SUCCESS"), "w"):
        pass
    # overwrite semantics: build the replacement fully, then swap — a
    # reader never sees a half-written dataset (same contract as the
    # Spark committer's staging-dir rename)
    if os.path.isdir(local):
        shutil.rmtree(local)
    elif os.path.exists(local):
        os.unlink(local)
    os.replace(tmp, local)


def read_small_arrow(spark, path: str):
    """Read a (small) parquet dataset as a ``pyarrow.Table`` without a
    Spark job when the path is local; None when it isn't (caller falls
    back to the Spark reader). Raises like the Spark reader on a missing
    dataset."""
    if not is_local_path(path):
        return None
    import pyarrow.parquet as pq

    local = _strip_scheme(path)
    if not os.path.isdir(local):
        if os.path.isfile(local):
            return pq.read_table(local)
        raise FileNotFoundError(f"[PATH_NOT_FOUND] {path}")
    parts = sorted(
        os.path.join(local, f)
        for f in os.listdir(local)
        if f.endswith(".parquet") and not f.startswith((".", "_"))
    )
    if not parts:
        raise FileNotFoundError(f"[PATH_NOT_FOUND] no parquet parts in {path}")
    import pyarrow as pa

    return pa.concat_tables([pq.read_table(p) for p in parts])


def read_small_df(spark, path: str):
    """(DataFrame, pyarrow.Table | None) for a small parquet dataset:
    local paths come back as a driver-local table (LocalTableScan plan —
    joins against it broadcast trivially, and the arrow table gives the
    caller driver-side values with no collect job); non-local paths fall
    back to the distributed reader with table=None."""
    tbl = read_small_arrow(spark, path)
    if tbl is None:
        return spark.read.parquet(path), None
    return spark.createDataFrame(tbl), tbl
