"""File-level Bloom skipping index — the Delta/Iceberg bloom-filter-index
equivalent for the layout-maintenance family (operators/zorder.py,
io/tables.py::compact_parquet).

Min/max file stats (range_layout_pruning) and z-order tiles skip files
for RANGE predicates, but a point lookup on a high-cardinality,
non-clustered column (doc_id, user_id, join keys during CDC backfill)
still touches every file whose [min, max] straddles the key — on a
hash-distributed column that is ALL of them. A per-file Bloom filter
answers "might this file contain value v?" in O(k) bit probes with NO
false negatives, so a point lookup reads only the (few) candidate
files; false positives only cost an extra file read, bounded by the
configured fpp.

Design (scale-first):
 * build: ONE distributed pass — `input_file_name()` + groupBy(file) +
   applyInPandas; each task sizes its file's filter from the file's own
   distinct count (m = ceil(-n·ln(fpp)/ln²2) bits, k = round(m/n·ln2)
   probes) and emits (file, n_rows, n_distinct, nbits, nhashes,
   bits BINARY). The sidecar lives at ``{path}/_bloom_{col}`` —
   metadata-scale: ~1.2 bytes per distinct value at fpp=0.01,
   independent of row width.
 * probe: the lookup values broadcast (point lookups are few by
   definition); a pandas UDF over the SIDECAR (not the data) marks
   candidate files; only matching file names are collected (bounded by
   the file count, not the data). ``read_with_bloom`` then scans just
   those files with the pushed-down isin filter.
 * hashing: double hashing h1 + i·h2 over md5(str(v)) — deterministic
   across engines/hosts (the repo's determinism discipline), no seed,
   so a sidecar built anywhere probes correctly everywhere.

Correctness invariant (the bloom_layout_pruning oracle): the pruned
read ≡ the full-scan filter — Bloom filters have no false negatives, so
file skipping can only drop files that provably lack the keys.

Reference parity note: the reference's store delegates point lookup to
OceanBase primary-key access (src/common/db.py); this is the
shared-nothing batch analog.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_LN2 = math.log(2.0)


def _bloom_params(n_distinct: int, fpp: float) -> tuple[int, int]:
    """(nbits rounded up to whole bytes, nhashes) for n distinct keys at
    the target false-positive rate."""
    n = max(1, n_distinct)
    m = max(8, int(math.ceil(-n * math.log(fpp) / (_LN2 * _LN2))))
    m = ((m + 7) // 8) * 8
    k = max(1, round(m / n * _LN2))
    return m, k


_U64 = (1 << 64) - 1


def _bloom_positions(value, nbits: int, nhashes: int) -> list[int]:
    """Deterministic double-hashing probe positions for one value. The
    stride accumulates MOD 2⁶⁴ (explicit mask) so the scalar probe and
    the vectorized uint64 build land on identical bits."""
    d = hashlib.md5(str(value).encode("utf-8")).digest()
    h1 = int.from_bytes(d[:8], "big")
    h2 = int.from_bytes(d[8:16], "big") | 1  # odd => full-period stride
    return [((h1 + i * h2) & _U64) % nbits for i in range(nhashes)]


def _bloom_fill(values, nbits: int, nhashes: int):
    """Vectorized filter fill: one md5 per value (Python), all position
    arithmetic in numpy uint64 (wrapping ≡ the scalar mod-2⁶⁴ probe).
    Returns the bit array as uint8[nbits/8]."""
    import numpy as np

    bits = np.zeros(nbits // 8, dtype=np.uint8)
    if len(values) == 0:
        return bits
    raw = b"".join(
        hashlib.md5(str(v).encode("utf-8")).digest()[:16] for v in values
    )
    arr = np.frombuffer(raw, dtype=">u8").reshape(-1, 2).astype(np.uint64)
    h1, h2 = arr[:, 0], arr[:, 1] | np.uint64(1)
    i = np.arange(nhashes, dtype=np.uint64)
    with np.errstate(over="ignore"):
        pos = (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(nbits)
    pos = pos.ravel().astype(np.int64)
    np.bitwise_or.at(bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
    return bits


def bloom_sidecar_path(path: str, col: str) -> str:
    return f"{path}/_bloom_{col}"


def build_bloom_index(
    spark: SparkSession, path: str, col: str, fpp: float = 0.01
) -> DataFrame:
    """Build the per-file Bloom sidecar for ``col`` under ``path`` and
    write it to ``_bloom_{col}``. Returns the sidecar DataFrame
    (file, n_rows, n_distinct, nbits, nhashes, bits)."""
    import pandas as pd

    src = (
        spark.read.parquet(path)
        .select(F.col(col).alias("__v"))
        .withColumn("__f", F.input_file_name())
    )

    def build_kernel(pdf):
        f = pdf["__f"].iloc[0]
        vals = pdf["__v"].dropna().unique()
        nbits, k = _bloom_params(len(vals), fpp)
        bits = _bloom_fill(vals, nbits, k)
        return pd.DataFrame(
            {
                "file": [f],
                "n_rows": [len(pdf)],
                "n_distinct": [len(vals)],
                "nbits": [nbits],
                "nhashes": [k],
                "bits": [bits.tobytes()],
            }
        )

    sidecar = src.groupBy("__f").applyInPandas(
        build_kernel,
        "file STRING, n_rows LONG, n_distinct LONG, nbits INT, "
        "nhashes INT, bits BINARY",
    )
    out = bloom_sidecar_path(path, col)
    sidecar.write.mode("overwrite").parquet(out)
    return spark.read.parquet(out)


def prune_files(
    spark: SparkSession, path: str, col: str, values: list
) -> list[str]:
    """Candidate files for a point lookup: probe every file's Bloom with
    the lookup set, distributed over the SIDECAR (metadata-scale — the
    data itself is never touched). No false negatives; false-positive
    files cost one extra read each."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    vals = list(values)
    if not vals:
        return []
    bc = spark.sparkContext.broadcast(vals)

    def probe(bits_s: pd.Series, nbits_s: pd.Series, k_s: pd.Series) -> pd.Series:
        lookup = bc.value
        out = []
        for bits, nbits, k in zip(bits_s, nbits_s, k_s):
            arr = np.frombuffer(bits, dtype=np.uint8)
            hit = False
            for v in lookup:
                if all(
                    arr[p >> 3] & (1 << (p & 7))
                    for p in _bloom_positions(v, int(nbits), int(k))
                ):
                    hit = True
                    break
            out.append(hit)
        return pd.Series(out)

    probe.__annotations__ = {
        "bits_s": pd.Series, "nbits_s": pd.Series, "k_s": pd.Series,
        "return": pd.Series,
    }
    probe_udf = pandas_udf("boolean")(probe)
    sidecar = spark.read.parquet(bloom_sidecar_path(path, col))
    hits = sidecar.filter(
        probe_udf(F.col("bits"), F.col("nbits"), F.col("nhashes"))
    ).select("file")
    files = [r["file"] for r in hits.collect()]
    bc.unpersist(blocking=False)
    return files


def read_with_bloom(
    spark: SparkSession, path: str, col: str, values: list
) -> DataFrame:
    """Point lookup through the Bloom sidecar: scan only candidate files
    with the isin filter pushed down. Result is EXACTLY the full-scan
    filter (no false negatives); an empty candidate set short-circuits
    to an empty frame with the full schema."""
    files = prune_files(spark, path, col, values)
    full = spark.read.parquet(path)
    if not files:
        return full.limit(0)
    return spark.read.parquet(*files).filter(F.col(col).isin(values))
