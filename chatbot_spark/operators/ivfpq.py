"""IVF-PQ ANN — the composed 100 TB index (SURVEY §2.I I6 family).

operators/ann.py::IVFIndex prunes WHICH rows a search scans (nprobe/nlist
cells); operators/pq.py::PQIndex compresses WHAT each scanned row costs
(m uint8 codes instead of 4·d bytes). IVF-PQ is their composition — the
FAISS ``IVFx,PQy`` recipe (Jégou et al., TPAMI 2011) re-expressed
set-at-a-time:

 * fit: coarse k-means centroids on a bounded driver sample, then PQ
   codebooks fit on the sample's RESIDUALS (x − centroid). Residual
   encoding is what makes the composition better than either part: after
   subtracting the cell center, the residual distribution is tighter, so
   the same ksub spends its codes on finer structure.
 * encode: ONE Arrow-batched pass per corpus row — assign cell (BLAS
   argmin vs the broadcast centroid matrix), subtract its center, PQ-code
   the residual. Stored row: (id, centroid_id, m-byte code).
 * search: the query batch is collected once, routed to its nprobe
   cells driver-side, and broadcast; per (query, probed cell) an
   (m, ksub) ADC lookup table is built IN the kernel from the query's
   OWN residual against that cell (q − c), exact because
   ||q − x||² = ||(q−c) − (x−c)||²; ONE mapInPandas over the code table
   filtered to probed cells — partition pruning on a written index —
   with partial top-k inside the kernel. Nothing row-count-sized ever
   shuffles; one Spark job per search regardless of query count.
 * optional exact re-rank of the top-R shortlist against the raw vectors
   (equi-join by id, R·Q rows) — restores recall lost to quantization.

Determinism: seeded fits, argmin ties to the lowest index, ADC folds in
fixed subspace order, rankings tie-break on neighbor id — the same
contract as ann.py/pq.py, so the full-probe + zero-error configurations
are bit-reproducible against the exact scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from chatbot_spark.functions.vector import sq_l2_distance
from chatbot_spark.operators.ann import _numpy_kmeans
from chatbot_spark.operators.pq import _fit_codebooks


def _encode_cell_and_code(vec_col, centers, books):
    """One Arrow pass: vector → (centroid_id, residual pq code). The
    centroid matrix and codebook tensor ride the closure (both tiny)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    c = np.ascontiguousarray(centers, dtype=np.float64)
    c2 = (c**2).sum(axis=1)
    b = np.ascontiguousarray(books, dtype=np.float64)
    m, ksub, dsub = b.shape
    b2 = (b**2).sum(axis=2)

    schema = T.StructType(
        [
            T.StructField("centroid_id", T.IntegerType()),
            T.StructField("pq_code", T.BinaryType()),
        ]
    )

    def one_batch(s):
        if len(s) == 0:
            return pd.DataFrame({"centroid_id": pd.Series([], dtype="int32"),
                                 "pq_code": pd.Series([], dtype=object)})
        X = np.array(list(s), dtype=np.float64)
        cell = (X @ c.T * -2 + c2[None, :]).argmin(axis=1)
        R = X - c[cell]
        codes = np.empty((X.shape[0], m), dtype=np.uint8)
        for j in range(m):
            Rj = R[:, j * dsub : (j + 1) * dsub]
            codes[:, j] = (Rj @ b[j].T * -2 + b2[j][None, :]).argmin(axis=1)
        return pd.DataFrame(
            {"centroid_id": cell.astype("int32"), "pq_code": [x.tobytes() for x in codes]}
        )

    one_batch.__annotations__ = {"s": pd.Series, "return": pd.DataFrame}
    return pandas_udf(schema)(one_batch)(vec_col)


class IVFPQIndex:
    """Coarse cells + residual PQ codes: (id, centroid_id, pq_code)."""

    def __init__(self, centers, books, encoded: DataFrame, vec_col: str, id_col: str):
        self.centers = centers      # numpy (nlist, d)
        self.books = books          # numpy (m, ksub, dsub) — residual codebooks
        self.encoded = encoded      # (id_col, centroid_id, pq_code)
        self.vec_col = vec_col
        self.id_col = id_col
        self._live_broadcasts: list = []

    def delete(self, ids) -> "IVFPQIndex":
        """Delete vectors by id (see IVFIndex.delete — same filter
        semantics on the encoded-codes table; codebooks untouched)."""
        keep = self.encoded.filter(
            ~F.col(self.id_col).isin([int(i) for i in ids])
        )
        out = IVFPQIndex(self.centers, self.books, keep, self.vec_col, self.id_col)
        return out

    def release(self) -> None:
        """Free past broadcast-path query batches (see NSWGraphIndex.release)."""
        for bc in self._live_broadcasts:
            try:
                bc.unpersist(blocking=False)
            except Exception:
                pass
        self._live_broadcasts.clear()

    @classmethod
    def build(
        cls,
        corpus: DataFrame,
        vec_col: str = "embedding",
        id_col: str = "id",
        nlist: int = 8,
        m: int = 8,
        ksub: int = 256,
        fit_sample_size: int = 100_000,
        seed: int = 42,
        max_iter: int = 25,
    ) -> "IVFPQIndex":
        """Driver-sample fit (FAISS training contract: density shape only),
        distributed encode in ONE narrow Arrow pass — no shuffle at all."""
        import numpy as np

        if not 0 < ksub <= 256:
            raise ValueError("ksub must fit a uint8 code (1..256)")
        from chatbot_spark.operators.ann import _sample_matrix

        X = _sample_matrix(corpus, vec_col, fit_sample_size)
        centers = _numpy_kmeans(X, min(nlist, len(X)), seed, max_iter)
        assign = (X @ centers.T * -2 + (centers**2).sum(axis=1)[None, :]).argmin(axis=1)
        books = _fit_codebooks(X - centers[assign], m, ksub, seed, max_iter)
        enc = corpus.select(
            F.col(id_col),
            _encode_cell_and_code(F.col(vec_col), centers, books).alias("__cc"),
        ).select(id_col, F.col("__cc.centroid_id").alias("centroid_id"),
                 F.col("__cc.pq_code").alias("pq_code"))
        return cls(centers, books, enc, vec_col, id_col)

    def write(self, path: str) -> None:
        """Codes clustered by cell (search scans only probed cells' files —
        parquet partition pruning), centroids + codebooks as tiny portable
        parquet (no pickle)."""
        self.encoded.write.mode("overwrite").partitionBy("centroid_id").parquet(
            f"{path}/codes"
        )
        # centroids + codebooks are driver-resident by construction —
        # driver-side parquet writes, no Spark jobs (io/smallio)
        import pyarrow as pa

        from chatbot_spark.io.smallio import write_small_parquet

        spark = self.encoded.sparkSession
        write_small_parquet(
            spark,
            f"{path}/centroids",
            pa.table(
                {
                    "centroid_id": pa.array(range(len(self.centers)), pa.int32()),
                    "centroid": pa.array(
                        [[float(x) for x in c] for c in self.centers],
                        pa.list_(pa.float64()),
                    ),
                }
            ),
        )
        mm, ksub, _ = self.books.shape
        write_small_parquet(
            spark,
            f"{path}/books",
            pa.table(
                {
                    "subspace": pa.array(
                        [j for j in range(mm) for _ in range(ksub)], pa.int32()
                    ),
                    "code": pa.array(list(range(ksub)) * mm, pa.int32()),
                    "center": pa.array(
                        [
                            [float(x) for x in self.books[j, c]]
                            for j in range(mm)
                            for c in range(ksub)
                        ],
                        pa.list_(pa.float64()),
                    ),
                }
            ),
        )

    @classmethod
    def load(
        cls, spark, path: str, vec_col: str = "embedding", id_col: str = "id"
    ) -> "IVFPQIndex":
        import numpy as np

        from chatbot_spark.io.smallio import read_small_arrow

        ctbl = read_small_arrow(spark, f"{path}/centroids")
        crows = (
            ctbl.to_pylist()
            if ctbl is not None  # local: driver-side reads, no Spark jobs
            else [
                r.asDict()
                for r in spark.read.parquet(f"{path}/centroids").collect()
            ]
        )
        centers = np.empty((len(crows), len(crows[0]["centroid"])), dtype=np.float64)
        for r in crows:
            centers[r["centroid_id"]] = r["centroid"]
        btbl = read_small_arrow(spark, f"{path}/books")
        brows = (
            btbl.to_pylist()
            if btbl is not None
            else [
                r.asDict() for r in spark.read.parquet(f"{path}/books").collect()
            ]
        )
        m = max(r["subspace"] for r in brows) + 1
        ksub = max(r["code"] for r in brows) + 1
        books = np.empty((m, ksub, len(brows[0]["center"])), dtype=np.float64)
        for r in brows:
            books[r["subspace"], r["code"]] = r["center"]
        return cls(centers, books, spark.read.parquet(f"{path}/codes"), vec_col, id_col)

    def search(
        self,
        queries: DataFrame,
        k: int = 10,
        nprobe: int = 8,
        rerank: int = 0,
        corpus: DataFrame | None = None,
        query_id: str = "query_id",
        query_vec: str = "query_embedding",
        query_chunk: int = 2048,
        route: str = "broadcast",
    ) -> DataFrame:
        """ADC top-k over nprobe cells. LUTs are per (query, probed cell)
        — built from the query's residual against that cell, so the ADC
        distance is exactly ||q − x||² up to quantization of x alone.

        Distribution contract, two routing modes:

        * ``route="broadcast"`` (default): the query batch is collected
          ONCE, routed to its nprobe cells driver-side (Q × nlist BLAS),
          and broadcast with the cell→queries routing map; ONE
          mapInPandas over the code table — statically pruned to the
          probed cells, PartitionFilters on a written index — serves the
          whole batch. DRIVER MEMORY IS O(Q × d) (collect + broadcast
          hold the full batch); use for bounded batches up to ~100k
          queries and free with ``release()``.
        * ``route="join"`` (unbounded query sets): queries never touch
          the driver — distributed crossJoin vs the broadcast centroid
          table routes each query to its nprobe cells, then a cogrouped
          applyInPandas pairs each cell's codes with its routed queries
          (one extra shuffle of the routed queries, keyed by cell).

        ``query_chunk`` bounds EXECUTOR memory in both modes: each cell
        processes its routed queries in chunks, holding one (C, m, ksub)
        residual-LUT tensor at a time with the gather vectorized across
        the chunk. LUTs are recomputed per task rather than shipped —
        keeps task closures O(books), not O(queries × books)."""
        import numpy as np

        c = self.centers
        b = self.books
        m, ksub, dsub = b.shape
        nprobe = min(nprobe, len(c))
        id_field = self.encoded.schema[self.id_col]
        qid_field = queries.schema[query_id]
        out_schema = (
            f"{query_id} {qid_field.dataType.simpleString()}, "
            f"neighbor_id {id_field.dataType.simpleString()}, adist DOUBLE"
        )
        id_col = self.id_col
        kk = max(k, rerank)
        chunk = max(1, int(query_chunk))

        def adc_cell(grp, Q, qis, qid_values, cell: int):
            """ADC partial top-kk for one cell's codes × its routed
            queries (qis indexes into Q / qid_values). Returns a list of
            result frames."""
            import pandas as pd

            codes = np.frombuffer(
                b"".join(grp["pq_code"].tolist()), dtype=np.uint8
            ).reshape(len(grp), m)
            ids = grp[id_col].to_numpy()
            n = len(ids)
            take = min(kk, n)
            cc = c[cell]
            b2 = [(b[j] ** 2).sum(axis=1) for j in range(m)]
            out = []
            for lo in range(0, len(qis), chunk):
                qc = qis[lo : lo + chunk]
                nc = len(qc)
                # per-query dgemv LUT build (NOT a batched GEMM):
                # BLAS fold order must not depend on chunk size, or
                # chunk-invariance breaks by ULPs
                luts = np.empty((nc, m, ksub), dtype=np.float64)
                for ci in range(nc):
                    rq = Q[qc[ci]] - cc
                    for j in range(m):
                        rj = rq[j * dsub : (j + 1) * dsub]
                        luts[ci, j] = (rj**2).sum() - 2 * b[j] @ rj + b2[j]
                dist = np.zeros((nc, n), dtype=np.float64)
                for j in range(m):
                    dist += luts[:, j, :][:, codes[:, j]]
                np.maximum(dist, 0.0, out=dist)
                part = np.argpartition(dist, take - 1, axis=1)[:, :take]
                qidx = np.repeat(qc, take)
                out.append(
                    pd.DataFrame(
                        {
                            query_id: [qid_values[i] for i in qidx],
                            "neighbor_id": ids[part.ravel()],
                            "adist": np.take_along_axis(dist, part, axis=1).ravel(),
                        }
                    )
                )
            return out

        if route == "join":
            from chatbot_spark.operators.ann import _probe_cells

            routed = (
                queries.select(
                    F.col(query_id).alias("__qid"), F.col(query_vec).alias("__qvec")
                )
                .withColumn(
                    "__cells", _probe_cells(F.col("__qvec"), c, nprobe)
                )
                .select(
                    F.explode("__cells").alias("centroid_id"), "__qid", "__qvec"
                )
            )
            probed = [r[0] for r in routed.select("centroid_id").distinct().collect()]
            if not probed:
                raise ValueError("empty query set")
            src = self.encoded.filter(F.col("centroid_id").isin(probed))

            def cogroup_kernel(qdf, cdf):
                import pandas as pd

                if qdf.empty or cdf.empty:
                    return pd.DataFrame({query_id: [], "neighbor_id": [], "adist": []})
                Q = np.array(list(qdf["__qvec"]), dtype=np.float64)
                qid_values = qdf["__qid"].tolist()
                cell = int(cdf["centroid_id"].iloc[0])
                frames = adc_cell(
                    cdf, Q, np.arange(len(qid_values)), qid_values, cell
                )
                allc = pd.concat(frames, ignore_index=True)
                allc = allc.sort_values(["adist", "neighbor_id"], kind="mergesort")
                return allc.groupby(query_id, sort=False).head(kk)

            cands = (
                routed.groupBy("centroid_id")
                .cogroup(src.groupBy("centroid_id"))
                .applyInPandas(cogroup_kernel, out_schema)
            )
        elif route == "broadcast":
            rows = queries.select(query_id, query_vec).collect()
            if not rows:
                raise ValueError("empty query set")
            qids_all = [r[0] for r in rows]
            Q_all = np.array([r[1] for r in rows], dtype=np.float64)
            # per-query probed cells (tiny: Q × nlist on the driver)
            cd = (
                (Q_all**2).sum(axis=1)[:, None]
                - 2 * Q_all @ c.T
                + (c**2).sum(axis=1)[None, :]
            )
            probe = np.argsort(cd, axis=1, kind="stable")[:, :nprobe]  # (Q, nprobe)
            cell2q: dict[int, "np.ndarray"] = {}
            for cell in np.unique(probe):
                qi = np.unique(np.nonzero(probe == cell)[0])
                cell2q[int(cell)] = qi
            bc = queries.sparkSession.sparkContext.broadcast(
                (qids_all, Q_all, cell2q)
            )
            self._live_broadcasts.append(bc)

            probed_cells = sorted(cell2q)
            # static cell pruning — PartitionFilters on a written index
            cands_src = self.encoded.filter(F.col("centroid_id").isin(probed_cells))

            def adc_partition(batches):
                import pandas as pd

                qids, Q, routing = bc.value
                best: list[pd.DataFrame] = []
                for pdf in batches:
                    if pdf.empty:
                        continue
                    for cell, grp in pdf.groupby("centroid_id", sort=False):
                        qis = routing.get(int(cell))
                        if qis is None:
                            continue
                        best.extend(adc_cell(grp, Q, qis, qids, int(cell)))
                if not best:
                    return
                allc = pd.concat(best, ignore_index=True)
                allc = allc.sort_values(["adist", "neighbor_id"], kind="mergesort")
                yield allc.groupby(query_id, sort=False).head(kk)

            cands = cands_src.mapInPandas(adc_partition, schema=out_schema)
        else:
            raise ValueError(f"unknown route {route!r}; have ['broadcast', 'join']")
        w = Window.partitionBy(query_id).orderBy(
            F.col("adist").asc(), F.col("neighbor_id").asc()
        )
        if not rerank:
            return (
                cands.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k)
                .withColumn("dist", F.sqrt("adist"))
                .drop("adist")
            )
        if corpus is None:
            raise ValueError("rerank requires the raw-vector corpus")
        top_r = (
            cands.withColumn("__arank", F.row_number().over(w))
            .filter(F.col("__arank") <= rerank)
            .drop("__arank", "adist")
        )
        q = queries.select(F.col(query_id), F.col(query_vec).alias("__qvec"))
        # route='join' promises no query data on the driver — the rerank
        # join must not broadcast q (that collects all Q vectors); Catalyst
        # shuffle-joins on query_id instead
        q_side = F.broadcast(q) if route == "broadcast" else q
        exact = (
            top_r.join(
                corpus.select(
                    F.col(self.id_col).alias("neighbor_id"),
                    F.col(self.vec_col).alias("__cvec"),
                ),
                "neighbor_id",
            )
            .join(q_side, query_id)
            .withColumn("__rdist", sq_l2_distance(F.col("__qvec"), F.col("__cvec")))
        )
        w2 = Window.partitionBy(query_id).orderBy(
            F.col("__rdist").asc(), F.col("neighbor_id").asc()
        )
        return (
            exact.withColumn("rank", F.row_number().over(w2))
            .filter(F.col("rank") <= k)
            .withColumn("dist", F.sqrt("__rdist"))
            .select(query_id, "neighbor_id", "rank", "dist")
        )
