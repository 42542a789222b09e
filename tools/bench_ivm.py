"""Delta-join IVM scale point: per-refresh cost of the maintained view
(operators/ivm.py::delta_join_view's per-batch terms) vs rebuilding the
join from scratch. Orders are the 10x sf1 replication re-replicated 16x
(~24M rows) against the 150k-customer dimension; both sides arrive in 8
uniform key-sliced batches. The claim under test: a delta refresh costs
O(|delta| + matched base keys) while the rebuild re-joins EVERYTHING
accumulated so far — so rebuild time grows with the batch index while
the delta refresh stays ~flat. At 1000 executors this shape decides
whether a view refresh is a minutes job or an hours job.

Usage: PYTHONPATH=/root/repo python tools/bench_ivm.py
Writes BENCH_IVM.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
SF1_DIR = "/tmp/cbs_sf1"
N_BATCHES = 8
REPLICAS = 16
SHIFT = 1_000_000_000


def main() -> int:
    from pyspark.sql import functions as F

    from chatbot_spark.session import get_spark

    spark = get_spark(
        "bench-ivm", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from bench_sf1 import make_sf1

    make_sf1(spark)
    base_o = spark.read.parquet(os.path.join(SF1_DIR, "orders.parquet")).select(
        "o_orderkey", "o_custkey"
    )
    o = None
    for i in range(REPLICAS):  # ~6M fact rows; keys shifted, custkey kept
        c = base_o.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(i * SHIFT))
        o = c if o is None else o.unionByName(c)
    o = o.persist()
    c = spark.read.parquet(os.path.join(SF1_DIR, "customer.parquet")).select(
        "c_custkey", "c_mktsegment"
    ).persist()
    n_orders, n_customers = o.count(), c.count()  # also warms the caches

    o_slices = [
        o.filter(F.col("o_orderkey") % N_BATCHES == t).select(
            F.col("o_custkey").alias("custkey"), "o_orderkey"
        )
        for t in range(N_BATCHES)
    ]
    # the realistic arrival shape: the dimension loads across the FIRST
    # TWO batches (both-side delta terms exercised), then only facts keep
    # arriving — so from batch 2 on the delta refresh is ΔO_t ⋈ C, a
    # ~constant-size job, while the rebuild re-joins everything
    cd = c.select(F.col("c_custkey").alias("custkey"), "c_mktsegment")
    c_empty = cd.filter(F.lit(False))
    c_slices = [
        cd.filter(F.col("custkey") % 2 == 0),
        cd.filter(F.col("custkey") % 2 == 1),
    ] + [c_empty] * (N_BATCHES - 2)

    def timed_count(df) -> tuple[float, int]:
        t0 = time.monotonic()
        n = df.count()
        return time.monotonic() - t0, n

    delta_sec, full_sec, delta_rows, full_rows = [], [], [], []
    l_prev = r_prev = None
    for t in range(N_BATCHES):
        dl, dr = o_slices[t], c_slices[t]
        terms = []
        if t > 0:
            terms.append(dl.join(r_prev, "custkey"))
            terms.append(l_prev.join(dr, "custkey"))
        terms.append(dl.join(dr, "custkey"))
        delta = terms[0]
        for x in terms[1:]:
            delta = delta.unionByName(x)
        s, n = timed_count(delta)
        delta_sec.append(round(s, 3))
        delta_rows.append(n)

        l_prev = dl if l_prev is None else l_prev.unionByName(dl)
        r_prev = dr if r_prev is None else r_prev.unionByName(dr)
        s, n = timed_count(l_prev.join(r_prev, "custkey"))
        full_sec.append(round(s, 3))
        full_rows.append(n)

    assert sum(delta_rows) == full_rows[-1], "delta tiling must cover the full join"
    rec = {
        "n_orders": n_orders,
        "n_customers": n_customers,
        "n_batches": N_BATCHES,
        "delta_refresh_sec": delta_sec,
        "full_rebuild_sec": full_sec,
        "delta_rows_per_batch": delta_rows,
        "view_rows_cumulative": full_rows,
        "tiling_exact": True,
    }
    with open(os.path.join(REPO, "BENCH_IVM.json"), "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec, separators=(",", ":")))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
