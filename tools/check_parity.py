"""Local stand-in for the driver's t2 gate: run every workload query on
Spark AND its DuckDB oracle at a given sf dir, compare row count, schema
(column names), and order-insensitive values. Usage:

    python tools/check_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb


def normalize(rows: list[tuple]) -> list[tuple]:
    out = []
    for r in rows:
        row = []
        for v in r:
            if isinstance(v, float):
                if math.isnan(v):
                    row.append("NaN")
                else:
                    # collapse -0.0/0.0 and fix float repr
                    row.append(round(v + 0.0, 9))
            else:
                row.append(v)
        out.append(tuple(row))
    return sorted(out, key=repr)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from chatbot_spark.session import get_spark
    from chatbot_spark.workload import ORACLE_SQL, SPARK_QUERIES

    spark = get_spark("parity", master="local[8]", shuffle_partitions=8)

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    failures = []
    for name, fn in SPARK_QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spark_cols = sorted(sdf.columns)
            srows = normalize(
                [tuple(r[c] for c in spark_cols) for r in (row.asDict() for row in sdf.collect())]
            )
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            continue
        if name not in ORACLE_SQL:
            print(f"SKIP  {name}: no oracle ({len(srows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            cur = con.execute(ORACLE_SQL[name])
            duck_cols_raw = [d[0] for d in cur.description]
            order = sorted(range(len(duck_cols_raw)), key=lambda i: duck_cols_raw[i])
            duck_cols = [duck_cols_raw[i] for i in order]
            drows = normalize([tuple(r[i] for i in order) for r in cur.fetchall()])
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error {type(e).__name__}: {e}")
            continue

        status = []
        if spark_cols != duck_cols:
            status.append(f"schema spark={spark_cols} duck={duck_cols}")
        if len(srows) != len(drows):
            status.append(f"rows spark={len(srows)} duck={len(drows)}")
        if not status and srows != drows:
            n_bad = sum(1 for a, b in zip(srows, drows) if a != b)
            ex = next((a, b) for a, b in zip(srows, drows) if a != b)
            status.append(f"values {n_bad}/{len(srows)} differ; first: spark={ex[0]} duck={ex[1]}")
        if status:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(status)}")
        else:
            print(f"OK    {name}  ({len(srows)} rows, {time.time()-t0:.1f}s)")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
