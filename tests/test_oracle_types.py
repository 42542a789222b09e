"""Oracle output-typing gate (round-5 verdict items 1-2): DuckDB types
sum(BIGINT) as HUGEINT -> arrow decimal128(38,0) while Spark returns
int64, and the driver's value hash is type-sensitive — so an oracle that
exposes a bare integer sum is driver-red even when every value matches.
This cost 3 queries (`top_supplier_revenue`, `nation_revenue_share`,
`big_orders`) two rounds of red. The sweep below probes every oracle's
arrow schema (LIMIT 0, no execution) and fails on any decimal/hugeint
output column, so the class can't recur."""

from __future__ import annotations

import os
import sys

import duckdb
import pyarrow as pa
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_SMOKE = "/root/testdata/sf0.001"

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _arrow_family(t):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from check_parity import arrow_family

    return arrow_family(t)


@pytest.fixture(scope="module")
def oracle_schemas():
    from chatbot_spark.workload import ORACLE_SQL

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'")
    out = {}
    for name, sql in ORACLE_SQL.items():
        out[name] = con.execute(
            f"SELECT * FROM ({sql}) AS __t LIMIT 0"
        ).arrow().schema
    con.close()
    return out


def test_no_oracle_emits_decimal_or_hugeint(oracle_schemas):
    bad = {
        name: [f"{f.name}: {f.type}" for f in schema if pa.types.is_decimal(f.type)]
        for name, schema in oracle_schemas.items()
    }
    bad = {k: v for k, v in bad.items() if v}
    assert not bad, (
        "oracles emitting decimal/hugeint columns (driver hash is "
        f"type-sensitive; CAST the output column to BIGINT): {bad}"
    )


def test_arrow_family_flags_prefix_bug():
    """The exact pre-fix shape must be caught: bare sum(BIGINT) oracle
    column vs Spark int64."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from check_parity import type_mismatches

    con = duckdb.connect()
    duck = con.execute(
        "SELECT * FROM (SELECT sum(CAST(1 AS BIGINT)) AS total) t LIMIT 0"
    ).arrow().schema
    con.close()
    spark = pa.schema([pa.field("total", pa.int64())])
    assert type_mismatches(spark, duck) == [
        "total: spark=int64 duck=decimal(38,0)"
    ]


def test_arrow_family_normalizes_representation_noise():
    """string vs large_string and timestamp unit/tz are representation
    differences, not hash-relevant type differences."""
    from check_parity import type_mismatches

    a = pa.schema(
        [
            pa.field("s", pa.string()),
            pa.field("ts", pa.timestamp("us", tz="UTC")),
            pa.field("v", pa.list_(pa.float32())),
        ]
    )
    b = pa.schema(
        [
            pa.field("s", pa.large_string()),
            pa.field("ts", pa.timestamp("us")),
            pa.field("v", pa.large_list(pa.float32())),
        ]
    )
    assert type_mismatches(a, b) == []
    # but int width differences ARE flagged
    c = pa.schema([pa.field("n", pa.int32())])
    d = pa.schema([pa.field("n", pa.int64())])
    assert type_mismatches(c, d) == ["n: spark=int32 duck=int64"]
