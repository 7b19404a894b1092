"""Round-start guard: the driver regenerates /root/testdata between rounds
and has changed column types before (round 2: events.ts went from
TIMESTAMP(NANOS)-as-bigint to plain Parquet TIMESTAMP). Every oracle in the
catalog assumes the DuckDB-visible schemas below — if this test fails, the
testdata changed shape and the session confs / oracles must be revisited
BEFORE trusting any parity run.
"""

from __future__ import annotations

import os

import duckdb
import pytest

EXPECTED = {
    "region": [("r_regionkey", "INTEGER"), ("r_name", "VARCHAR")],
    "nation": [
        ("n_nationkey", "INTEGER"),
        ("n_name", "VARCHAR"),
        ("n_regionkey", "INTEGER"),
    ],
    "customer": [
        ("c_custkey", "BIGINT"),
        ("c_name", "VARCHAR"),
        ("c_nationkey", "INTEGER"),
        ("c_acctbal", "DOUBLE"),
        ("c_mktsegment", "VARCHAR"),
    ],
    "supplier": [
        ("s_suppkey", "BIGINT"),
        ("s_name", "VARCHAR"),
        ("s_nationkey", "INTEGER"),
        ("s_acctbal", "DOUBLE"),
    ],
    "part": [
        ("p_partkey", "BIGINT"),
        ("p_name", "VARCHAR"),
        ("p_brand", "VARCHAR"),
        ("p_type", "VARCHAR"),
        ("p_size", "INTEGER"),
        ("p_retailprice", "DOUBLE"),
    ],
    "orders": [
        ("o_orderkey", "BIGINT"),
        ("o_custkey", "BIGINT"),
        ("o_orderstatus", "VARCHAR"),
        ("o_totalprice", "DOUBLE"),
        ("o_orderdate", "TIMESTAMP"),
        ("o_orderpriority", "VARCHAR"),
    ],
    "lineitem": [
        ("l_orderkey", "BIGINT"),
        ("l_partkey", "BIGINT"),
        ("l_suppkey", "BIGINT"),
        ("l_linenumber", "INTEGER"),
        ("l_quantity", "DOUBLE"),
        ("l_extendedprice", "DOUBLE"),
        ("l_discount", "DOUBLE"),
        ("l_tax", "DOUBLE"),
        ("l_returnflag", "VARCHAR"),
        ("l_linestatus", "VARCHAR"),
        ("l_shipdate", "TIMESTAMP"),
    ],
    "events": [
        ("event_id", "BIGINT"),
        ("ts", "TIMESTAMP"),
        ("user_id", "BIGINT"),
        ("event_type", "VARCHAR"),
        ("value", "DOUBLE"),
        ("props", "VARCHAR"),
    ],
    "documents": [
        ("doc_id", "BIGINT"),
        ("text", "VARCHAR"),
        ("lang", "VARCHAR"),
        ("source", "VARCHAR"),
        ("n_chars", "BIGINT"),
    ],
    "embeddings": [
        ("vec_id", "BIGINT"),
        ("embedding", "FLOAT[]"),
        ("label", "INTEGER"),
    ],
}

SF_DIRS = [
    d for d in ("sf0.001", "sf0.01", "sf0.1")
    if os.path.isdir(f"/root/testdata/{d}")
]


@pytest.mark.parametrize("sf", SF_DIRS)
def test_testdata_schemas_match_oracle_assumptions(sf):
    con = duckdb.connect()
    bad = {}
    for table, expected in EXPECTED.items():
        path = f"/root/testdata/{sf}/{table}.parquet"
        got = [
            (c[0], c[1])
            for c in con.execute(f"DESCRIBE SELECT * FROM '{path}'").fetchall()
        ]
        if got != expected:
            bad[table] = {"expected": expected, "got": got}
    assert not bad, f"testdata regenerated with new shapes: {bad}"
