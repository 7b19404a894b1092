"""Local replica of the driver's DuckDB-oracle comparison.

Runs a catalog query on Spark AND its oracle SQL on DuckDB over the same
parquet tables, then compares row count, column names, and an
order-insensitive value fingerprint (columns sorted by name, rows sorted by
their string form, floats compared BIT-EXACTLY — the decimal-exact
aggregation / ascending-fold / mirrored-rounding contracts in
plans/queries.py make both engines agree to the last ulp, and the driver
hashes raw values, so the harness demands the same).
"""

from __future__ import annotations

import math
import os

import duckdb

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(path):  # Spark-written directory layout
            path = os.path.join(path, "*.parquet")
        elif not os.path.exists(path):  # partial dirs (junk fixtures) are fine
            continue
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # BIT-EXACT: the engine's decimal/fold-order/rounding contracts make
        # Spark and DuckDB agree to the last ulp, so the harness demands it
        # (the driver hashes raw values — a rounded compare would hide drift)
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_norm_cell(v[k])}" for k in sorted(v)) + "}"
    return str(v)


def fingerprint(cols: list[str], rows: list[tuple]) -> list[str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = ["|".join(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> dict:
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = spark_df.columns
    rel = con.sql(sql)
    d_cols = [c for c in rel.columns]
    d_rows = rel.fetchall()
    result = {
        "rows_match": len(s_rows) == len(d_rows),
        "cols_match": sorted(s_cols) == sorted(d_cols),
        "spark_rows": len(s_rows),
        "duck_rows": len(d_rows),
        "spark_cols": s_cols,
        "duck_cols": d_cols,
    }
    if result["rows_match"] and result["cols_match"]:
        fs = fingerprint(s_cols, s_rows)
        fd = fingerprint(d_cols, d_rows)
        result["values_match"] = fs == fd
        if not result["values_match"]:
            diffs = [(a, b) for a, b in zip(fs, fd) if a != b][:5]
            result["first_diffs"] = diffs
    else:
        result["values_match"] = False
    return result
