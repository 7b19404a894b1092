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
    # An in-memory DuckDB has NO temp_directory, so out-of-core operators
    # cannot spill and a big aggregation (sf10 bigram LM: ~100M groups)
    # dies with a malloc failure instead. Point it at a scratch dir so the
    # oracle side spills like a real engine; optional cap via env for
    # scale sweeps that share the host with a large-heap JVM.
    import atexit
    import shutil
    import tempfile

    # pid-keyed: two concurrent processes (suite + scale sweep) sharing one
    # spill dir can collide on DuckDB temp block files — same cross-process
    # collision class as the applicationId-keyed stream snapshots.
    spill = os.path.join(tempfile.gettempdir(), f"duck_oracle_spill_{os.getpid()}")
    con.execute(f"SET temp_directory = '{spill}'")
    atexit.register(shutil.rmtree, spill, ignore_errors=True)
    mem = os.environ.get("SPARK_GRAFT_DUCK_MEM")
    if mem:
        con.execute(f"SET memory_limit = '{mem}'")
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(path):  # Spark-written directory layout
            path = os.path.join(path, "*.parquet")
        elif not os.path.exists(path):  # partial dirs (junk fixtures) are fine
            continue
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


# ---------------------------------------------------------------------------
# Driver-comparator hash classes.
#
# The driver compares results through pandas: HUGEINT (DuckDB int128 from an
# un-cast integer SUM) and list/struct/map cells either hash differently from
# Spark's output or are unhashable outright — round 2 had five bit-exact
# queries graded red for exactly this. Every oracle output column must land
# in one of these classes, and in the SAME class as the Spark column.
# ---------------------------------------------------------------------------

_DUCK_CLASS = {
    "TINYINT": "int", "SMALLINT": "int", "INTEGER": "int", "BIGINT": "int",
    "UTINYINT": "int", "USMALLINT": "int", "UINTEGER": "int",
    "FLOAT": "float", "REAL": "float", "DOUBLE": "float",
    "BOOLEAN": "bool", "VARCHAR": "str", "DATE": "date", "BLOB": "bytes",
}


def duck_hash_class(type_str: str) -> tuple[str | None, str | None]:
    """(class, hazard_reason) for a DuckDB output type string."""
    t = str(type_str).upper()
    if t in _DUCK_CLASS:
        return _DUCK_CLASS[t], None
    if t.startswith("TIMESTAMP"):
        return "timestamp", None
    for bad in ("HUGEINT", "UHUGEINT", "UBIGINT"):
        if t == bad:
            return None, f"{bad} exceeds int64 — driver hash diverges (cast to BIGINT)"
    if t.startswith("DECIMAL"):
        # DuckDB's pandas path converts DECIMAL to float64 (verified: r02
        # driver row for order_total_histogram passed with DECIMAL(16,1)
        # outputs), so it hashes as float — the Spark side must be double.
        return "float", None
    if t.endswith("[]") or t.startswith(("STRUCT", "MAP", "LIST", "UNION")):
        return None, f"nested type {t} is unhashable in the driver comparator (array_to_string it)"
    return None, f"unrecognized DuckDB output type {t}"


def spark_hash_class(dt) -> tuple[str | None, str | None]:
    """(class, hazard_reason) for a Spark DataType."""
    name = dt.typeName()
    m = {
        "byte": "int", "short": "int", "integer": "int", "long": "int",
        "float": "float", "double": "float", "boolean": "bool",
        "string": "str", "date": "date", "binary": "bytes",
        "timestamp": "timestamp", "timestamp_ntz": "timestamp",
    }
    if name in m:
        return m[name], None
    if name in ("array", "map", "struct"):
        return None, f"nested Spark output type {name} is unhashable in the driver comparator"
    if name == "decimal":
        return None, "decimal output surfaces as objects — cast to double/long"
    return None, f"unrecognized Spark output type {name}"


def type_report(spark_df, rel) -> dict:
    """Per-column hash-class comparison between a Spark result and a DuckDB
    relation (lazy — does not execute the relation)."""
    s = {f.name: spark_hash_class(f.dataType) for f in spark_df.schema.fields}
    d = dict(zip(rel.columns, [duck_hash_class(t) for t in rel.types]))
    hazards = {c: r for c, (cls, r) in s.items() if r} | {
        c: r for c, (cls, r) in d.items() if r
    }
    mismatches = {
        c: (s[c][0], d[c][0])
        for c in set(s) & set(d)
        if s[c][0] and d[c][0] and s[c][0] != d[c][0]
    }
    return {"hazards": hazards, "class_mismatches": mismatches,
            "types_match": not hazards and not mismatches}


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
    types = type_report(spark_df, rel)
    d_rows = rel.fetchall()
    result = {
        "rows_match": len(s_rows) == len(d_rows),
        "cols_match": sorted(s_cols) == sorted(d_cols),
        "types_match": types["types_match"],
        "type_report": types,
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


def rows_only_canon(spark_df) -> int:
    """Replicate the driver's canonicalization for NO-ORACLE queries: the
    driver converts even rows-only outputs to pandas and ``sort_values``
    over ALL columns before recording the row count — a list/struct cell
    crashes its comparator (``TypeError: unhashable type: 'list'``, the
    CORRECTNESS_r05 `pq_adc_search`/`ivfpq_topk` rows). Raises exactly
    where the driver would; returns the row count on success."""
    import pandas as pd

    rows = [tuple(r) for r in spark_df.collect()]
    pdf = pd.DataFrame(rows, columns=spark_df.columns)
    if len(pdf.columns):
        # driver's _canon: lexicographic sort over every output column —
        # pandas factorizes each column, which requires hashable cells
        pdf = pdf.sort_values(by=list(pdf.columns))
    return len(pdf)


# ---------------------------------------------------------------------------
# Engine-side fingerprint for big outputs.
#
# The full comparator collects both engines' results into Python, which caps
# out around driver maxResultSize on O(N)-row outputs at sf10. Count-vs-count
# triage is blind to value divergence in tie-breaking/selection semantics
# (dedup_keep_first would count-match even if the engines keep different
# survivor rows). This path pins VALUES without collecting: both engines
# compute the same order-insensitive aggregate — a SUM over a 60-bit hash of
# each row's canonical string form (md5 is identical cross-engine on UTF-8)
# for every non-float column, plus exact COUNT/MIN/MAX and a
# tolerance-compared SUM per float column (FP addition is not associative, so
# a cross-engine SUM of bit-identical doubles in different orders drifts in
# the low bits; MIN/MAX/COUNT of a bit-identical multiset are exact).
#
# Canonical string forms verified identical between Spark 4.1 and DuckDB 1.0:
#   int/bool/date -> CAST AS STRING ('5', 'true', '2024-01-05')
#   string        -> the value itself
#   timestamp     -> 'yyyy-MM-dd HH:mm:ss.SSSSSS' / '%Y-%m-%d %H:%M:%S.%f'
#   binary        -> hex() (uppercase in both)
#   NULL          -> chr(1) sentinel (concat_ws would silently DROP nulls)
# Row hash: int(md5(canon)[0:15], 16) summed exactly — Spark
# conv(...,16,10)::DECIMAL(38,0) vs DuckDB CAST('0x'||... AS UBIGINT) summed
# as HUGEINT, verified bit-identical on range(1000).
# ---------------------------------------------------------------------------

_NULL_SENTINEL = "\x01"
_SEP = "\x1f"


def _split_fp_cols(cols_with_class):
    """[(name, class)] -> (sorted non-float names, sorted float names)."""
    nonfloat = sorted(n for n, c in cols_with_class if c != "float")
    floats = sorted(n for n, c in cols_with_class if c == "float")
    return nonfloat, floats


def spark_fingerprint(spark_df) -> dict:
    """One aggregation job over the DataFrame; no collect of the result set."""
    from pyspark.sql import functions as F

    classes = [
        (f.name, spark_hash_class(f.dataType)[0]) for f in spark_df.schema.fields
    ]
    nonfloat, floats = _split_fp_cols(classes)
    cls = dict(classes)

    def canon(name):
        c = F.col(f"`{name}`")
        k = cls[name]
        if k == "timestamp":
            return F.date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")
        if k == "bytes":
            return F.hex(c)
        return c.cast("string")

    pieces = []
    for name in nonfloat:
        pieces += [F.coalesce(canon(name), F.lit(_NULL_SENTINEL)), F.lit(_SEP)]
    row = F.concat(*pieces) if pieces else F.lit("")
    aggs = [
        F.count(F.lit(1)).alias("__n"),
        F.sum(
            F.conv(F.substring(F.md5(row), 1, 15), 16, 10).cast("decimal(38,0)")
        ).alias("__rowhash"),
    ]
    for name in floats:
        c = F.col(f"`{name}`").cast("double")
        aggs += [
            F.count(c).alias(f"__cnt_{name}"),
            F.min(c).alias(f"__min_{name}"),
            F.max(c).alias(f"__max_{name}"),
            F.sum(c).alias(f"__sum_{name}"),
        ]
    r = spark_df.agg(*aggs).collect()[0]
    out = {
        "n": r["__n"],
        "rowhash": None if r["__rowhash"] is None else int(r["__rowhash"]),
        "floats": {},
    }
    for name in floats:
        out["floats"][name] = (
            r[f"__cnt_{name}"],
            r[f"__min_{name}"],
            r[f"__max_{name}"],
            r[f"__sum_{name}"],
        )
    return out


def duck_fingerprint(con, sql: str) -> dict:
    rel = con.sql(sql)
    classes = [
        (n, duck_hash_class(t)[0]) for n, t in zip(rel.columns, rel.types)
    ]
    nonfloat, floats = _split_fp_cols(classes)
    cls = dict(classes)

    def canon(name):
        q = f'"{name}"'
        k = cls[name]
        if k == "timestamp":
            return f"strftime({q}, '%Y-%m-%d %H:%M:%S.%f')"
        if k == "bytes":
            return f"hex({q})"
        return f"CAST({q} AS VARCHAR)"

    pieces = []
    for name in nonfloat:
        pieces += [f"coalesce({canon(name)}, chr(1))", "chr(31)"]
    row = f"concat({', '.join(pieces)})" if pieces else "''"
    selects = [
        "count(*) AS __n",
        "SUM(CAST(CAST(concat('0x', substring(md5("
        + row
        + "),1,15)) AS UBIGINT) AS HUGEINT)) AS __rowhash",
    ]
    for name in floats:
        c = f'CAST("{name}" AS DOUBLE)'
        selects += [
            f'count({c}) AS "__cnt_{name}"',
            f'min({c}) AS "__min_{name}"',
            f'max({c}) AS "__max_{name}"',
            f'sum({c}) AS "__sum_{name}"',
        ]
    q = f"SELECT {', '.join(selects)} FROM ({sql}) __fp_q"
    row_out = con.sql(q).fetchone()
    names = ["__n", "__rowhash"] + [
        f"__{k}_{name}" for name in floats for k in ("cnt", "min", "max", "sum")
    ]
    vals = dict(zip(names, row_out))
    out = {
        "n": vals["__n"],
        "rowhash": None if vals["__rowhash"] is None else int(vals["__rowhash"]),
        "floats": {},
    }
    for name in floats:
        out["floats"][name] = tuple(
            vals[f"__{k}_{name}"] for k in ("cnt", "min", "max", "sum")
        )
    return out


def _float_agg_match(a, b) -> bool:
    """(cnt, min, max, sum) tuples: cnt/min/max exact (NaN==NaN), sum to a
    1e-9 relative tolerance (cross-engine fold order)."""

    def scalar_eq(x, y, tol=False):
        if x is None or y is None:
            return x is None and y is None
        fx, fy = float(x), float(y)
        if math.isnan(fx) or math.isnan(fy):
            return math.isnan(fx) and math.isnan(fy)
        if tol:
            return abs(fx - fy) <= 1e-9 * max(1.0, abs(fx), abs(fy))
        return fx == fy

    return (
        a[0] == b[0]
        and scalar_eq(a[1], b[1])
        and scalar_eq(a[2], b[2])
        and scalar_eq(a[3], b[3], tol=True)
    )


def fingerprint_compare(spark_df, con, sql: str) -> dict:
    """Full engine-side comparison for outputs too big to collect: column
    names + hash classes (type_report), row count, non-float row-hash-sum,
    per-float-column aggregate pins. Executes ONE aggregation per engine."""
    rel = con.sql(sql)
    types = type_report(spark_df, rel)
    result = {
        "cols_match": sorted(spark_df.columns) == sorted(rel.columns),
        "types_match": types["types_match"],
        "type_report": types,
    }
    fs = spark_fingerprint(spark_df)
    fd = duck_fingerprint(con, sql)
    result["spark_rows"], result["duck_rows"] = fs["n"], fd["n"]
    result["rows_match"] = fs["n"] == fd["n"]
    float_ok = set(fs["floats"]) == set(fd["floats"]) and all(
        _float_agg_match(fs["floats"][k], fd["floats"][k]) for k in fs["floats"]
    )
    result["values_match"] = (
        result["rows_match"]
        and result["cols_match"]
        and fs["rowhash"] == fd["rowhash"]
        and float_ok
    )
    if not result["values_match"]:
        result["spark_fp"], result["duck_fp"] = fs, fd
    return result


def catalog_table_reads() -> dict[str, set[str]]:
    """query name -> the set of driver base tables its plan reads, derived
    from the catalog SOURCE (Spark-free, seconds): direct
    ``load_table(spark, sf_dir, "t")`` / ``_cpu_spread(spark, sf_dir, "t")``
    calls in the query's register block, PLUS the reads inside any
    module-level ``_helper(spark, ...)`` function the block calls (helpers
    resolved transitively). The junk sweeps' completeness guards use this so
    a query reading through a shared helper (``_wide_part``,
    ``_spark_changes``, ``_neardup_lsh_edges``) cannot silently escape junk
    coverage the way a direct-scan-only parse would let it."""
    import re

    from bytesme_etl_batch_pipeline_spark.plans import queries as catalog

    src = open(
        os.path.join(os.path.dirname(catalog.__file__), "queries.py")
    ).read()
    load_re = (
        r'load_table\(spark, sf_dir, "(\w+)"'
        r'|_cpu_spread\(spark, sf_dir, "(\w+)"'
    )

    def direct(text: str) -> set[str]:
        return {t for pair in re.findall(load_re, text) for t in pair if t}

    # Module-level helper functions (column-0 "def _name("): their table
    # reads and which other helpers they call.
    helpers: dict[str, dict] = {}
    for m in re.finditer(r"\ndef (_\w+)\(", src):
        start = m.end()
        nxt = re.search(r"\ndef |\n@register\(", src[start:])
        body = src[start : start + nxt.start()] if nxt else src[start:]
        helpers[m.group(1)] = {
            "tabs": direct(body),
            "calls": set(re.findall(r"\b(_\w+)\(spark", body)),
        }
    changed = True
    while changed:  # transitive helper -> helper resolution
        changed = False
        for h in helpers.values():
            for c in h["calls"]:
                sub = helpers.get(c)
                if sub and not sub["tabs"] <= h["tabs"]:
                    h["tabs"] |= sub["tabs"]
                    changed = True

    out: dict[str, set[str]] = {}
    for b in re.split(r"@register\(", src)[1:]:
        m = re.match(r'\s*"([^"]+)"', b)
        if not m:
            continue
        # Cut at the first column-0 helper def: its source belongs to the
        # MODULE, not this query (the old parse mis-attributed the reads of
        # a helper defined between two register blocks to the earlier one).
        block = re.split(r"\ndef _", b)[0]
        tabs = direct(block)
        for c in set(re.findall(r"\b(_\w+)\(spark", block)):
            if c in helpers:
                tabs |= helpers[c]["tabs"]
        out[m.group(1)] = tabs
    return out
