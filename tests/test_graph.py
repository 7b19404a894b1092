"""Graph-kernel oracle integrity tests (DuckDB-only, no Spark session).

Round 7 rewrote the ``copurchase_triangles`` oracle to the same
Suri-Vassilvitskii degree orientation the engine uses (the naive
three-way self-join spilled past the host's disk at sf10), which means
engine and oracle now SHARE the algorithm — a common orientation bug
would be invisible to the gate. This module keeps the original naive
three-way-join SQL alive as an executable independent spec: the oriented
oracle must stay bit-identical to it at small SF.
"""

from __future__ import annotations

import pytest

from bytesme_etl_batch_pipeline_spark.plans import queries as catalog

from .oracle import duckdb_con

# The pre-round-7 naive spec, verbatim except for dropping the (purely
# planner-directed) MATERIALIZED hints: triangles a<b<c are counted once
# because e stores each strong edge with pa < pb and the join pattern is
# e1=(a,b), e2=(b,c), e3=(a,c). Semantics only — quadratic wedge fan-out
# makes it unusable as the sf10 oracle, which is WHY the oriented rewrite
# exists and why this test pins the two to each other.
NAIVE_TRIANGLES_SQL = """
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    pe AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS n
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    ),
    e AS (SELECT pa, pb FROM pe WHERE n >= 2),
    deg AS (
      SELECT node, count(*) AS d FROM (
        SELECT pa AS node FROM e UNION ALL SELECT pb FROM e
      ) GROUP BY node
    ),
    tri AS (
      SELECT count(*) AS t
      FROM e e1 JOIN e e2 ON e1.pb = e2.pa
                JOIN e e3 ON e3.pa = e1.pa AND e3.pb = e2.pb
    ),
    wed AS (SELECT SUM(d * (d - 1) // 2) AS w FROM deg)
    SELECT CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
           CAST(t AS BIGINT) AS n_triangles,
           CAST(w AS BIGINT) AS n_wedges,
           round(CASE WHEN w > 0 THEN 3.0 * t / w ELSE 0.0 END, 6)
             AS clustering
    FROM tri, wed
"""


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_triangle_oracle_matches_naive_spec(sf_dir: str) -> None:
    con = duckdb_con(sf_dir)
    try:
        oriented = con.execute(
            catalog.ORACLE_SQL["copurchase_triangles"]
        ).fetchall()
        naive = con.execute(NAIVE_TRIANGLES_SQL).fetchall()
    finally:
        con.close()
    assert oriented == naive
    # the result is a single summary row with a non-degenerate graph
    assert len(oriented) == 1 and oriented[0][0] > 0


def _naive_simhash_pairs_sql() -> str:
    """The pre-round-8 naive spec: lang-blocked doc-level self-join with a
    post-join bit_count filter. Unusable as the sf10 oracle (it
    materializes ~(docs/lang)^2 intermediate rows — 1553 s in the r7
    sweep), kept here as the executable independent spec for the
    value-space mask-join rewrite."""
    from bytesme_etl_batch_pipeline_spark.plans.queries import ORACLE_SQL

    return f"""
    WITH sig AS ({ORACLE_SQL["simhash16"]}),
    tagged AS (
      SELECT s.doc_id, s.simhash, d.lang
      FROM sig s JOIN documents d ON s.doc_id = d.doc_id
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           bit_count(xor(a.simhash, b.simhash)) AS hamming
    FROM tagged a JOIN tagged b ON a.lang = b.lang AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_simhash_oracle_matches_naive_spec(sf_dir: str) -> None:
    """Round 8 rewrote the ``simhash_hamming_pairs`` oracle to pair the
    <=65536 distinct 16-bit VALUES through the 697 XOR masks of Hamming
    weight <=3 and expand back to doc pairs (linear work). This pins the
    rewrite to the original naive doc-level self-join, bit for bit."""
    con = duckdb_con(sf_dir)
    try:
        rewritten = sorted(
            map(
                tuple,
                con.execute(
                    catalog.ORACLE_SQL["simhash_hamming_pairs"]
                ).fetchall(),
            )
        )
        naive = sorted(
            map(tuple, con.execute(_naive_simhash_pairs_sql()).fetchall())
        )
    finally:
        con.close()
    assert rewritten == naive
    assert len(rewritten) > 0


def test_oriented_oracle_still_degree_oriented() -> None:
    """Guard against someone 'simplifying' the oracle back to the naive
    join: the committed oracle must keep both the orientation CTE and the
    MATERIALIZED hints that make it feasible at sf10."""
    sql = catalog.ORACLE_SQL["copurchase_triangles"]
    assert "oriented AS MATERIALIZED" in sql
    assert "e AS MATERIALIZED" in sql
