"""Query catalog: every SURVEY §2 operator as a named (spark_fn, oracle_sql)
pair over the driver's testdata tables.

Contract (driver's ``__spark_entry__`` protocol):
* ``SPARK_QUERIES[name](spark, sf_dir) -> DataFrame``
* ``ORACLE_SQL[name]`` — ANSI SQL DuckDB runs on the same parquet views;
  compared by row-count + schema + order-insensitive value hash.

Float-determinism rule: any aggregated float column is computed through
exact DECIMAL arithmetic in BOTH engines (decimal sums are associative, so
Spark's partial aggregation order cannot perturb the result), then cast to
DOUBLE at the end. Raw float columns pass through untouched (same parquet
bits on both sides).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import aggregate as agg_ops
from ..operators import dedup as dedup_ops
from ..operators import joins as join_ops
from ..sources.tables import load_table

SparkQuery = Callable[[SparkSession, str], DataFrame]

SPARK_QUERIES: dict[str, SparkQuery] = {}
ORACLE_SQL: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a query (and optionally its DuckDB oracle) to the catalog."""

    def deco(fn: SparkQuery) -> SparkQuery:
        SPARK_QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco


def _dec(col: str, scale: int = 4):
    return F.col(col).cast(f"decimal(18,{scale})")


# ---------------------------------------------------------------------------
# Aggregation core (SURVEY §2.5) — flagship pricing summary.
# ---------------------------------------------------------------------------

@register(
    "pricing_summary",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS sum_disc_price,
      CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_qty,
      COUNT(*) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H-Q1-shaped pricing summary (A-class aggregations,
    SURVEY §2.5 extension surface). Map-side partial agg + one shuffle on the
    2-value group key; decimal sums keep the result bit-stable at any
    parallelism."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")))
            .cast("double")
            .alias("sum_disc_price"),
            (F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1)))
            .cast("double")
            .alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Dedup (SURVEY §2.3)
# ---------------------------------------------------------------------------

@register(
    "dedup_keep_first",
    oracle="""
    SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity
    FROM (
      SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
             row_number() OVER (PARTITION BY l_orderkey, l_partkey
                                ORDER BY l_linenumber, l_suppkey) AS rn
      FROM lineitem
    ) t
    WHERE rn = 1
    """,
)
def q_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1: keyed dedup, keep-first under an explicit total order
    (reference ``remove_duplicates.py:6-12``; order key replaces pandas file
    order — SURVEY §7 hard part 2)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity"
    )
    return dedup_ops.dedup_keep_first(
        li, keys=["l_orderkey", "l_partkey"], order_by=["l_linenumber", "l_suppkey"]
    )


@register(
    "dup_report",
    oracle="""
    SELECT l_orderkey, l_partkey, COUNT(*) AS dup_count
    FROM lineitem
    GROUP BY l_orderkey, l_partkey
    HAVING COUNT(*) > 1
    """,
)
def q_dup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3: duplicate detection report (reference
    ``tests/test_duplicate_products.py:6-19``)."""
    li = load_table(spark, sf_dir, "lineitem")
    return dedup_ops.duplicate_report(li, ["l_orderkey", "l_partkey"])


@register(
    "distinct_projection",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2: set-semantics distinct on a projection (reference
    ``processed_urls`` set, ``products_scraping.py:129-137``)."""
    c = load_table(spark, sf_dir, "customer")
    return dedup_ops.dedup_distinct(c, ["c_mktsegment", "c_nationkey"])


# ---------------------------------------------------------------------------
# Joins (SURVEY §2.4)
# ---------------------------------------------------------------------------

@register(
    "dim_join_rollup",
    oracle="""
    SELECT r.r_name,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def q_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/J3: snowflake dim resolution via broadcast joins
    (reference dict probes ``seperate_tables.py:111-117,141-143``). Both dims
    broadcast → the fact side never shuffles for the join; the only exchange
    is the final 5-group rollup."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = join_ops.resolve_key(
        join_ops.resolve_key(c, n, on=[c.c_nationkey == n.n_nationkey]),
        r,
        on=[F.col("n_regionkey") == r.r_regionkey],
    )
    return joined.groupBy("r_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(_dec("c_acctbal")).cast("double").alias("sum_acctbal"),
    )


@register(
    "anti_join_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4/U2: anti-join (reference parent-path set difference,
    ``menus_crawling.py:12-19,53-54``)."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return dedup_ops.anti_join(c, o, on=["c_custkey"])


@register(
    "semi_join_active_customers",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join — membership filter as a join (reference ``IN %s`` filter,
    ``generate_embeddings.py:397-398``, generalized beyond literal lists)."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return c.join(o, on=["c_custkey"], how="left_semi")


# ---------------------------------------------------------------------------
# Sorts / limits / top-k (SURVEY §2.7)
# ---------------------------------------------------------------------------

@register(
    "topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1: top-k with deterministic tie-break. Catalyst plans
    TakeOrderedAndProject — per-partition heaps, no global sort."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@register(
    "window_topk_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) t
    WHERE rn <= 2
    """,
)
def q_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 window: top-2 orders per customer (per-group rank — the implicit
    window under reference A2)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
    )


# ---------------------------------------------------------------------------
# Sequence codes / surrogate keys (SURVEY §2.5 A2/A3)
# ---------------------------------------------------------------------------

@register(
    "group_sequence_codes",
    oracle="""
    SELECT p_partkey, p_brand,
           printf('%s-%s-%03d',
                  upper(substr(p_type, 1, 2)),
                  upper(substr(p_brand, 1, 2)),
                  CAST(row_number() OVER (PARTITION BY p_brand ORDER BY p_partkey) AS INT)
           ) AS product_code
    FROM part
    """,
)
def q_group_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: per-group sequence codes ``XX-YY-NNN`` (reference
    ``generate_mock_data.py:11-16,82-103``)."""
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_type")
    out = agg_ops.sequence_code(
        p, brand_col="p_type", group_col="p_brand", order_by=["p_partkey"]
    )
    return out.select("p_partkey", "p_brand", "product_code")


@register(
    "dense_dim_ids",
    oracle="""
    SELECT CAST(row_number() OVER (ORDER BY n_name) AS INT) AS dim_id, n_name
    FROM (SELECT DISTINCT n_name FROM nation) t
    """,
)
def q_dense_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 (dims): dense insertion-order ids re-expressed as an explicit
    deterministic order (reference ``enumerate(..., 1)``,
    ``seperate_tables.py:112``)."""
    n = load_table(spark, sf_dir, "nation").select("n_name").distinct()
    return agg_ops.dense_ids(n, "dim_id", order_by=["n_name"]).select("dim_id", "n_name")


# ---------------------------------------------------------------------------
# Set ops (SURVEY §2.8)
# ---------------------------------------------------------------------------

@register(
    "union_all_entities",
    oracle="""
    SELECT c_name AS name, 'customer' AS entity FROM customer
    UNION ALL
    SELECT s_name AS name, 'supplier' AS entity FROM supplier
    """,
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: union-all across per-source extracts (reference
    ``all_products.extend(...)``, ``tests/test_products_scraping.py:17-23``)."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_name").alias("name"), F.lit("customer").alias("entity")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_name").alias("name"), F.lit("supplier").alias("entity")
    )
    return c.unionByName(s)
