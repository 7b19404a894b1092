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


# ---------------------------------------------------------------------------
# Scalar functions / row transforms (SURVEY §2.2, §2.9)
# ---------------------------------------------------------------------------

@register(
    "string_normalize",
    oracle="""
    SELECT p_partkey,
           lower(trim(p_name)) AS clean_name,
           CAST(regexp_replace(p_brand, '[^0-9]', '', 'g') AS BIGINT) AS brand_num,
           upper(substr(p_name, 1, 3)) AS name_code,
           lpad(CAST(p_size AS VARCHAR), 3, '0') AS size_padded,
           concat_ws('-', p_brand, p_type) AS tagline
    FROM part
    """,
)
def q_string_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 string battery: lower/trim, strip-non-digits price cleaner,
    substring codes, lpad, concat_ws (reference sites:
    ``standardize_categories.py:39-40``, ``products_scraping.py:443-446``,
    ``generate_mock_data.py:12-15``)."""
    from ..functions import strings as S

    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        S.clean_lower("p_name").alias("clean_name"),
        S.strip_non_digits("p_brand").alias("brand_num"),
        F.upper(F.substring("p_name", 1, 3)).alias("name_code"),
        F.lpad(F.col("p_size").cast("string"), 3, "0").alias("size_padded"),
        F.concat_ws("-", "p_brand", "p_type").alias("tagline"),
    )


@register(
    "truncate_preview",
    oracle="""
    SELECT doc_id,
           CASE WHEN length(text) > 100 THEN substr(text, 1, 100) || '...'
                ELSE text END AS preview
    FROM documents
    """,
)
def q_truncate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 truncation with ellipsis (reference
    ``generate_embeddings.py:106-108``)."""
    from ..functions import strings as S

    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", S.truncate_ellipsis("text", 100).alias("preview"))


@register(
    "json_extract_events",
    oracle="""
    SELECT event_id, event_type,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
    FROM events
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 JSON field access (reference ``get('product_sizes')`` probes,
    ``seperate_tables.py:42-43``)."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )


@register(
    "tolerant_json_parse",
    oracle="""
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
    FROM events
    """,
)
def q_tolerant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 single-quoted-JSON tolerance (reference
    ``json.loads(s.replace("'", '"'))``, ``seperate_tables.py:38``; SURVEY §7
    hard part 3). The query *constructs* a single-quoted variant of each JSON
    payload, repairs it apostrophe-safely, and must recover the original
    value — the oracle reads the clean payload directly."""
    from ..functions import strings as S

    e = load_table(spark, sf_dir, "events")
    sq = F.translate(F.col("props"), '"', "'")  # simulate the dirty input shape
    repaired = S.normalize_quoted_json(sq)
    return e.select(
        "event_id",
        F.get_json_object(repaired, "$.k").cast("int").alias("k"),
    )


@register(
    "month_rollup",
    oracle="""
    SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_total
    FROM orders
    GROUP BY 1
    """,
)
def q_month_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 date functions + rollup (reference audit-timestamp formatting,
    ``seperate_tables.py:31-32``, generalized to a time-bucketed agg)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("order_month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("sum_total"),
        )
    )


@register(
    "conditional_rewrite",
    oracle="""
    SELECT event_id,
           CASE WHEN value >= 100 THEN 'high'
                WHEN value >= 50 THEN 'mid'
                ELSE 'low' END AS tier,
           CASE WHEN props IS NULL OR props = '' THEN 'missing'
                ELSE 'present' END AS props_state
    FROM events
    """,
)
def q_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7/P8: null/empty gates + conditional value rewrite (reference
    ``generate_mock_data.py:113-128``, ``seperate_tables.py:46-62``)."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.when(F.col("value") >= 100, "high")
        .when(F.col("value") >= 50, "mid")
        .otherwise("low")
        .alias("tier"),
        F.when(
            F.col("props").isNull() | (F.col("props") == ""), "missing"
        )
        .otherwise("present")
        .alias("props_state"),
    )


@register(
    "membership_filter",
    oracle="""
    SELECT p_partkey, p_name, p_type
    FROM part
    WHERE p_type IN ('PROMO', 'ECONOMY') AND NOT contains(p_name, 'nut')
    """,
)
def q_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5/P6: IN-list membership + substring anti-filter (reference
    ``WHERE product_code IN %s``, ``generate_embeddings.py:397-398``; skip
    patterns ``products_scraping.py:337-340``). Both predicates reach the
    parquet scan as pushed filters."""
    p = load_table(spark, sf_dir, "part")
    return p.select("p_partkey", "p_name", "p_type").filter(
        F.col("p_type").isin("PROMO", "ECONOMY") & ~F.col("p_name").contains("nut")
    )


# ---------------------------------------------------------------------------
# Reshaping: explode / zip (SURVEY §2.10, J6)
# ---------------------------------------------------------------------------

@register(
    "wordcount",
    oracle="""
    SELECT word, COUNT(*) AS n
    FROM (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents) t
    WHERE word <> ''
    GROUP BY word
    """,
)
def q_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1: explode delimited text into child rows + count (reference image
    explode ``seperate_tables.py:81-106``, as the canonical split+explode)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(F.lower("text"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "zip_explode_pairs",
    oracle="""
    SELECT p_partkey, CAST(t.i AS INT) AS pos,
           l1[t.i + 1] AS left_val, l2[t.i + 1] AS right_val
    FROM (
      SELECT p_partkey,
             string_split(p_brand || '|' || p_type, '|') AS l1,
             string_split(p_type || '|' || p_brand, '|') AS l2
      FROM part
    ) s CROSS JOIN range(2) t(i)
    """,
)
def q_zip_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 + X1: positional zip of two parallel pipe-delimited strings, then
    explode with position (reference ``zip(images, image_names)``,
    ``seperate_tables.py:85``). Pure arrays_zip/posexplode — no UDF."""
    p = load_table(spark, sf_dir, "part")
    zipped = p.select(
        "p_partkey",
        F.arrays_zip(
            F.split(F.concat_ws("|", "p_brand", "p_type"), r"\|").alias("l"),
            F.split(F.concat_ws("|", "p_type", "p_brand"), r"\|").alias("r"),
        ).alias("z"),
    )
    return zipped.select(
        "p_partkey", F.posexplode("z").alias("pos", "pair")
    ).select(
        "p_partkey",
        "pos",
        F.col("pair.l").alias("left_val"),
        F.col("pair.r").alias("right_val"),
    )


# ---------------------------------------------------------------------------
# C1 rule-cascade classification (SURVEY §2.11)
# ---------------------------------------------------------------------------

_PART_RULES = [
    ("Promotional", ["promo"]),
    ("Economy", ["economy"]),
    ("Premium", ["large", "standard"]),
    ("Hardware", ["bolt", "rod", "nut", "screw"]),
    ("Widget", ["widget"]),
]
_PART_SPECIALS = [("medium", "Mid-range")]


@register(
    "rule_cascade_classify",
    oracle="""
    SELECT p_partkey, p_name, p_type,
      CASE
        WHEN contains(lower(trim(p_type)), 'medium') THEN 'Mid-range'
        WHEN lower(trim(p_type)) IN ('promo') THEN 'Promotional'
        WHEN lower(trim(p_type)) IN ('economy') THEN 'Economy'
        WHEN lower(trim(p_type)) IN ('large', 'standard') THEN 'Premium'
        WHEN lower(trim(p_type)) IN ('bolt', 'rod', 'nut', 'screw') THEN 'Hardware'
        WHEN lower(trim(p_type)) IN ('widget') THEN 'Widget'
        WHEN regexp_matches(p_name, '(?i)promo') THEN 'Promotional'
        WHEN regexp_matches(p_name, '(?i)economy') THEN 'Economy'
        WHEN regexp_matches(p_name, '(?i)large|standard') THEN 'Premium'
        WHEN regexp_matches(p_name, '(?i)bolt|rod|nut|screw') THEN 'Hardware'
        WHEN regexp_matches(p_name, '(?i)widget') THEN 'Widget'
        ELSE 'Others'
      END AS category_name
    FROM part
    """,
)
def q_rule_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1: the reference's 3-tier category cascade
    (``standardize_categories.py:38-72``) as rules-as-data compiled to one
    ordered when-chain — special-case substring, exact raw match, then
    name-regex fallback, first hit wins in rule order."""
    from ..operators.categorize import build_rule_cascade

    p = load_table(spark, sf_dir, "part")
    cascade = build_rule_cascade(
        name_col="p_name",
        raw_col="p_type",
        rules=_PART_RULES,
        special_cases=_PART_SPECIALS,
    )
    return p.select("p_partkey", "p_name", "p_type", cascade.alias("category_name"))
