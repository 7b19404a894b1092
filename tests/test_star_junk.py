"""Junk-input robustness for the TPC-H star-schema catalog: every query
over {region, nation, customer, supplier, part, orders, lineitem} must
hash-match its DuckDB oracle on tables salted with the junk real feeds
carry — NULL keys, NULL dates, NULL measures, empty strings, orphan
foreign keys.

The round-4 sweep that introduced this caught 18 real divergences:
three crashes (ANSI DIVIDE_BY_ZERO on zero sigma/revenue, an Arrow
NULL-in-non-nullable id inside mapInPandas), NULL-ordering flips (Spark
ascending default is NULLS FIRST, DuckDB's is NULLS LAST — rank
tie-breaks, dense dim ids, the Pareto frontier order), NULL-skipping
aggregates (countDistinct/count(DISTINCT) vs a NULL basket/customer),
concat_ws silently mispairing a zip, format_string rendering the literal
string 'null', np.median poisoned by one NaN, and phantom NULL=NULL
window matches SQL join semantics never make.
"""

from __future__ import annotations

import datetime
import os

import pytest

from bytesme_etl_batch_pipeline_spark.plans import queries as catalog

STAR_TABLES = {
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
}

# Every oracle-paired catalog query whose scans stay inside STAR_TABLES.
# test_star_query_list_is_complete below fails when a new star query is
# registered without being added here.
STAR_QUERIES = [
    "pricing_summary",
    "dedup_keep_first",
    "dup_report",
    "distinct_projection",
    "dim_join_rollup",
    "anti_join_customers_without_orders",
    "semi_join_active_customers",
    "topk_orders",
    "window_topk_per_customer",
    "group_sequence_codes",
    "dense_dim_ids",
    "union_all_entities",
    "string_normalize",
    "month_rollup",
    "membership_filter",
    "zip_explode_pairs",
    "rule_cascade_classify",
    "zorder_layout_key",
    "join_skew_report",
    "cdc_apply",
    "snapshot_diff_orders",
    "equidepth_histogram",
    "column_profile",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier",
    "fuzzy_name_pairs",
    "part_supplier_variety",
    "modal_quantity_per_flag",
    "seeded_enrichment",
    "ratings_exponential",
    "rollup_sales",
    "cube_sales",
    "running_total",
    "nation_set_ops",
    "doc_template",
    "doc_template_vi",
    "llm_enrich_descriptions",
    "media_decode",
    "media_frame_sample",
    "range_join_balance_tiers",
    "salted_counts",
    "casts_battery",
    "distinct_counts",
    "order_lineitem_revenue",
    "unpivot_part_metrics",
    "quantity_percentiles",
    "stats_moments",
    "scalar_subquery_above_avg",
    "regex_extract_battery",
    "date_battery",
    "left_outer_order_counts",
    "full_outer_nation_presence",
    "grouping_sets_sales",
    "ranking_battery",
    "grouped_string_agg",
    "semantic_search_pipeline",
    "grouped_robust_zscore",
    "data_quality_report",
    "udtf_unit_price_explode",
    "late_shipment_priority_counts",
    "copurchase_pairs",
    "order_total_histogram",
    "sql_market_share",
    "tpch_q10_returned_items",
    "tpch_q14_promo_share",
    "tpch_q18_big_orders",
    "tpch_q6_forecast_revenue",
    "tpch_q17_small_qty_revenue",
    "tpch_q19_disjunctive_revenue",
    "basket_lift_rules",
    "tpch_q8_nation_market_share",
    "customer_rfm_scores",
    "copurchase_triangles",
    "revenue_pareto_deciles",
    "monthly_revenue_growth",
    "supplier_hhi_by_type",
    "orders_keyset_page",
    "order_total_reconciliation",
    "returns_rate_by_brand",
    "size_price_correlation",
    "tpch_q15_top_supplier",
    "tpch_q2_min_cost_supplier",
    "tpch_q7_volume_shipping",
    "tpch_q9_product_type_profit",
    "tpch_q11_important_stock",
    "tpch_q12_shipmode_priority",
    "tpch_q13_customer_distribution",
    "tpch_q20_part_share_suppliers",
    "tpch_q21_waiting_supplier",
    "tpch_q22_global_sales_opportunity",
    "k_anonymity_report",
    "media_phash_dedup",
    "nation_dual_presence_intersect",
    "part_hierarchy_rollup",
    "benford_digit_audit",
    "purchase_linear_regression",
    "order_interarrival_percentiles",
    "rollup_share_of_parent",
    "part_skyline_pareto",
    "revenue_gini_by_nation",
    "new_vs_returning_revenue",
    "supplier_delivery_reliability",
    # round 4: queries reading star tables through MODULE HELPERS
    # (_wide_part over part, _spark_changes over orders) — the old
    # direct-scan-only completeness parse let these escape the sweep
    "snowflake_dims",
    "snowflake_facts",
    "snowflake_children",
    "scd2_history",
]


@pytest.fixture(scope="module")
def junk_star_dir(spark, tmp_path_factory):
    """The real sf0.001 star tables with junk rows injected into each:
    all-NULL rows, NULL foreign keys / dates / measures, empty strings,
    and an orphan-chain (junk nation -> junk customer -> order with one
    NULL-measure and one zero-measure lineitem)."""
    TS = datetime.datetime
    junk = {
        "region": [(None, None)],
        "nation": [(None, None, None), (90, "NULLREGION", None)],
        "customer": [(None, None, None, None, None), (900001, "", 90, None, "")],
        "supplier": [(None, None, None, None), (900001, "", None, None)],
        "part": [
            (None, None, None, None, None, None),
            (900001, "", None, None, None, None),
        ],
        "orders": [
            (None, None, None, None, None, None),
            (900001, None, "O", None, None, None),
            (900002, 900001, "F", 0.0, TS(1996, 6, 1), "1-URGENT"),
        ],
        "lineitem": [
            (None, None, None, None, None, None, None, None, None, None, None),
            (900002, None, None, 1, None, None, None, None, None, None, None),
            (900002, 900001, 900001, 2, 0.0, 0.0, 0.0, 0.0, "", "",
             TS(1996, 6, 2)),
        ],
    }
    src = "/root/testdata/sf0.001"
    d = str(tmp_path_factory.mktemp("junk_star"))
    for t in sorted(STAR_TABLES):
        base = spark.read.parquet(f"{src}/{t}.parquet")
        extra = spark.createDataFrame(junk[t], base.schema)
        base.unionAll(extra).coalesce(1).write.parquet(f"{d}/{t}.parquet")
    return d


def test_star_junk_oracle_parity(spark, junk_star_dir):
    from tests.oracle import compare, duckdb_con

    con = duckdb_con(junk_star_dir)
    failures = []
    for name in STAR_QUERIES:
        try:
            r = compare(
                catalog.SPARK_QUERIES[name](spark, junk_star_dir),
                con,
                catalog.ORACLE_SQL[name],
            )
            if not r["values_match"]:
                failures.append((name, {k: r[k] for k in
                                        ("spark_rows", "duck_rows", "first_diffs")
                                        if k in r}))
        except Exception as ex:  # noqa: BLE001 - report every red at once
            failures.append((name, f"{type(ex).__name__}: {str(ex)[:200]}"))
    assert not failures, failures


def test_rows_only_star_queries_survive_junk(spark, junk_star_dir):
    """The declared rows-only star queries (sketches/property-tested, no
    oracle twin) must still produce defined results on junk tables —
    NULL measures through the HLL/percentile sketches and the beta draw
    must never crash. With this, every catalog query executes against a
    junk fixture."""
    for name in ("approx_distinct_counts", "approx_percentiles",
                 "stars_beta"):
        assert catalog.SPARK_QUERIES[name](spark, junk_star_dir).count() >= 0


def test_star_query_list_is_complete():
    """A new star-schema query registered without joining STAR_QUERIES
    would silently skip junk coverage — derive the expected set from the
    catalog source. ``catalog_table_reads`` resolves reads made through
    module helpers (_wide_part, _spark_changes), which the sweep's original
    direct-scan-only parse mis-attributed — that blind spot let the
    snowflake trio and scd2_history escape the sweep until round 4."""
    from tests.oracle import catalog_table_reads

    reads = catalog_table_reads()
    expected = {
        name
        for name, tabs in reads.items()
        if tabs and tabs <= STAR_TABLES and name in catalog.ORACLE_SQL
    }
    assert expected == set(STAR_QUERIES), (
        sorted(expected - set(STAR_QUERIES)),
        sorted(set(STAR_QUERIES) - expected),
    )
