"""End-to-end reference-pipeline parity (SURVEY §3.1): raw wide products →
C1 categorize → D1 dedup → enrichment → X2 snowflake split, over
reference-shaped rows covering the FIXTURES.md §6 edge cases."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from bytesme_etl_batch_pipeline_spark.operators.categorize import (
    BYTESME_RULES,
    BYTESME_SPECIAL_CASES,
    standardize_categories,
)
from bytesme_etl_batch_pipeline_spark.operators.dedup import dedup_keep_first
from bytesme_etl_batch_pipeline_spark.operators.enrich import enrich_products
from bytesme_etl_batch_pipeline_spark.operators.normalize import snowflake_split

RAW_ROWS = [
    # (name, url, brand, raw_category, images, image_names, price)
    ("Bánh kem dâu", "http://a/1", "SiteA", "bánh kem bơ",
     "http://img/1|http://img/2", "ảnh một|", "89000"),
    ("Bánh kem dâu", "http://a/1", "SiteA", "bánh kem bơ",    # exact dup (D1)
     "http://img/1|http://img/2", "ảnh một|", "89000"),
    ("Trà đào", "http://a/2", "SiteA", "tra-sua", "http://img/3", None, "0"),
    ("Cold-Brew Sữa", "http://b/1", "SiteB", "khác", "http://img/4", "cf", "45000"),
    ("Nước lạ", "http://b/2", "SiteB", "không rõ", "http://img/5", None, ""),
]


@pytest.fixture(scope="module")
def pipeline_outputs(spark):
    raw = spark.createDataFrame(
        RAW_ROWS,
        "product_name string, product_url string, product_brand string, "
        "original_category string, product_image string, product_image_name string, "
        "product_unit_price string",
    )
    # §3.1 stage order is semantic: categorize → dedup → enrich → split
    categorized = standardize_categories(
        raw, "product_name", "original_category", BYTESME_RULES, BYTESME_SPECIAL_CASES
    )
    deduped = dedup_keep_first(
        categorized,
        keys=["product_name", "product_url"],
        # order must be unique WITHIN each key group (the keys themselves
        # are constant there) — use the non-key columns
        order_by=sorted(c for c in categorized.columns
                        if c not in ("product_name", "product_url")),
    )
    enriched = enrich_products(
        deduped.withColumn(
            "price_num", F.col("product_unit_price").try_cast("long")
        ),
        key_col="product_url",
        brand_col="product_brand",
        category_col="category_name",
        price_col="price_num",
    )
    return snowflake_split(
        enriched,
        dim_key="category_name",
        dim_attrs=["product_brand"],
        fact_key="product_url",
        child_url_col="product_image",
        child_name_col="product_image_name",
        order_by=["product_url"],
    )


def test_dims_are_dense_and_deduped(pipeline_outputs):
    dims = pipeline_outputs.dims.collect()
    names = sorted(r["category_name"] for r in dims)
    assert names == ["Cakes", "Coffee", "Others", "Tea"]
    assert sorted(r["dim_id"] for r in dims) == [1, 2, 3, 4]


def test_facts_resolve_fks_and_enrich(pipeline_outputs):
    facts = {r["product_url"]: r for r in pipeline_outputs.facts.collect()}
    assert len(facts) == 4  # the duplicate collapsed
    for r in facts.values():
        assert r["dim_id"] is not None and r["fact_id"] is not None
        # enrichment contracts (seeded distributions)
        assert r["product_code"] is not None and len(r["product_code"]) == 9
        assert r["product_discount_percentage"] in range(0, 50)
        assert r["product_total_ratings"] >= 1
        assert 0 <= r["product_total_orders"] < 500
        assert 1.0 <= r["product_overall_stars"] <= 5.0
    # zero/empty price got the randomized default
    assert facts["http://a/2"]["price_num"] >= 80_000
    assert facts["http://b/2"]["price_num"] >= 80_000
    assert facts["http://a/1"]["price_num"] == 89_000  # valid price kept


def test_children_explode_with_fallback(pipeline_outputs):
    kids = pipeline_outputs.children.collect()
    # 2 images for product 1, one each for the other three → 5 rows
    assert len(kids) == 5
    by_url = {r["item_url"]: r["item_name"] for r in kids}
    assert by_url["http://img/1"] == "ảnh một"
    # empty second name falls back to the fact key
    assert by_url["http://img/2"] == "http://a/1"


def test_pipeline_is_deterministic(spark, pipeline_outputs):
    """Same inputs → bit-identical outputs on rerun (seeded contract)."""
    facts1 = sorted(map(tuple, pipeline_outputs.facts.collect()))
    facts2 = sorted(map(tuple, pipeline_outputs.facts.collect()))
    assert facts1 == facts2
