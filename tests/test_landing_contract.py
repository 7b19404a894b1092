"""S7 landing-zone contract (VERDICT r1 'What's missing' #4).

The reference's largest component is the Selenium extractor
(``scripts/extract/products_scraping.py:139-314``), deliberately kept
out-of-engine (SURVEY §3). This test pins the BOUNDARY instead: whatever
produces the landing CSVs must emit the raw 16-column shape
(``data/raw/bingsu_products.csv:1``), and the engine must ingest that shape
through ``read_csv(with_lineage=True)`` — quoted multi-line Vietnamese
descriptions, pipe-delimited image lists, the three unit-price shapes —
straight into the category cascade without adapters."""

from __future__ import annotations

import csv
import os

import pytest

from pyspark.sql import functions as F

from bytesme_etl_batch_pipeline_spark.operators.categorize import (
    BYTESME_RULES,
    BYTESME_SPECIAL_CASES,
    standardize_categories,
)
from bytesme_etl_batch_pipeline_spark.schemas import RAW_PRODUCTS
from bytesme_etl_batch_pipeline_spark.sources.files import read_csv

FIXTURE = os.path.join(
    os.path.dirname(__file__), "fixtures", "raw_products_landing.csv"
)
REF_RAW = "/root/reference/data/raw/bingsu_products.csv"


def test_contract_matches_reference_header():
    """The schema, the fixture, and (when present) the reference's actual
    landing file must agree on the exact 16-column header — this is the
    contract the out-of-engine extractor is held to."""
    with open(FIXTURE, newline="", encoding="utf-8") as f:
        fixture_header = next(csv.reader(f))
    assert fixture_header == [fld.name for fld in RAW_PRODUCTS.fields]
    if os.path.exists(REF_RAW):
        with open(REF_RAW, newline="", encoding="utf-8") as f:
            ref_header = next(csv.reader(f))
        assert ref_header == fixture_header


def test_landing_csv_ingests_with_lineage(spark):
    df = read_csv(spark, FIXTURE, schema=RAW_PRODUCTS, with_lineage=True)
    rows = df.collect()
    # the quoted multi-line description must stay ONE row
    assert len(rows) == 3
    assert dict(df.dtypes)["product_discount_percentage"] == "double"
    assert dict(df.dtypes)["product_stock_quantity"] == "int"
    assert "source_file" in df.columns and "row_pos" in df.columns
    assert all(r["source_file"].endswith("raw_products_landing.csv") for r in rows)

    by_name = {r["product_name"]: r for r in rows}
    bingsu = by_name["Bingsu Dâu Tây"]
    assert "\nThích hợp mùa hè." in bingsu["product_description"]
    assert bingsu["product_image"].count("|") == 1  # pipe list survives
    assert bingsu["product_overall_stars"] == 4.7
    assert by_name["Bánh kem bơ nhỏ"]["product_unit_price"].startswith(
        "{'product_sizes'"
    )
    assert by_name["Trà sữa trân châu"]["product_description"] is None


def test_landing_feeds_cascade_without_adapters(spark):
    """Boundary-to-engine: the raw frame flows directly into C1."""
    df = read_csv(spark, FIXTURE, schema=RAW_PRODUCTS, with_lineage=True)
    out = standardize_categories(
        df.select("product_name", "original_category"),
        "product_name",
        "original_category",
        BYTESME_RULES,
        BYTESME_SPECIAL_CASES,
    )
    got = {r["product_name"]: r["category_name"] for r in out.collect()}
    assert got == {
        "Bingsu Dâu Tây": "Bingsu",
        "Bánh kem bơ nhỏ": "Cakes",
        "Trà sữa trân châu": "Tea",
    }


def test_reference_yaml_config_runs_unchanged(spark, tmp_path):
    """A reference user's etl_config.yml transform list (reference names,
    reference order) must drive the engine end-to-end over a raw landing
    file: categorize → dedup → enrich → split, with a per-input report."""
    from bytesme_etl_batch_pipeline_spark.plans.pipeline import (
        load_config,
        register_reference_stages,
        run_pipeline,
    )

    cfg_path = str(tmp_path / "etl_config.yml")
    with open(cfg_path, "w") as f:
        f.write(
            """
input_directory: "data/raw"
file_pattern: "*.csv"
transforms:
  - standardize_categories
  - remove_duplicates
  - generate_mock_data
  - seperate_tables
categories:
  input_column: "original_category"
  output_column: "category_name"
"""
        )
    cfg = load_config(cfg_path)
    assert cfg["transforms"] == [
        "standardize_categories",
        "remove_duplicates",
        "generate_mock_data",
        "seperate_tables",
    ]
    register_reference_stages()

    raw = read_csv(spark, FIXTURE, schema=RAW_PRODUCTS, with_lineage=True)
    outputs, report = run_pipeline({"landing": raw}, cfg["transforms"])
    assert report.summary() == {"total": 1, "success": 1, "error": 0}
    facts = outputs["landing"]
    # facts resolved a dim FK and a surrogate id, raw category is gone
    assert "dim_id" in facts.columns and "original_category" not in facts.columns
    assert facts.count() == 3


REF_RAW_GLOB = "/root/reference/data/raw/*.csv"
REF_PROCESSED = "/root/reference/data/processed"


@pytest.mark.skipif(
    not os.path.exists(REF_RAW), reason="reference checkout absent"
)
def test_full_pipeline_over_reference_raw_zone(spark):
    """The complete reference corpus (4 raw CSVs, 521 rows) through the
    engine's reference-named stages: structural parity with the published
    processed zone — 520 products after dedup (exactly the reference's
    products.csv count: one duplicate removed), the 13 mapping categories
    (+ Others for the documented staging-drift rows), and the image
    explosion within the drift tolerance of product_images.csv."""
    import csv as _csv

    from pyspark.sql import functions as F

    from bytesme_etl_batch_pipeline_spark.operators.dedup import dedup_keep_first
    from bytesme_etl_batch_pipeline_spark.operators.enrich import enrich_products
    from bytesme_etl_batch_pipeline_spark.operators.normalize import snowflake_split

    raw = read_csv(spark, REF_RAW_GLOB, schema=RAW_PRODUCTS, with_lineage=True)
    assert raw.count() == 521

    cat = standardize_categories(
        raw, "product_name", "original_category", BYTESME_RULES, BYTESME_SPECIAL_CASES
    )
    ded = dedup_keep_first(
        cat, keys=["product_name", "product_url"], order_by=["product_url"]
    )
    enr = enrich_products(
        ded.withColumn("price_num", F.col("product_unit_price").try_cast("long")),
        key_col="product_url",
        brand_col="product_brand",
        category_col="category_name",
        price_col="price_num",
    )
    out = snowflake_split(
        enr,
        dim_key="category_name",
        dim_attrs=["product_brand"],
        fact_key="product_url",
        child_url_col="product_image",
        child_name_col="product_image_name",
        order_by=["product_url"],
    )

    with open(f"{REF_PROCESSED}/products.csv", newline="", encoding="utf-8") as f:
        ref_products = len(list(_csv.DictReader(f)))
    assert out.facts.count() == ref_products == 520

    dims = sorted(r["category_name"] for r in out.dims.collect())
    mapping_categories = sorted({c for c, _ in BYTESME_RULES})
    assert dims == sorted(mapping_categories + ["Others"])

    with open(
        f"{REF_PROCESSED}/product_images.csv", newline="", encoding="utf-8"
    ) as f:
        ref_images = len(list(_csv.DictReader(f)))
    n_children = out.children.count()
    # pinned engine value; the small gap vs the snapshot tracks the same
    # mapping drift the categorize golden documents (snapshot predates the
    # published code)
    assert n_children == 1567
    assert abs(n_children - ref_images) <= 10
