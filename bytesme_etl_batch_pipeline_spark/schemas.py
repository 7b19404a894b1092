"""Explicit StructType schemas (SURVEY §1; reference DDL is source of truth).

The reference infers CSV dtypes and patches them with defensive casts
(``scripts/pipeline.py:48``, ``scripts/transform/seperate_tables.py:69-74``).
Here every table has a declared schema; inference is the exception.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Wide scraped product table — reference raw CSV header
# (``data/raw/bingsu_products.csv:1``) + ProductInfo dataclass types
# (``scripts/extract/products_scraping.py:25-44``).
RAW_PRODUCTS = StructType(
    [
        StructField("product_name", StringType(), False),
        StructField("product_url", StringType(), True),
        StructField("product_brand", StringType(), True),
        StructField("original_category", StringType(), True),
        StructField("product_image", StringType(), True),  # pipe-delimited urls
        StructField("product_image_type", IntegerType(), True),
        StructField("product_image_name", StringType(), True),  # pipe-delimited
        StructField("product_code", StringType(), True),
        StructField("product_description", StringType(), True),
        StructField("product_unit_price", StringType(), True),  # int | 0 | quoted-JSON
        StructField("product_currency", StringType(), True),
        StructField("product_discount_percentage", DoubleType(), True),
        StructField("product_total_orders", IntegerType(), True),
        StructField("product_stock_quantity", IntegerType(), True),
        StructField("product_total_ratings", IntegerType(), True),
        StructField("product_overall_stars", DoubleType(), True),
    ]
)

# Normalized outputs of the snowflake split (reference DDL
# ``database/bytesme_psql_schema.sql:7-42``).
CATEGORIES = StructType(
    [
        StructField("category_id", IntegerType(), False),
        StructField("category_name", StringType(), False),
        StructField("category_background_url", StringType(), True),
        StructField("category_type", IntegerType(), True),
        StructField("category_description", StringType(), True),
        StructField("created_at", TimestampType(), True),
        StructField("updated_at", TimestampType(), True),
    ]
)

PRODUCTS = StructType(
    [
        StructField("product_id", LongType(), False),
        StructField("category_id", IntegerType(), True),
        StructField("product_code", StringType(), True),
        StructField("product_name", StringType(), False),
        StructField("product_description", StringType(), True),
        StructField("product_band", StringType(), True),  # sic — reference CSV name
        StructField("product_discount_percentage", DoubleType(), True),
        StructField("product_unit_price", StringType(), True),  # JSON string
        StructField("product_total_orders", IntegerType(), True),
        StructField("product_total_ratings", IntegerType(), True),
        StructField("product_overall_stars", DoubleType(), True),
        StructField("product_stock_quantity", IntegerType(), True),
        StructField("created_at", TimestampType(), True),
        StructField("updated_at", TimestampType(), True),
    ]
)

PRODUCT_IMAGES = StructType(
    [
        StructField("product_image_url_id", LongType(), False),
        StructField("product_id", LongType(), True),
        StructField("product_image_url", StringType(), True),
        StructField("product_image_name", StringType(), True),
        StructField("product_image_type", IntegerType(), True),
        StructField("created_at", TimestampType(), True),
        StructField("updated_at", TimestampType(), True),
    ]
)

# Nested size/price struct hiding inside product_unit_price
# (``scripts/transform/seperate_tables.py:41-44``).
UNIT_PRICE = StructType(
    [
        StructField("product_sizes", StringType(), True),
        StructField("product_prices", StringType(), True),
    ]
)

# Document + embedding shapes (``generate_embeddings.py:235-240,301-317``).
DOCUMENTS = StructType(
    [
        StructField("product_code", StringType(), True),
        StructField("document", StringType(), False),
        StructField("cmetadata", MapType(StringType(), StringType()), True),
    ]
)

EMBEDDINGS = StructType(
    [
        StructField("id", StringType(), False),
        StructField("collection_id", StringType(), True),
        StructField("embedding", ArrayType(FloatType()), False),
        StructField("document", StringType(), True),
        StructField("cmetadata", MapType(StringType(), StringType()), True),
    ]
)

# Multimodal column convention: payload is opaque binary + typed metadata
# (engine extension — SURVEY §0 "LLM-data-pipeline operators").
MEDIA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", StringType(), True),  # BinaryType in real data
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)
