"""Vietnamese-fidelity E1 golden tests (``generate_embeddings.py:39-194``).

The strongest possible parity evidence: the reference's own
``_create_text_for_embedding`` is ast-extracted from the read-only reference
checkout and executed as the oracle — the Spark operator must reproduce its
output CHARACTER-FOR-CHARACTER over rows covering every conditional branch
(type gates, category sub-sentences, name reinforcement elif, price-JSON
parse/fallback/skip, zip truncation, 1000-char ellipsis, strict-> buckets,
stock ladder). No reference code is copied into the repo; it is loaded at
test time only, and the test skips where the checkout is absent.
"""

from __future__ import annotations

import ast
import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from bytesme_etl_batch_pipeline_spark.operators.template import product_document_vi

REF = "/root/reference/scripts/transform/generate_embeddings.py"

CATEGORY_MAP = {
    1: "Bánh ngọt",
    2: "Bánh kem Pháp",
    3: "Bánh nướng giòn",
    4: "Bánh quy bơ",
    5: "Set quà",
    10: "Trà trái cây",
    11: "Cà phê máy",
    12: "Đá xay frosty",
    13: "Thức uống đá đặc biệt",
}
CATEGORY_DESCRIPTIONS = {
    1: "Các loại bánh ngọt mềm, dùng cho tiệc.",
    11: "Đồ uống cà phê pha máy đậm đà.",
}

LONG_DESC = ("Bánh được làm thủ công từ bột mì hữu cơ và bơ Pháp thượng hạng. " * 30)

# One dict per branch-coverage case; None == absent (pd.notna gate).
ROWS: list[dict] = [
    # drink + tea sub-sentence + JSON price + desc + discount + high stars
    dict(category_id=10, product_name="Trà đào cam sả", product_brand="ByteSme",
         product_description="Trà thơm vị đào.",
         product_unit_price="{'product_sizes': 'S|M|L', 'product_prices': '30000|35000|40000'}",
         product_currency="đ", product_discount_percentage=10.5,
         product_overall_stars=4.7, product_total_ratings=120,
         product_total_orders=1500, product_stock_quantity=150),
    # coffee + plain price + no currency + mid stars + discount 0 (no sentence)
    dict(category_id=11, product_name="Cà phê sữa đá", product_brand=None,
         product_description=None, product_unit_price="45000",
         product_currency=None, product_discount_percentage=0.0,
         product_overall_stars=3.7, product_total_ratings=None,
         product_total_orders=800, product_stock_quantity=50),
    # blended via 'đá xay' + malformed JSON → fallback + low stars + low stock
    dict(category_id=12, product_name="Đá xay socola", product_brand="ByteSme",
         product_description="  ", product_unit_price="{'product_sizes': 'S|M'",
         product_currency="đ", product_discount_percentage=None,
         product_overall_stars=2.0, product_total_ratings=3,
         product_total_orders=12, product_stock_quantity=10),
    # blended via 'thức uống đá' + valid JSON missing keys → NO price sentence
    dict(category_id=13, product_name="Nước đá me", product_brand=None,
         product_description=None, product_unit_price="{'note': 'combo'}",
         product_currency=None, product_discount_percentage=25.0,
         product_overall_stars=None, product_total_ratings=None,
         product_total_orders=None, product_stock_quantity=0),
    # food sweet_cake + >1000-char desc truncation + zip truncation (3 sizes,
    # 2 prices) + boundary stars 5.0
    dict(category_id=1, product_name="Bánh bông lan trứng muối", product_brand="Panacota",
         product_description=LONG_DESC,
         product_unit_price="{'product_sizes': 'S|M|L', 'product_prices': '55000|75000'}",
         product_currency="đ", product_discount_percentage=5.0,
         product_overall_stars=5.0, product_total_ratings=999,
         product_total_orders=1001, product_stock_quantity=101),
    # sweet_cake via 'bánh kem' + boundary stars 4.5 (falls to mid bucket)
    dict(category_id=2, product_name="Bánh kem dâu tây", product_brand="Panacota",
         product_description="Kem tươi phủ dâu.", product_unit_price=None,
         product_currency="đ", product_discount_percentage=None,
         product_overall_stars=4.5, product_total_ratings=77,
         product_total_orders=1000, product_stock_quantity=100),
    # baked_cake + boundary stars 3.5 (falls to low bucket) + stock 21 (mid)
    dict(category_id=3, product_name="Bánh mì hoa cúc", product_brand=None,
         product_description="Giòn rụm.", product_unit_price="89000",
         product_currency="", product_discount_percentage=2.5,
         product_overall_stars=3.5, product_total_ratings=0,
         product_total_orders=0, product_stock_quantity=21),
    # cookie + stock 20 (low) + apostrophe corrupts the naive quote replace
    dict(category_id=4, product_name="Cookie bơ", product_brand="D'Or",
         product_description=None,
         product_unit_price="{'product_sizes': 'It's|M', 'product_prices': '1|2'}",
         product_currency="đ", product_discount_percentage=None,
         product_overall_stars=1.0, product_total_ratings=1,
         product_total_orders=1, product_stock_quantity=20),
    # food id not in category_map → type sentences but no category sentence
    dict(category_id=7, product_name="Món lạ", product_brand=None,
         product_description="x", product_unit_price=None,
         product_currency=None, product_discount_percentage=None,
         product_overall_stars=None, product_total_ratings=None,
         product_total_orders=None, product_stock_quantity=None),
    # no category_id → food reinforcement via name keyword 'bánh'
    dict(category_id=None, product_name="Bánh mì quê", product_brand="SiteB",
         product_description=None, product_unit_price=None,
         product_currency=None, product_discount_percentage=None,
         product_overall_stars=None, product_total_ratings=None,
         product_total_orders=None, product_stock_quantity=None),
    # no category_id → drink reinforcement via name keyword 'nước'
    dict(category_id=None, product_name="Nước ép cam", product_brand=None,
         product_description=None, product_unit_price=None,
         product_currency=None, product_discount_percentage=None,
         product_overall_stars=None, product_total_ratings=None,
         product_total_orders=None, product_stock_quantity=None),
    # name absent → no name/reinforcement sentences, brand still renders
    dict(category_id=0, product_name=None, product_brand="NoName Co",
         product_description=None, product_unit_price=None,
         product_currency=None, product_discount_percentage=None,
         product_overall_stars=None, product_total_ratings=None,
         product_total_orders=None, product_stock_quantity=None),
    # empty-string name still renders (pd.notna('') is True)
    dict(category_id=5, product_name="", product_brand=None,
         product_description="", product_unit_price=None,
         product_currency=None, product_discount_percentage=None,
         product_overall_stars=0.0, product_total_ratings=None,
         product_total_orders=None, product_stock_quantity=None),
    # multi-line scraped description: str.strip() semantics (trailing
    # \n/\t removed before the 1000-char window), interior newline kept
    dict(category_id=2, product_name="Bánh cuộn kem", product_brand=None,
         product_description="\n  Dòng 1.\nDòng 2.\t\n",
         product_unit_price=None, product_currency=None,
         product_discount_percentage=None, product_overall_stars=None,
         product_total_ratings=None, product_total_orders=None,
         product_stock_quantity=None),
    # tab/newline-only description must vanish entirely (strip -> empty)
    dict(category_id=2, product_name="Bánh trống", product_brand=None,
         product_description="\t\n", product_unit_price=None,
         product_currency=None, product_discount_percentage=None,
         product_overall_stars=None, product_total_ratings=None,
         product_total_orders=None, product_stock_quantity=None),
]

SCHEMA = StructType(
    [
        StructField("id", IntegerType()),
        StructField("category_id", IntegerType()),
        StructField("category_name", StringType()),
        StructField("category_desc", StringType()),
        StructField("product_name", StringType()),
        StructField("product_brand", StringType()),
        StructField("product_description", StringType()),
        StructField("product_unit_price", StringType()),
        StructField("product_currency", StringType()),
        StructField("product_discount_percentage", DoubleType()),
        StructField("product_overall_stars", DoubleType()),
        StructField("product_total_ratings", LongType()),
        StructField("product_total_orders", LongType()),
        StructField("product_stock_quantity", LongType()),
    ]
)


def _spark_documents(spark) -> dict[int, str]:
    rows = [
        (
            i,
            r["category_id"],
            CATEGORY_MAP.get(r["category_id"]),
            CATEGORY_DESCRIPTIONS.get(r["category_id"]),
            r["product_name"],
            r["product_brand"],
            r["product_description"],
            r["product_unit_price"],
            r["product_currency"],
            r["product_discount_percentage"],
            r["product_overall_stars"],
            r["product_total_ratings"],
            r["product_total_orders"],
            r["product_stock_quantity"],
        )
        for i, r in enumerate(ROWS)
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    doc = product_document_vi(
        category_id=F.col("category_id"),
        category_name=F.col("category_name"),
        name=F.col("product_name"),
        brand=F.col("product_brand"),
        description=F.col("product_description"),
        unit_price=F.col("product_unit_price"),
        currency=F.col("product_currency"),
        discount=F.col("product_discount_percentage"),
        stars=F.col("product_overall_stars"),
        ratings=F.col("product_total_ratings"),
        orders=F.col("product_total_orders"),
        stock=F.col("product_stock_quantity"),
        category_description=F.col("category_desc"),
    )
    return {r["id"]: r["document"] for r in df.select("id", doc.alias("document")).collect()}


def _load_reference_renderer():
    """ast-extract ``_create_text_for_embedding`` (no module import — the
    reference's top-level imports need psycopg2 etc. absent here)."""
    import pandas as pd

    with open(REF, encoding="utf-8") as f:
        tree = ast.parse(f.read())
    fn = next(
        n
        for n in tree.body
        if isinstance(n, ast.FunctionDef) and n.name == "_create_text_for_embedding"
    )
    ns: dict = {"pd": pd, "json": json}
    exec(compile(ast.Module(body=[fn], type_ignores=[]), REF, "exec"), ns)
    return ns["_create_text_for_embedding"]


@pytest.mark.skipif(not os.path.exists(REF), reason="reference checkout absent")
def test_parity_with_reference_renderer(spark):
    render = _load_reference_renderer()
    got = _spark_documents(spark)
    for i, row in enumerate(ROWS):
        product = {k: v for k, v in row.items() if v is not None}
        # keep explicit Nones too — pd.notna handles them like the CSV NaNs
        product = dict(row)
        expected = render(product, CATEGORY_MAP, CATEGORY_DESCRIPTIONS)
        assert got[i] == expected, (i, row["product_name"], got[i], expected)


def test_standalone_spot_checks(spark):
    """Reference-free assertions so the suite keeps teeth without the
    checkout: exact opening/closing reinforcement, price enumeration with
    Python-zip truncation, 1000-char ellipsis, strict-> star buckets."""
    got = _spark_documents(spark)
    assert got[0].startswith(
        "ĐÂY LÀ THỨC UỐNG. Đây là một loại đồ uống, không phải loại bánh ăn được. "
        "Sản phẩm này thuộc nhóm đồ uống giải khát. "
        "Sản phẩm thuộc danh mục Trà trái cây."
    )
    assert (
        "Sản phẩm có nhiều size với nhiều mức giá khác nhau: "
        "S for đ30000, M for đ35000, L for đ40000." not in got[0]
    )  # reference adds no trailing period after the enumeration
    assert "S for đ30000, M for đ35000, L for đ40000" in got[0]
    assert "Sản phẩm đang được giảm giá 10.5%." in got[0]
    assert "Sản phẩm này được đánh giá rất cao với 4.7 sao trên 5." in got[0]
    assert got[0].endswith(
        "Sản phẩm này là THỨC UỐNG. Dùng để giải khát, không phải để ăn. "
        "Đây là đồ UỐNG, không phải đồ ĂN."
    )
    # zip truncation: 3 sizes × 2 prices → exactly 2 pairs
    assert "S for đ55000, M for đ75000" in got[4]
    assert "L for " not in got[4]
    # 1000-char ellipsis on the stripped description
    desc_part = got[4].split("Mô tả sản phẩm: ", 1)[1]
    assert desc_part.startswith(LONG_DESC[:100])
    assert "..." in desc_part[:1004]
    # malformed JSON falls back to the verbatim-string sentence
    assert "Giá bán của sản phẩm {'product_sizes': 'S|M' đ." in got[2]
    # valid JSON without both keys produces NO price sentence
    assert "Giá bán" not in got[3] and "nhiều size" not in got[3]
    # strict >: stars 4.5 → mid bucket, 3.5 → low bucket
    assert "Sản phẩm này được đánh giá tốt với 4.5 sao trên 3.5." in got[5]
    assert "Sản phẩm này có số điểm đánh giá là 3.5." in got[6]
    # orders 1000 is NOT a best-seller (strict >), 1001 is
    assert "Sản phẩm đã bán được 1000 đơn hàng." in got[5]
    assert "Đây là sản phẩm bán chạy với hơn 1001 lượt đặt hàng." in got[4]
    # stock ladder boundaries: 101 high, 100/21 mid, 20 low, 0 out
    assert "còn nhiều hàng và sẵn sàng để giao" in got[4]
    assert "hiện đang có sẵn trong kho" in got[5] and "hiện đang có sẵn trong kho" in got[6]
    assert "chỉ còn lại một số lượng ít" in got[7]
    assert "hiện đang hết hàng" in got[3]
