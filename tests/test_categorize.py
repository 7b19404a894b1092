"""C1 golden tests with the real Vietnamese rules (SURVEY §2.11, §5) —
table-driven from CATEGORIES_MAPPING semantics, exercising all three cascade
tiers and unicode-safe lower/rlike (SURVEY §7 hard part 6)."""

from __future__ import annotations

from bytesme_etl_batch_pipeline_spark.operators.categorize import (
    BYTESME_RULES,
    BYTESME_SPECIAL_CASES,
    standardize_categories,
)

CASES = [
    # (product_name, original_category, expected)  — tiers annotated
    ("Bánh kem dâu", "Bánh kem", "Cake"),                      # tier 2 exact
    ("Bánh kem dâu", "BÁNH KEM  ", "Cake"),                    # tier 2, case/trim
    ("Trà đào cam sả", "trà sữa", "Tea"),                      # tier 2 exact
    ("Gì đó", "bánh tiệc - bánh sinh nhật, khuyến mãi",
     "Season & Specialist"),                                     # tier 1 special-case
    ("Cà phê sữa đá", "khác", "Coffee"),                        # tier 3 name-regex
    ("Combo cookies bơ", "khuyến mãi lạ", "Pastry"),            # tier 3 name-regex
    ("Nước suối", "không rõ", "Others"),                        # no tier hits
    ("Chocolate đá xay", "đá xay", "Frosty"),                   # tier 2 wins over name regex
]


def test_vietnamese_cascade(spark):
    df = spark.createDataFrame(
        [(n, c) for n, c, _ in CASES], ["product_name", "original_category"]
    )
    out = standardize_categories(
        df,
        name_col="product_name",
        raw_col="original_category",
        rules=BYTESME_RULES,
        special_cases=BYTESME_SPECIAL_CASES,
    )
    got = {
        (r["product_name"]): r["category_name"]
        for r in out.collect()
    }
    # raw column is dropped (reference drops original_category)
    assert "original_category" not in out.columns
    for name, raw, expected in CASES:
        assert got[name] == expected, (name, raw, got[name], expected)


def test_rule_order_is_semantic(spark):
    """First-listed rule must win when several match (dict-order semantics,
    ``standardize_categories.py:62-67``)."""
    df = spark.createDataFrame(
        [("bánh kem trà chocolate", "khác")], ["product_name", "original_category"]
    )
    out = standardize_categories(
        df, "product_name", "original_category", BYTESME_RULES, BYTESME_SPECIAL_CASES
    ).collect()
    # Cake is listed before Tea and Chocolate & Cacao → Cake wins
    assert out[0]["category_name"] == "Cake"
