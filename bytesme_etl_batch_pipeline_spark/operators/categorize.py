"""C1 — rule-based category standardization (SURVEY §2.11).

The reference classifies each product by a 3-tier cascade
(``scripts/transform/standardize_categories.py:38-72``):

1. special-case substring match on the raw category;
2. exact match of the lowercased raw category against a mapping dict;
3. fallback: regex search of the *product name* against each category's
   alternation pattern, first hit wins in dict order; else a default.

Rules are DATA here (list of (category, variants)), compiled into one ordered
``when``-chain of pure Column predicates — rule order is semantic and
preserved. Catalyst folds the whole cascade into a single projection: no UDF,
no join, no shuffle; at 100 TB this runs map-side at scan speed.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def build_rule_cascade(
    name_col: str,
    raw_col: str,
    rules: list[tuple[str, list[str]]],
    special_cases: list[tuple[str, str]] | None = None,
    default: str = "Others",
) -> Column:
    """Compile the 3-tier cascade into one Column expression.

    ``rules``: ordered (canonical_category, [raw_variant, ...]).
    ``special_cases``: ordered (substring_of_raw, canonical_category) —
    tier 1, checked before everything else.
    Tier 2 = exact lowercase match on ``raw_col`` variants.
    Tier 3 = case-insensitive regex of escaped variants against ``name_col``.
    """
    raw = F.lower(F.trim(F.col(raw_col)))
    name = F.col(name_col)

    expr: Column | None = None

    def chain(cond: Column, value: str):
        nonlocal expr
        expr = F.when(cond, F.lit(value)) if expr is None else expr.when(cond, F.lit(value))

    for needle, cat in special_cases or []:
        chain(raw.contains(needle.lower()), cat)
    for cat, variants in rules:
        lowered = [v.lower() for v in variants]
        chain(raw.isin(lowered), cat)
    for cat, variants in rules:
        pattern = "(?i)" + "|".join(re.escape(v) for v in variants)
        chain(name.rlike(pattern), cat)
    assert expr is not None, "rule cascade needs at least one rule"
    return expr.otherwise(F.lit(default))


def standardize_categories(
    df: DataFrame,
    name_col: str,
    raw_col: str,
    rules: list[tuple[str, list[str]]],
    special_cases: list[tuple[str, str]] | None = None,
    default: str = "Others",
    out_col: str = "category_name",
) -> DataFrame:
    """C1 as a DataFrame op: project the cascade, drop the raw column
    (reference drops ``original_category`` after mapping,
    ``scripts/pipeline.py:58-63``)."""
    return df.withColumn(
        out_col, build_rule_cascade(name_col, raw_col, rules, special_cases, default)
    ).drop(raw_col)


# The reference's mapping dict re-expressed as ordered rules data
# (``standardize_categories.py:10-36``; the missing-comma typo at :11-12 is
# fixed to two entries per SURVEY §2.11 — intent, not typo, is replicated).
BYTESME_RULES: list[tuple[str, list[str]]] = [
    ("Cake", ["bánh kem", "bánh sinh nhật", "bánh flan gato", "gato cắt miếng/cupcake"]),
    ("Bread", ["bánh mì", "bánh mặn"]),
    ("Pastry", ["bánh ngọt", "bánh âu", "cookies"]),
    ("Coffee", ["cà phê", "coffee"]),
    ("Tea", ["trà", "trà sữa"]),
    ("Chocolate & Cacao", ["chocolate", "cacao"]),
    ("Frosty", ["đá xay", "frosty"]),
    ("Season & Specialist", ["bánh tiệc - bánh sinh nhật", "seasonal"]),
]

BYTESME_SPECIAL_CASES: list[tuple[str, str]] = [
    ("bánh tiệc - bánh sinh nhật", "Season & Specialist"),
]
