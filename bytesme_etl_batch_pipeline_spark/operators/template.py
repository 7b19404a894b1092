"""E1 — document templating (SURVEY §2.12).

The reference renders each product row into a Vietnamese description blob
with ~40 conditional sentences (``generate_embeddings.py:39-194``). That is
string assembly over row fields — a pure expression tree of
``when``/``concat_ws`` sections, which Catalyst folds into one projection
(map-side, codegen'd). A pandas UDF would be ~10-100× slower for no gain.

``template_document`` is the generic operator: ordered (condition, fragment)
sections joined with a separator, NULL/absent sections dropped —
``concat_ws`` skips nulls, exactly matching the reference's
append-if-present loop.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def section(cond: Column | None, fragment: Column) -> Column:
    """One conditional sentence: NULL (→ skipped by concat_ws) unless cond."""
    if cond is None:
        return fragment
    return F.when(cond, fragment)


def template_document(sections: list[Column], sep: str = " ") -> Column:
    """Join rendered sections; nulls vanish (reference skips absent fields)."""
    return F.concat_ws(sep, *sections)


def bucket(col: Column, edges: list[tuple[float, str]], default: str) -> Column:
    """Descending-threshold bucket labeling (reference stars 4.5/3.5, orders
    1000, stock 100/20/0 buckets — ``generate_embeddings.py:143-187``)."""
    expr = None
    for threshold, label in edges:
        cond = col >= threshold
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    return expr.otherwise(default) if expr is not None else F.lit(default)


def product_document(
    name: Column,
    brand: Column,
    category: Column,
    description: Column,
    price: Column,
    stars: Column,
    orders: Column,
    stock: Column,
) -> Column:
    """Reference-shaped product document (structure of
    ``generate_embeddings.py:39-194``, English fragments): unconditional
    name/category sections, presence-gated brand/description, bucketed
    stars/orders/stock sentiment sentences."""
    return template_document(
        [
            section(None, F.concat(F.lit("Product: "), name, F.lit("."))),
            section(None, F.concat(F.lit("Category: "), category, F.lit("."))),
            section(
                brand.isNotNull() & (brand != ""),
                F.concat(F.lit("Brand: "), brand, F.lit(".")),
            ),
            section(
                description.isNotNull() & (description != ""),
                F.concat(F.lit("Details: "), description, F.lit(".")),
            ),
            section(
                price.isNotNull() & (price > 0),
                F.concat(F.lit("Price: "), price.cast("long").cast("string"), F.lit(".")),
            ),
            section(
                stars.isNotNull(),
                bucket(
                    stars,
                    [(4.5, "Rated excellent."), (3.5, "Rated good.")],
                    "Rated average.",
                ),
            ),
            section(orders >= 1000, F.lit("A best-seller.")),
            section(
                stock.isNotNull(),
                bucket(
                    stock,
                    [(100.0, "In stock."), (21.0, "Limited stock."), (1.0, "Almost sold out.")],
                    "Out of stock.",
                ),
            ),
        ]
    )
