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


# ---------------------------------------------------------------------------
# Vietnamese-fidelity E1 — the reference's exact sentence set
# (``generate_embeddings.py:39-194``), re-expressed as sections data over the
# same pure-expression engine. Every literal below is the reference's own
# output string; the conditions replicate its control flow:
#   - drink/food type from category_id membership (:43-54)
#   - category + optional description sentences (:58-66)
#   - per-category sub-sentences on substring of the LOWERED category (:68-86)
#   - name sentence + drink/food reinforcement by name keywords (:88-103)
#   - description strip + 1000-char ellipsis truncation (:105-109)
#   - unit-price: single-quote JSON parse (bare quote replace, NOT
#     apostrophe-safe — fidelity over tolerance), size/price zip enumeration
#     truncating to the shorter list like Python ``zip`` (:111-129)
#   - discount > 0 gate (:131-137), stars/orders buckets with STRICT >
#     comparisons (:143-170), stock ladder (:175-187), closing type
#     reinforcement (:189-192).
# ---------------------------------------------------------------------------

DRINK_CATEGORY_IDS = [10, 11, 12, 13]
FOOD_CATEGORY_IDS = [1, 2, 3, 4, 5, 6, 7, 8, 9]

_DRINK_NAME_TERMS = ["cà phê", "coffee", "trà", "tea", "đá xay", "drink", "nước"]
_FOOD_NAME_TERMS = ["bánh", "cake", "pastry", "cookie", "bread"]

VI = {
    "drink_open": "ĐÂY LÀ THỨC UỐNG. Đây là một loại đồ uống, không phải loại bánh ăn được. Sản phẩm này thuộc nhóm đồ uống giải khát.",
    "food_open": "ĐÂY LÀ MÓN ĂN hoặc BÁNH. Đây là đồ ăn, không phải đồ uống. Sản phẩm này thuộc nhóm thực phẩm ăn được.",
    "tea": "Đây là đồ uống trà thơm ngon, thích hợp giải khát. Trà là thức uống, không phải bánh. Đây là thức uống giúp tỉnh táo, thư giãn.",
    "coffee": "Đây là đồ uống cà phê đậm đà. Cà phê là thức uống, không phải bánh. Đây là thức uống giúp tỉnh táo, tăng năng lượng.",
    "blended": "Đây là đồ uống đá xay mát lạnh, thích hợp giải nhiệt mùa hè. Đây là thức uống, không phải bánh.",
    "sweet_cake": "Đây là bánh ngọt mềm mịn, thơm phức. Bánh ngọt là đồ ăn, không phải đồ uống. Bánh ngọt có vị ngọt, mềm và không dùng để uống.",
    "baked_cake": "Đây là bánh giòn, nướng vàng thơm phức. Bánh nướng là đồ ăn, không phải đồ uống. Bánh có độ giòn, vị mặn hoặc ngọt và không dùng để uống.",
    "cookie": "Đây là bánh quy giòn tan, thơm mùi bơ. Bánh quy là đồ ăn, không phải đồ uống. Bánh quy có độ giòn và không dùng để uống.",
    "name_drink": "Đây là thức uống, không phải bánh ăn được.",
    "name_food": "Đây là bánh ăn được, không phải thức uống.",
    "drink_close": "Sản phẩm này là THỨC UỐNG. Dùng để giải khát, không phải để ăn. Đây là đồ UỐNG, không phải đồ ĂN.",
    "food_close": "Sản phẩm này là BÁNH hoặc MÓN ĂN. Dùng để ăn, không phải để uống. Đây là đồ ĂN, không phải đồ UỐNG.",
    "stock_high": "Sản phẩm này còn nhiều hàng và sẵn sàng để giao.",
    "stock_mid": "Sản phẩm này hiện đang có sẵn trong kho.",
    "stock_low": "Sản phẩm này chỉ còn lại một số lượng ít.",
    "stock_out": "Sản phẩm này hiện đang hết hàng.",
}


def _contains_any(lowered: Column, terms: list[str]) -> Column:
    cond = lowered.contains(terms[0])
    for t in terms[1:]:
        cond = cond | lowered.contains(t)
    return cond


def product_document_vi(
    category_id: Column,
    category_name: Column,
    name: Column,
    brand: Column,
    description: Column,
    unit_price: Column,
    currency: Column,
    discount: Column,
    stars: Column,
    ratings: Column,
    orders: Column,
    stock: Column,
    category_description: Column | None = None,
) -> Column:
    """The reference's ``_create_text_for_embedding`` as one Column.

    Field gates mirror ``pd.notna`` (NULL-only — an empty string still
    renders, as in the reference). ``category_name`` NULL means "not in the
    category_map"; the lowered copy drives the sub-sentence substring tests.
    Numeric sentence interpolations format via CAST(… AS STRING), which for
    doubles matches Python ``str(float)`` shortest-repr on round-trippable
    values (both sides print ``4.7``/``10.5``).
    """
    # Two-valued (coalesced) type predicates: a NULL category_id must behave
    # exactly like Python's ``product_type is None`` — False in every gate,
    # including under negation in the elif-shaped reinforcement below.
    is_drink = F.coalesce(category_id.isin(DRINK_CATEGORY_IDS), F.lit(False))
    is_food = F.coalesce(category_id.isin(FOOD_CATEGORY_IDS), F.lit(False))
    # reference: category = '' when id absent from the map (:56-61)
    cat_lower = F.coalesce(F.lower(category_name), F.lit(""))
    name_lower = F.lower(name)

    # --- unit-price section (:111-129) -----------------------------------
    cur = F.coalesce(currency, F.lit(""))
    is_jsonish = unit_price.startswith("{")
    # Fidelity: the reference does a BARE replace("'", '"') (:118) — an
    # apostrophe inside a value corrupts the JSON and falls to the except
    # branch. normalize_quoted_json would be more tolerant; not used here.
    fixed = F.regexp_replace(unit_price, "'", '"')
    parsed = F.from_json(fixed, "map<string,string>")
    has_keys = F.map_contains_key(parsed, "product_sizes") & F.map_contains_key(
        parsed, "product_prices"
    )
    sizes = F.split(parsed["product_sizes"], r"\|")
    prices = F.split(parsed["product_prices"], r"\|")
    # Python zip truncates to the shorter list; zip_with pads with NULL —
    # slice both to the common length first.
    n = F.least(F.size(sizes), F.size(prices))
    pairs = F.zip_with(
        F.slice(sizes, 1, n),
        F.slice(prices, 1, n),
        lambda s, p: F.concat(s, F.lit(" for "), cur, p),
    )
    enumeration = F.concat(
        F.lit("Sản phẩm có nhiều size với nhiều mức giá khác nhau: "),
        F.array_join(pairs, ", "),
    )
    # f"Giá bán của sản phẩm {price_info} {currency}." — note the space
    # before the (possibly empty) currency, kept verbatim (:127-129)
    price_fallback = F.concat(
        F.lit("Giá bán của sản phẩm "), unit_price, F.lit(" "), cur, F.lit(".")
    )
    price_sentence = F.when(
        is_jsonish,
        F.when(parsed.isNull(), price_fallback).when(has_keys, enumeration),
        # valid JSON without both keys → no sentence (reference has no else)
    ).otherwise(price_fallback)

    # --- popularity buckets (strict >, :143-170) --------------------------
    stars_s = stars.cast("string")
    stars_sentence = (
        F.when(
            stars > 4.5,
            F.concat(
                F.lit("Sản phẩm này được đánh giá rất cao với "),
                stars_s,
                F.lit(" sao trên 5."),
            ),
        )
        .when(
            stars > 3.5,
            F.concat(
                F.lit("Sản phẩm này được đánh giá tốt với "),
                stars_s,
                F.lit(" sao trên 3.5."),
            ),
        )
        .otherwise(
            F.concat(F.lit("Sản phẩm này có số điểm đánh giá là "), stars_s, F.lit("."))
        )
    )
    orders_s = orders.cast("long").cast("string")
    # Python str.strip() twin: F.trim strips SPACES only, but the reference
    # strips all whitespace (multi-line scraped descriptions are real —
    # trailing \n/\t shift the 1000-char window and a "\t\n" description
    # must vanish entirely). Explicit ASCII class so Spark, DuckDB (RE2)
    # and Python agree.
    _ws = "[ \\t\\n\\r\\f\\x0B]+"
    desc_stripped = F.regexp_replace(
        F.regexp_replace(description, "^" + _ws, ""), _ws + "$", ""
    )
    orders_sentence = F.when(
        orders > 1000,
        F.concat(
            F.lit("Đây là sản phẩm bán chạy với hơn "), orders_s, F.lit(" lượt đặt hàng.")
        ),
    ).otherwise(F.concat(F.lit("Sản phẩm đã bán được "), orders_s, F.lit(" đơn hàng.")))

    return template_document(
        [
            # opening type sentence (:49-54)
            section(is_drink, F.lit(VI["drink_open"])),
            section(~is_drink & is_food, F.lit(VI["food_open"])),
            # category + its description (:58-66)
            section(
                category_name.isNotNull(),
                F.concat(F.lit("Sản phẩm thuộc danh mục "), category_name, F.lit(".")),
            ),
            *(
                [
                    section(
                        category_name.isNotNull() & category_description.isNotNull(),
                        F.concat(F.lit("Về danh mục này: "), category_description),
                    )
                ]
                if category_description is not None
                else []
            ),
            # drink sub-sentences — independent ifs, several can fire (:68-76)
            section(is_drink & cat_lower.contains("trà"), F.lit(VI["tea"])),
            section(is_drink & cat_lower.contains("cà phê"), F.lit(VI["coffee"])),
            section(
                is_drink
                & (cat_lower.contains("đá xay") | cat_lower.contains("thức uống đá")),
                F.lit(VI["blended"]),
            ),
            # food sub-sentences (:78-86)
            section(
                is_food
                & (cat_lower.contains("bánh ngọt") | cat_lower.contains("bánh kem")),
                F.lit(VI["sweet_cake"]),
            ),
            section(
                is_food
                & (
                    cat_lower.contains("bánh giòn")
                    | cat_lower.contains("bánh nướng")
                    | cat_lower.contains("bánh ngàn lớp")
                ),
                F.lit(VI["baked_cake"]),
            ),
            section(is_food & cat_lower.contains("bánh quy"), F.lit(VI["cookie"])),
            # name + reinforcement (reinforcement only when the name is
            # present — it lives inside the name gate, :88-97)
            section(
                name.isNotNull(),
                F.concat(F.lit("Sản phẩm có tên gọi "), name, F.lit(".")),
            ),
            section(
                name.isNotNull()
                & (is_drink | _contains_any(name_lower, _DRINK_NAME_TERMS)),
                F.lit(VI["name_drink"]),
            ),
            section(
                name.isNotNull()
                & ~(is_drink | _contains_any(name_lower, _DRINK_NAME_TERMS))
                & (is_food | _contains_any(name_lower, _FOOD_NAME_TERMS)),
                F.lit(VI["name_food"]),
            ),
            # brand (:99-100)
            section(
                brand.isNotNull(),
                F.concat(F.lit("Thương hiệu của sản phẩm "), brand, F.lit(".")),
            ),
            # description, stripped + ellipsis-truncated at 1000 (:105-109)
            section(
                description.isNotNull() & (desc_stripped != ""),
                F.concat(
                    F.lit("Mô tả sản phẩm: "),
                    F.when(
                        F.length(desc_stripped) > 1000,
                        F.concat(F.substring(desc_stripped, 1, 1000), F.lit("...")),
                    ).otherwise(desc_stripped),
                ),
            ),
            # unit price (:111-129)
            section(unit_price.isNotNull(), price_sentence),
            # discount (:131-137)
            section(
                discount > 0,
                F.concat(
                    F.lit("Sản phẩm đang được giảm giá "),
                    discount.cast("string"),
                    F.lit("%."),
                ),
            ),
            # popularity (:143-170)
            section(stars.isNotNull(), stars_sentence),
            section(
                ratings.isNotNull(),
                F.concat(
                    F.lit("Sản phẩm có tổng số lượt "),
                    ratings.cast("long").cast("string"),
                    F.lit(" khách hàng đánh giá."),
                ),
            ),
            section(orders.isNotNull(), orders_sentence),
            # stock ladder (:175-187)
            section(
                stock.isNotNull(),
                F.when(stock > 100, F.lit(VI["stock_high"]))
                .when(stock > 20, F.lit(VI["stock_mid"]))
                .when(stock > 0, F.lit(VI["stock_low"]))
                .otherwise(F.lit(VI["stock_out"])),
            ),
            # closing reinforcement (:189-192)
            section(is_drink, F.lit(VI["drink_close"])),
            section(~is_drink & is_food, F.lit(VI["food_close"])),
        ]
    )


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
