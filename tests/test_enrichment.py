"""Property tests for non-oracle enrichment (SURVEY §5: distribution bounds
from ``generate_mock_data.py:18-40`` + seeded determinism)."""

from __future__ import annotations

from bytesme_etl_batch_pipeline_spark.plans import queries as catalog


def test_stars_beta_bounds_and_determinism(spark, sf_dir):
    rows1 = catalog.SPARK_QUERIES["stars_beta"](spark, sf_dir).collect()
    assert len(rows1) > 0
    for r in rows1:
        assert 1.0 <= r["stars_mock"] <= 5.0
        # one-decimal rounding contract
        assert abs(r["stars_mock"] * 10 - round(r["stars_mock"] * 10)) < 1e-9
    # seeded: a second run is bit-identical
    rows2 = catalog.SPARK_QUERIES["stars_beta"](spark, sf_dir).collect()
    assert sorted(map(tuple, rows1)) == sorted(map(tuple, rows2))
    # skewed-high: Beta(4,1.5) mean ≈ 0.727 → stars mean ≈ 3.9
    mean = sum(r["stars_mock"] for r in rows1) / len(rows1)
    assert 3.5 < mean < 4.3


def test_discount_distribution(spark, sf_dir):
    rows = catalog.SPARK_QUERIES["seeded_enrichment"](spark, sf_dir).collect()
    zero = sum(1 for r in rows if r["discount"] == 0)
    nonzero = [r["discount"] for r in rows if r["discount"] != 0]
    assert all(5 <= d < 50 for d in nonzero)
    # ~30% nonzero rate (loose bound for 200 parts)
    assert 0.1 < len(nonzero) / len(rows) < 0.5
    assert zero + len(nonzero) == len(rows)
    for r in rows:
        assert 0 <= r["orders_mock"] < 500
        assert 80_000 <= r["price_default"] < 220_000


def test_ratings_power_law(spark, sf_dir):
    rows = catalog.SPARK_QUERIES["ratings_exponential"](spark, sf_dir).collect()
    vals = [r["ratings_mock"] for r in rows]
    assert all(v >= 1 for v in vals)
    mean = sum(vals) / len(vals)
    assert 30 < mean < 75  # Exp(50) + 1


def test_split_is_stable_under_corpus_growth(spark, sf_dir):
    """A doc's split assignment must not change when the corpus grows —
    the core property hash-splits have and random splits lack."""
    from pyspark.sql import functions as F

    from bytesme_etl_batch_pipeline_spark.operators.sampling import train_val_test_split
    from bytesme_etl_batch_pipeline_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    full = {
        r["doc_id"]: r["split"]
        for r in train_val_test_split(d, "doc_id", seed="s").collect()
    }
    subset = {
        r["doc_id"]: r["split"]
        for r in train_val_test_split(d.filter(F.col("doc_id") < 100), "doc_id", seed="s").collect()
    }
    for doc_id, split in subset.items():
        assert full[doc_id] == split
    # fractions roughly honored
    from collections import Counter

    c = Counter(full.values())
    n = sum(c.values())
    assert 0.7 < c["train"] / n < 0.9
    assert 0.05 < c["val"] / n < 0.15
    assert 0.05 < c["test"] / n < 0.15
