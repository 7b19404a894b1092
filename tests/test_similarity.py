"""ANN queries have no SQL oracle — validate them against brute force:
results must be a subset of the corpus with correct scores, and recall@10
must be reasonable for the configured pruning aggressiveness."""

from __future__ import annotations

from bytesme_etl_batch_pipeline_spark.plans import queries as catalog


def _topk_ids(df):
    return [r["vec_id"] for r in df.collect()]


def test_ann_lsh_recall(spark, sf_dir):
    exact = _topk_ids(catalog.SPARK_QUERIES["cosine_topk"](spark, sf_dir))
    ann = _topk_ids(catalog.SPARK_QUERIES["ann_lsh_topk"](spark, sf_dir))
    assert len(ann) > 0
    recall = len(set(exact) & set(ann)) / len(exact)
    assert recall >= 0.3, f"LSH recall@10 too low: {recall} ({ann} vs {exact})"
    # query vector itself must always survive pruning (hamming 0)
    assert 0 in ann


def test_ann_ivf_recall(spark, sf_dir):
    exact = _topk_ids(catalog.SPARK_QUERIES["cosine_topk"](spark, sf_dir))
    ann = _topk_ids(catalog.SPARK_QUERIES["ann_ivf_topk"](spark, sf_dir))
    assert len(ann) > 0
    recall = len(set(exact) & set(ann)) / len(exact)
    assert recall >= 0.2, f"IVF recall@10 too low: {recall}"


def test_ann_scores_match_exact(spark, sf_dir):
    """Scores ANN reports must equal brute-force scores for the same ids."""
    exact = {
        r["vec_id"]: r["score"]
        for r in catalog.SPARK_QUERIES["cosine_topk"](spark, sf_dir).collect()
    }
    for r in catalog.SPARK_QUERIES["ann_lsh_topk"](spark, sf_dir).collect():
        if r["vec_id"] in exact:
            assert abs(r["score"] - exact[r["vec_id"]]) < 1e-9
