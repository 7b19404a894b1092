"""Property-based tests (hypothesis) for invariants that example-based tests
under-cover: randomized corpora through segment dedup, arbitrary key sets
through the Bloom path, and tokenizer parity with the Python reference.

Spark jobs are expensive per example, so each property batches one generated
dataset per example and runs few examples; the generators bias toward
collision-heavy small alphabets — the regime where dedup/Bloom logic can go
wrong silently.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from bytesme_etl_batch_pipeline_spark.operators.bloom import (
    bloom_prefiltered_anti_join,
    build_bloom,
)
from bytesme_etl_batch_pipeline_spark.operators.neardup import segment_dedup
from bytesme_etl_batch_pipeline_spark.operators.textops import words

# Tiny alphabet → heavy cross-doc collisions, the interesting regime.
_WORD = st.sampled_from(["alpha", "beta", "gamma", "delta", "x1", "y2"])
_DOC = st.lists(_WORD, min_size=0, max_size=24).map(" ".join)
_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


@given(texts=st.lists(_DOC, min_size=1, max_size=12))
@_SETTINGS
def test_segment_dedup_invariants(spark, texts):
    """For ANY corpus: (1) every segment text survives exactly once across
    the whole output; (2) per-doc kept+dropped equals the doc's segment
    count; (3) surviving text is a concatenation of the doc's own segments
    in order."""
    seg_w = 4
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    out = {r.doc_id: r for r in segment_dedup(docs, seg_words=seg_w).collect()}

    # reference segmentation (python twin of the operator's spec)
    def segs(t):
        ws = t.split()
        return [" ".join(ws[i : i + seg_w]) for i in range(0, len(ws), seg_w)]

    seen = set()
    for i, t in enumerate(texts):
        expect_all = segs(t)
        kept = [s for s in expect_all if s not in seen]
        seen.update(expect_all)
        assert out[i].clean_text == " ".join(kept)
        assert out[i].n_kept == len(kept)
        assert out[i].n_dropped == len(expect_all) - len(kept)

    # global uniqueness: no segment text survives in two docs' outputs
    flat = [
        s
        for i in range(len(texts))
        if out[i].clean_text
        for s in segs(out[i].clean_text)
    ]
    assert len(flat) == len(set(flat))


@given(
    members=st.lists(st.text(alphabet="abcdef", min_size=1, max_size=6), max_size=40),
    probes=st.lists(st.text(alphabet="abcdef", min_size=1, max_size=6), max_size=40),
)
@_SETTINGS
def test_bloom_anti_join_always_exact(spark, members, probes):
    """For ANY forbidden set and ANY probe set (overlapping or not), the
    Bloom-prefiltered anti-join equals the plain anti-join — fpp shows up
    only as extra verification work, never in the result."""
    big = spark.createDataFrame([(p,) for p in probes] or [("__none__",)], "k string")
    forbidden = spark.createDataFrame(
        [(m,) for m in members] or [("__never__",)], "k string"
    )
    got = sorted(
        r.k
        for r in bloom_prefiltered_anti_join(
            big, forbidden, "k", expected_items=max(1, len(members))
        ).collect()
    )
    want = sorted(r.k for r in big.join(forbidden, "k", "left_anti").collect())
    assert got == want


@given(members=st.lists(st.text(min_size=0, max_size=8), min_size=1, max_size=50))
@_SETTINGS
def test_bloom_never_false_negative(spark, members):
    """Membership probes over the exact build set always answer yes —
    including empty strings and unicode keys."""
    df = spark.createDataFrame([(m,) for m in members], "k string")
    bloom = build_bloom(df, "k", expected_items=len(members), fpp=0.05)
    from bytesme_etl_batch_pipeline_spark.operators.bloom import bloom_might_contain

    flags = df.select(bloom_might_contain(df, bloom, "k").alias("hit")).collect()
    assert all(r.hit for r in flags)


@given(texts=st.lists(st.text(alphabet=" \t\nabcXYZ0.!", max_size=30), min_size=1, max_size=20))
@_SETTINGS
def test_words_matches_python_split(spark, texts):
    """The engine's tokenizer (split on \\s+, drop empties, lowercase) must
    agree with Python's str.split() reference on ASCII corpora — the
    contract every DuckDB oracle's word-split twin assumes."""
    df = spark.createDataFrame(list(enumerate(texts)), "i long, t string")
    got = {r.i: r.ws for r in df.select("i", words("t").alias("ws")).collect()}
    for i, t in enumerate(texts):
        assert got[i] == t.lower().split()
