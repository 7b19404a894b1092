"""Junk-input robustness for the round-2 corpus operators (the round-1
ADVICE lesson: ANSI mode is on, so empty/NULL junk — exactly what corpus
operators exist to screen — must produce defined results, not
DIVIDE_BY_ZERO/CAST errors)."""

from __future__ import annotations

from pyspark.sql import functions as F

JUNK = [
    (1, None, None, "src0", None),
    (2, "", "en", "src0", 0),
    (3, "   \t  ", "vi", "src1", 6),
    (4, "chỉ một từ", "vi", "src1", 10),
    (5, "!!! ??? ###", "en", "src1", 11),
]
SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _df(spark):
    return spark.createDataFrame(JUNK, SCHEMA)


def test_repetition_signals_skip_wordless_docs(spark):
    words = F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda w: w != "")
    per_word = (
        _df(spark)
        .select("doc_id", F.explode(words).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    out = per_word.groupBy("doc_id").agg(
        F.round(F.count(F.lit(1)) / F.sum("cnt"), 6).alias("distinct_ratio")
    )
    got = {r["doc_id"]: r["distinct_ratio"] for r in out.collect()}
    # NULL/empty/whitespace docs have no words → no row, no division error
    assert set(got) == {4, 5}
    assert got[4] == 1.0


def test_pii_redact_null_text_stays_null(spark):
    redacted = F.regexp_replace(
        F.concat(F.col("text"), F.lit(" user1@x.vn")),
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    )
    rows = {r["doc_id"]: r["r"] for r in _df(spark).select("doc_id", redacted.alias("r")).collect()}
    assert rows[1] is None  # NULL propagates, no crash
    assert rows[2] == " <EMAIL>"


def test_quality_filter_chain_reasons_on_junk(spark):
    viet = "àáạảãâầấậẩẫăằắặẳẵèéẹẻẽêềếệểễìíịỉĩòóọỏõôồốộổỗơờớợởỡùúụủũưừứựửữỳýỵỷỹđ"
    symbol_len = F.length(F.regexp_replace(F.col("text"), f"[a-zA-Z{viet}0-9\\s]", ""))
    reason = (
        F.when(F.col("n_chars") < 60, "too_short")
        .when(F.col("n_chars") > 1500, "too_long")
        .when(~F.col("lang").isin("en", "vi"), "lang_out_of_scope")
        .when(symbol_len > (F.lit(0.1) * F.length("text")).cast("double"), "too_much_symbol")
    )
    got = {
        r["doc_id"]: (r["reason"], r["kept"])
        for r in _df(spark)
        .select("doc_id", reason.alias("reason"), reason.isNull().alias("kept"))
        .collect()
    }
    # every junk row is rejected with a defined reason; NULL metadata passes
    # through as kept (NULL-tolerant gates — consistent with the oracle)
    assert got[2] == ("too_short", False)
    assert got[3] == ("too_short", False)
    assert got[5] == ("too_short", False)
    assert got[1] == (None, True)


def test_connected_components_empty_edges(spark):
    from bytesme_etl_batch_pipeline_spark.operators.graph import connected_components

    empty = spark.createDataFrame([], "src long, dst long")
    assert connected_components(empty).count() == 0
