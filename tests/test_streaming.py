"""Streaming twins must produce the same results as the batch queries when
the stream is drained with availableNow (bounded input ⇒ identical output)."""

from __future__ import annotations

import tempfile

from bytesme_etl_batch_pipeline_spark.plans import queries as catalog
from bytesme_etl_batch_pipeline_spark.streaming import events as stream_events


def _sorted_rows(rows):
    return sorted(tuple(r) for r in rows)


def test_streaming_windowed_counts_matches_batch(spark, sf_dir):
    stream = stream_events.read_events_stream(spark, sf_dir)
    assert stream.isStreaming
    agg = stream_events.windowed_counts(stream)
    with tempfile.TemporaryDirectory() as ckpt:
        stream_events.run_stream_to_memory(agg, "win_counts", ckpt)
    got = spark.sql("SELECT * FROM win_counts").collect()
    expected = catalog.SPARK_QUERIES["events_tumbling_window"](spark, sf_dir).collect()
    assert _sorted_rows(got) == _sorted_rows(expected)


def test_streaming_sessionization_matches_batch(spark, sf_dir):
    stream = stream_events.read_events_stream(spark, sf_dir)
    agg = stream_events.sessionized_counts(stream)
    with tempfile.TemporaryDirectory() as ckpt:
        stream_events.run_stream_to_memory(agg, "sess_counts", ckpt)
    got = spark.sql("SELECT * FROM sess_counts").collect()
    expected = catalog.SPARK_QUERIES["sessionization"](spark, sf_dir).collect()
    assert _sorted_rows(got) == _sorted_rows(expected)


def test_stateful_running_totals(spark, sf_dir):
    """applyInPandasWithState: after draining the stream, per-user totals
    must equal the batch groupBy (state folded across micro-batches)."""
    import tempfile

    from bytesme_etl_batch_pipeline_spark.streaming.stateful import running_user_totals
    from pyspark.sql import functions as F

    stream = stream_events.read_events_stream(spark, sf_dir)
    out = running_user_totals(stream)
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            out.writeStream.format("memory")
            .queryName("user_totals")
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    # update mode may emit a row per micro-batch; the LAST emission per user
    # is the final state — with one input file there is exactly one batch.
    got = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in spark.sql("SELECT * FROM user_totals").collect()
    }
    expected = {
        r["user_id"]: (r["n"], r["t"])
        for r in spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("t"),
        )
        .collect()
    }
    assert set(got) == set(expected)
    for uid, (n, t) in expected.items():
        assert got[uid][0] == n
        assert abs(got[uid][1] - t) < 0.05  # float fold vs sum tolerance
