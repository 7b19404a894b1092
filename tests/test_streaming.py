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
