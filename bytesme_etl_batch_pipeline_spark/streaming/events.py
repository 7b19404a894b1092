"""Streaming event analytics: the streaming twins of the batch event queries.

Design: each transform is the SAME function the batch catalog uses
(plans/queries.py ``events_tumbling_window`` / ``sessionization``), applied to
a streaming DataFrame with a watermark. Late data beyond the watermark is
dropped deterministically; state for sessions/windows is bounded by the
watermark horizon — the property that keeps a 100 TB/day stream's state
finite.

Local testing uses the file source over the same parquet + ``availableNow``
(process-everything-then-stop), which exercises the real streaming engine,
checkpointing included, without a long-running service.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.queries import _dec


def read_events_stream(
    spark: SparkSession, sf_dir: str, schema=None
) -> DataFrame:
    """File-source stream over the events table (at scale: Kafka source with
    the same downstream code). ``maxFilesPerTrigger`` bounds batch size."""
    import os

    from ..sources.tables import ensure_session_confs

    ensure_session_confs(spark)  # nanos-parquet + UTC, even on foreign sessions
    path = os.path.join(sf_dir, "events.parquet")
    if schema is None:
        schema = spark.read.parquet(path).schema
    # The file source wants a directory; scope it to the events file(s) with a
    # glob filter (a production layout is a directory of arriving files).
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "events.parquet*")
        .parquet(sf_dir)
    )
    # Same nanos→timestamp repair as the batch loader (sources/tables.py).
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return stream


def windowed_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window counts/sums with a watermark. On a stream, state is
    purged once the watermark passes the window end."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_dec("value")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionized_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session windows (inactivity gap) per user on a stream."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
    )


def run_stream_to_memory(
    df: DataFrame, query_name: str, checkpoint_dir: str, output_mode: str = "complete"
) -> None:
    """Run a streaming aggregation to completion with availableNow into an
    in-memory table — the BOUNDED test/bench harness.

    Mode caveat: ``complete`` retains all windows and disables
    watermark-based state eviction, which is fine for a drained bounded
    input but must NOT be copied to a continuous deployment — production
    sinks (parquet/Delta/Kafka) use ``append`` (or ``update``), where the
    watermark actually bounds state as the aggregation docstrings promise."""
    q = (
        df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
