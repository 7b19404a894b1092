"""SparkSession factory.

Centralizes the engine's Spark configuration so tests, the driver entry point,
and the bench harness all run with the same (scale-aware) settings.

Scale notes (100 TB target):
* AQE on — runtime coalescing of shuffle partitions + skew-join splitting are
  the first line of defense against skewed keys on a real cluster.
* ``spark.sql.shuffle.partitions`` defaults to a small number locally; on a
  1000-executor cluster the AQE coalesce starts from
  ``spark.sql.adaptive.coalescePartitions.initialPartitionNum`` so we leave the
  static value as a local-test knob only.
* Arrow on — every pandas UDF in this engine is Arrow-batched.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "bytesme-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Local default is ``local[$SPARK_GRAFT_CPUS]``; on a real cluster the
    caller passes ``master=None`` and lets spark-submit own it.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # Testdata's events.ts is Parquet TIMESTAMP(NANOS) which Spark cannot
        # represent natively; read it as raw nanos (sources/tables.py converts
        # to TimestampType losslessly via integer division).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # events.ts is written with isAdjustedToUTC=false; surface it as a
        # session-TZ (UTC-pinned) timestamp rather than TIMESTAMP_NTZ so
        # unix_micros()/TIMESTAMP-typed operator paths resolve.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        # Python DataSource scans (sources/pysource.py) prune their input
        # work-list via pushFilters(); off by default in Spark 4.1.
        .config("spark.sql.python.filterPushdown.enabled", "true")
        # Let AQE re-plan (coalesce/skew-split) the subtree that feeds a
        # .cache() — off by default, which made materializing the cached
        # LSH edge list 3× slower than the identical uncached plan (every
        # tiny shuffle fanned out to the static partition count). The
        # iterative consumers (connected components, incremental dedup)
        # re-shuffle per round anyway, so the cached partitioning is not a
        # co-location contract anywhere in this engine.
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
        # InferFiltersFromGenerate synthesizes `size(child) > 0 AND
        # isnotnull(child)` ahead of every non-outer explode and predicate
        # pushdown then inlines the generator's WHOLE child expression into
        # that filter (twice — once per conjunct). For this engine's
        # explodes the child is always a COMPUTED array (shingle sets,
        # quantization codes, LSH bands — higher-order functions that run
        # interpreted, outside codegen), so the "optimization" re-evaluates
        # the most expensive expression in the query 2× per input row and,
        # where the lambda references per-row aggregates like array_min/max,
        # expands them per ELEMENT (measured 5.8× on
        # embedding_quantize_int8 at sf0.1). The inferred filter can never
        # change results (a non-outer Generate drops empty/NULL rows by
        # itself) and never reaches the parquet scan here (the arrays are
        # not stored columns), so exclusion is pure win at every scale.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # Python DataSource formats ship registered (idempotent) so
    # spark.read.format("bytesme_pages") / readStream.format(
    # "bytesme_event_replay") work out of the box on engine sessions.
    from .sources.pysource import register_python_sources

    register_python_sources(spark)
    return spark
