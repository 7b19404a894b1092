"""S10–S12 executed round-trips against embedded Derby (ships with Spark's
JVM — no external database needed). Upgrades the JDBC wrappers from
shape-only to behavior-tested: batched writes, append semantics, partitioned
range reads, and the reference's vector-sink row shape
(``generate_embeddings.py:274-357``: pgvector text-encoded embeddings,
batch commits)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bytesme_etl_batch_pipeline_spark.sources.jdbc import read_jdbc, write_jdbc

DRIVER = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


def _url(tmp_path, name):
    return f"jdbc:derby:{tmp_path}/{name};create=true"


def test_write_read_round_trip_partitioned(spark, tmp_path):
    url = _url(tmp_path, "rt")
    df = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") * 3).alias("val"),
        F.concat(F.lit("row-"), F.col("id").cast("string")).alias("tag"),
    )
    write_jdbc(df, url, "t_rt", mode="overwrite", batch_size=100, properties=DRIVER)

    back = read_jdbc(
        spark, url, "t_rt", properties=DRIVER,
        partition_column="id", lower_bound=0, upper_bound=1000, num_partitions=8,
    )
    # S12 contract: the scan is split into parallel range reads
    assert back.rdd.getNumPartitions() == 8
    assert back.count() == 1000
    got = {(r["id"], r["val"], r["tag"]) for r in back.collect()}
    want = {(i, i * 3, f"row-{i}") for i in range(1000)}
    assert got == want


def test_append_mode_accumulates(spark, tmp_path):
    url = _url(tmp_path, "ap")
    df = spark.range(0, 10).select(F.col("id"))
    write_jdbc(df, url, "t_ap", mode="overwrite", batch_size=5, properties=DRIVER)
    write_jdbc(df.select((F.col("id") + 10).alias("id")), url, "t_ap",
               mode="append", batch_size=5, properties=DRIVER)
    back = read_jdbc(spark, url, "t_ap", properties=DRIVER)
    assert sorted(r["id"] for r in back.collect()) == list(range(20))


def test_partitioned_read_requires_bounds(spark, tmp_path):
    with pytest.raises(ValueError, match="lower_bound and upper_bound"):
        read_jdbc(spark, _url(tmp_path, "x"), "t", partition_column="id")


def test_vector_sink_shape(spark, sf_dir, tmp_path):
    """E3 vector-store write, reference row shape: embeddings text-encoded
    the way pgvector ingests them ('[x1,x2,...]'), committed in batches
    (reference hardcodes 50; here it's the batchsize option)."""
    from bytesme_etl_batch_pipeline_spark.sources.tables import load_table

    url = _url(tmp_path, "vec")
    e = load_table(spark, sf_dir, "embeddings").limit(100)
    rows = e.select(
        "vec_id",
        F.concat(
            F.lit("["), F.array_join(F.col("embedding"), ","), F.lit("]")
        ).alias("embedding_text"),
    )
    write_jdbc(rows, url, "t_vec", mode="overwrite", batch_size=50, properties=DRIVER)
    back = read_jdbc(spark, url, "t_vec", properties=DRIVER)
    assert back.count() == 100
    sample = back.filter(F.col("vec_id") == 0).collect()[0]["embedding_text"]
    assert sample.startswith("[") and sample.endswith("]")
    assert len(sample.split(",")) == 64


def test_exactly_once_publish_swap(spark, tmp_path):
    """Repeated publishes replace (never duplicate) the table contents, and
    a stale staging table from a dead run is simply overwritten — the
    restartability plain append lacks."""
    from bytesme_etl_batch_pipeline_spark.sources.jdbc import write_jdbc_exactly_once

    url = _url(tmp_path, "eo")
    v1 = spark.range(0, 100).select(F.col("id"), F.lit("v1").alias("ver"))
    write_jdbc_exactly_once(v1, url, "t_eo", batch_size=10, properties=DRIVER)
    back = read_jdbc(spark, url, "t_eo", properties=DRIVER)
    assert back.count() == 100
    assert {r["ver"] for r in back.select("ver").distinct().collect()} == {"v1"}

    # simulate a dead run that left staging behind
    junk = spark.range(0, 5).select(F.col("id"), F.lit("junk").alias("ver"))
    write_jdbc(junk, url, "t_eo_staging", mode="overwrite", properties=DRIVER)

    v2 = spark.range(0, 60).select(F.col("id"), F.lit("v2").alias("ver"))
    write_jdbc_exactly_once(v2, url, "t_eo", batch_size=10, properties=DRIVER)
    back = read_jdbc(spark, url, "t_eo", properties=DRIVER)
    assert back.count() == 60  # replaced, not 100+60 appended
    assert {r["ver"] for r in back.select("ver").distinct().collect()} == {"v2"}


def test_exactly_once_rejects_qualified_names(spark, tmp_path):
    from bytesme_etl_batch_pipeline_spark.sources.jdbc import write_jdbc_exactly_once

    df = spark.range(1)
    with pytest.raises(ValueError):
        write_jdbc_exactly_once(df, _url(tmp_path, "x"), "bad.name", properties=DRIVER)


def test_exactly_once_recovers_availability_after_crash_window(spark, tmp_path):
    """A crash between RENAME(table->retired) and RENAME(staging->table)
    leaves no live table. The next publish must restore the retired
    generation BEFORE the slow staging rewrite (readers keep the old data
    the whole time) — proven by making the rewrite itself fail: after the
    failed retry the table is back, serving the previous generation."""
    from bytesme_etl_batch_pipeline_spark.sources.jdbc import (
        write_jdbc_exactly_once,
    )

    url = _url(tmp_path, "eor")
    v1 = spark.range(0, 30).select(F.col("id"), F.lit("v1").alias("ver"))
    write_jdbc_exactly_once(v1, url, "t_r", batch_size=10, properties=DRIVER)

    # simulate the mid-swap crash: table parked under _retired, no table
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        st = conn.createStatement()
        st.executeUpdate("RENAME TABLE t_r TO t_r_retired")
        st.close()
    finally:
        conn.close()
    with pytest.raises(Exception):
        read_jdbc(spark, url, "t_r", properties=DRIVER).count()  # gap is real

    # retry whose staging rewrite FAILS — only the entry recovery ran
    boom = spark.range(0, 10).select(
        (F.col("id") / F.lit(0)).cast("long").alias("id"),  # ANSI: div by zero
        F.lit("v2").alias("ver"),
    )
    with pytest.raises(Exception):
        write_jdbc_exactly_once(boom, url, "t_r", batch_size=10, properties=DRIVER)
    back = read_jdbc(spark, url, "t_r", properties=DRIVER)
    assert back.count() == 30  # old generation restored and readable
    assert {r["ver"] for r in back.select("ver").distinct().collect()} == {"v1"}

    # and a clean retry converges to the new generation
    v2 = spark.range(0, 12).select(F.col("id"), F.lit("v2").alias("ver"))
    write_jdbc_exactly_once(v2, url, "t_r", batch_size=10, properties=DRIVER)
    back = read_jdbc(spark, url, "t_r", properties=DRIVER)
    assert back.count() == 12
    assert {r["ver"] for r in back.select("ver").distinct().collect()} == {"v2"}
