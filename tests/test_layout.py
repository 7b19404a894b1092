"""Z-order layout: the interleaved-bit sort must keep per-partition min/max
ranges tight on BOTH dimensions — the property that makes range scans on
either column prune files, which a lexicographic sort only provides for the
leading column."""

from __future__ import annotations

from pyspark.sql import functions as F

from bytesme_etl_batch_pipeline_spark.plans import queries as catalog


def _mean_span(df, order_col, dim_col, n_parts=8):
    parts = (
        df.repartitionByRange(n_parts, F.col(order_col))
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg((F.max(dim_col) - F.min(dim_col)).alias("span"))
    )
    rows = parts.collect()
    return sum(r["span"] for r in rows) / len(rows)


def test_zorder_tightens_both_dims(spark, sf_dir):
    df = catalog.SPARK_QUERIES["zorder_layout_key"](spark, sf_dir)

    # lexicographic-by-x layout: x is tight, y spans nearly the full range
    x_layout_y_span = _mean_span(df, "dim_x", "dim_y")
    # z-order layout: BOTH dims must stay substantially tighter than full
    z_layout_x_span = _mean_span(df, "zkey", "dim_x")
    z_layout_y_span = _mean_span(df, "zkey", "dim_y")

    assert x_layout_y_span > 200  # sanity: x-sort does nothing for y
    assert z_layout_x_span < 0.7 * 256
    assert z_layout_y_span < 0.7 * x_layout_y_span
