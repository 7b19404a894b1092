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


def test_zorder_key_is_bijective(spark):
    """Exhaustive over the full 5-bit × 5-bit grid: the Morton key must be a
    bijection (unique per (x,y)) and decode back to its inputs — the
    property that makes zkey ranges equivalent to 2-D tiles."""
    df = spark.createDataFrame(
        [(x, y) for x in range(32) for y in range(32)], "x long, y long"
    )
    zkey = F.lit(0).cast("long")
    for i in range(5):
        zkey = zkey + F.shiftleft(F.shiftright(F.col("x"), i).bitwiseAND(F.lit(1)), 2 * i)
        zkey = zkey + F.shiftleft(F.shiftright(F.col("y"), i).bitwiseAND(F.lit(1)), 2 * i + 1)
    rows = df.select("x", "y", zkey.alias("z")).collect()
    assert len({r["z"] for r in rows}) == 1024  # bijective

    def decode(z):
        x = y = 0
        for i in range(5):
            x |= ((z >> (2 * i)) & 1) << i
            y |= ((z >> (2 * i + 1)) & 1) << i
        return x, y

    for r in rows:
        assert decode(r["z"]) == (r["x"], r["y"])
