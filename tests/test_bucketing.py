"""Bucketed co-located join: the 100 TB answer to the fact-to-fact join.

Writing both sides bucketed by the join key lets Spark join them with NO
exchange on either side — the shuffle happens once at write time and is
amortized over every subsequent join. This test proves the engine's layout
produces the exchange-free plan."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from bytesme_etl_batch_pipeline_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def warehouse(spark, sf_dir):
    with tempfile.TemporaryDirectory() as d:
        spark.sql(f"CREATE DATABASE IF NOT EXISTS bucketed LOCATION '{d}'")
        load_table(spark, sf_dir, "lineitem").write.bucketBy(
            8, "l_orderkey"
        ).sortBy("l_orderkey").mode("overwrite").saveAsTable("bucketed.lineitem_b")
        load_table(spark, sf_dir, "orders").withColumnRenamed(
            "o_orderkey", "l_orderkey"
        ).write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode(
            "overwrite"
        ).saveAsTable("bucketed.orders_b")
        yield
        spark.sql("DROP TABLE IF EXISTS bucketed.lineitem_b")
        spark.sql("DROP TABLE IF EXISTS bucketed.orders_b")
        spark.sql("DROP DATABASE IF EXISTS bucketed")


def test_bucketed_join_has_no_exchange(spark, warehouse):
    li = spark.table("bucketed.lineitem_b")
    o = spark.table("bucketed.orders_b")
    joined = li.join(o, "l_orderkey").groupBy("o_orderpriority").count()
    # sf0.001 tables are broadcast-sized; disable auto-broadcast so the plan
    # shows what a 100 TB fact-to-fact join would do with this layout.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # co-located buckets: the join itself requires no shuffle of either side
    join_section = plan.split("HashAggregate")[-1]
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "Exchange hashpartitioning(l_orderkey" not in join_section

    # and it returns the same answer as the unbucketed join
    unbucketed = (
        load_table(spark, "/root/testdata/sf0.001", "lineitem")
        .join(
            load_table(spark, "/root/testdata/sf0.001", "orders").withColumnRenamed(
                "o_orderkey", "l_orderkey"
            ),
            "l_orderkey",
        )
        .groupBy("o_orderpriority")
        .count()
    )
    assert sorted(map(tuple, joined.collect())) == sorted(
        map(tuple, unbucketed.collect())
    )
