"""JDBC source/sink (SURVEY §2.1: S10–S12).

The reference bulk-loads processed CSVs into PostgreSQL with ``\\copy``
(``scripts/load/psql_load.sql:3-7``) and row-inserts embedding vectors in
batches of 50 (``scripts/transform/generate_embeddings.py:274-357``). Spark's
JDBC writer replaces both: distributed, batched, and restartable.

Round-trip behavior (batched writes, append, partitioned range reads, the
vector-sink row shape) is executed against embedded Derby — the JDBC engine
Spark's JVM already ships — in ``tests/test_jdbc.py``; the options mirror
what a production PostgreSQL deployment needs (partitioned reads, write
batch size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc(
    spark: SparkSession,
    url: str,
    table_or_query: str,
    *,
    properties: dict[str, str] | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """S12: table/query scan. With ``partition_column`` bounds the scan is
    split into ``num_partitions`` parallel range reads — the scale path; a
    single-connection read is only acceptable for dimension tables."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table_or_query)
    )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError(
                "partitioned JDBC reads require lower_bound and upper_bound "
                "(run SELECT min(col), max(col) first)"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 32))
        )
    return reader.load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    *,
    mode: str = "append",
    batch_size: int = 10_000,
    properties: dict[str, str] | None = None,
) -> None:
    """S10/S11: bulk sink. ``batchsize`` generalizes the reference's
    hardcoded 50-row commit batches; 10k is a sane JDBC default."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
        .mode(mode)
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()
