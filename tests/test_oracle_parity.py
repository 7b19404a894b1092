"""Every oracle-checkable catalog query must match its DuckDB twin at
sf0.001 (the driver runs the same gate at sf0.01)."""

from __future__ import annotations

import pytest

from bytesme_etl_batch_pipeline_spark.plans import queries as catalog

from .oracle import compare, duckdb_con

ORACLE_KEYS = sorted(catalog.ORACLE_SQL)


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_con(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(spark, sf_dir, con, name):
    df = catalog.SPARK_QUERIES[name](spark, sf_dir)
    result = compare(df, con, catalog.ORACLE_SQL[name])
    assert result["values_match"], result
