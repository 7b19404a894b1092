"""Engine-side fingerprint (tests/oracle.fingerprint_compare) unit tests.

The bigout triage path replaces collect+hash for O(N)-row outputs at scale
sweeps; these tests pin (a) cross-engine canonical agreement for every hash
class, (b) that a SAME-COUNT value divergence — the dedup survivor-selection
scenario count-vs-count triage was blind to — is caught, and (c) the float
column aggregate pins (NaN, null, sign, fold-order tolerance).
"""

from __future__ import annotations

import duckdb
import pytest

from .oracle import (
    duck_fingerprint,
    fingerprint_compare,
    spark_fingerprint,
)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    yield c
    c.close()


ALL_CLASS_SQL = """
SELECT * FROM (VALUES
  (1,          true,  'héllo',  DATE '2024-01-05',
   TIMESTAMP '2024-01-05 03:04:05.123456', from_hex('a0ff'), 1.5),
  (NULL,       false, NULL,     NULL,
   NULL,                                    NULL,             'nan'::DOUBLE),
  (-7,         NULL,  'x|y,z',  DATE '1999-12-31',
   TIMESTAMP '1999-12-31 23:59:59',         from_hex(''),     NULL)
) t(i, b, s, d, ts, bin, f)
"""


def _spark_all_class(spark):
    return spark.sql(
        """
        SELECT * FROM VALUES
          (1,                 true,              'héllo',
           DATE'2024-01-05',  TIMESTAMP'2024-01-05 03:04:05.123456',
           unhex('A0FF'),     CAST(1.5 AS DOUBLE)),
          (CAST(NULL AS INT), false,             CAST(NULL AS STRING),
           CAST(NULL AS DATE), CAST(NULL AS TIMESTAMP),
           CAST(NULL AS BINARY), CAST('NaN' AS DOUBLE)),
          (-7,                CAST(NULL AS BOOLEAN), 'x|y,z',
           DATE'1999-12-31',  TIMESTAMP'1999-12-31 23:59:59',
           unhex(''),         CAST(NULL AS DOUBLE))
        t(i, b, s, d, ts, bin, f)
        """
    )


def test_all_hash_classes_agree(spark, con):
    r = fingerprint_compare(_spark_all_class(spark), con, ALL_CLASS_SQL)
    assert r["rows_match"] and r["cols_match"]
    assert r["values_match"], r


def test_same_count_divergence_caught(spark, con):
    # the dedup_keep_first survivor scenario: identical row COUNT, one
    # differing survivor value — count-vs-count triage passes this, the
    # fingerprint must not
    sdf = spark.sql("SELECT * FROM VALUES (1, 'keep-a'), (2, 'same') t(k, v)")
    sql = "SELECT * FROM (VALUES (1, 'keep-b'), (2, 'same')) t(k, v)"
    r = fingerprint_compare(sdf, con, sql)
    assert r["rows_match"]
    assert not r["values_match"]


def test_null_vs_sentinel_string_distinct(spark, con):
    # NULL canonicalizes to chr(1); a row where the VALUES differ only in
    # null-ness must still mismatch
    sdf = spark.sql("SELECT CAST(NULL AS STRING) v")
    r = fingerprint_compare(sdf, con, "SELECT '' AS v")
    assert not r["values_match"]


def test_float_sum_tolerates_fold_order(spark, con):
    # 0.1 summed 100× differs in the last ulps depending on fold order;
    # the sum pin is tolerance-compared, count/min/max exact
    sdf = spark.sql("SELECT CAST(0.1 AS DOUBLE) f FROM range(100)")
    sql = "SELECT 0.1::DOUBLE AS f FROM range(100)"
    r = fingerprint_compare(sdf, con, sql)
    assert r["values_match"], r


def test_float_value_shift_caught(spark, con):
    sdf = spark.sql("SELECT CAST(id AS DOUBLE) f FROM range(10)")
    sql = "SELECT CAST(range + 1 AS DOUBLE) AS f FROM range(10)"
    r = fingerprint_compare(sdf, con, sql)
    assert r["rows_match"]
    assert not r["values_match"]


def test_fingerprint_empty_result(spark, con):
    sdf = spark.sql("SELECT id AS k FROM range(0)")
    r = fingerprint_compare(sdf, con, "SELECT range AS k FROM range(0)")
    assert r["values_match"]
    assert r["spark_rows"] == 0 and r["duck_rows"] == 0


def test_direct_fingerprints_identical(spark, con):
    fs = spark_fingerprint(_spark_all_class(spark))
    fd = duck_fingerprint(con, ALL_CLASS_SQL)
    assert fs["n"] == fd["n"] == 3
    assert fs["rowhash"] == fd["rowhash"]
    assert set(fs["floats"]) == set(fd["floats"]) == {"f"}
