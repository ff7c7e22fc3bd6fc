"""The driver runs queries() with ITS OWN SparkSession whose timezone we don't
control. All query outputs format timestamps as wall-clock strings, which must
be invariant to spark.sql.session.timeZone (naive parquet + NTZ semantics)."""

import duckdb
import pytest

import __spark_entry__ as E
from ictspark.compare import diff


@pytest.mark.parametrize("tz", ["America/New_York", "Asia/Tokyo"])
@pytest.mark.parametrize("name", ["yield_report", "hourly_stats", "first_fail", "product_hourly", "failed_boards_display"])
def test_outputs_tz_invariant(spark, tz, name):
    sf_dir = "/root/testdata/sf0.01"
    orig = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", tz)
        got = E.queries()[name](spark, sf_dir).toPandas()
    finally:
        spark.conf.set("spark.sql.session.timeZone", orig)
    exp = duckdb.connect().execute(E.oracle_sql()[name]).df()
    assert diff(got, exp) is None
