"""SQL surface over testdata + warehouse snapshots."""

import datetime as dt

from pyspark.sql import Row

from firebolt_cdc_lambda_spark import sqlapi
from firebolt_cdc_lambda_spark.config import TableKeys
from firebolt_cdc_lambda_spark.pipeline import CdcPipeline

from conftest import SF_DIR


def test_register_testdata_and_query(spark):
    views = sqlapi.register_testdata(spark, SF_DIR, prefix="td_")
    assert "td_orders" in views and "td_events" in views
    out = spark.sql("""
        SELECT o_orderstatus, COUNT(*) AS n FROM td_orders GROUP BY 1
    """).collect()
    assert sum(r["n"] for r in out) == spark.table("td_orders").count()
    # events view has the ns->us normalized timestamp: epoch math works
    row = spark.sql("SELECT unix_micros(MAX(ts)) AS m FROM td_events").first()
    assert row["m"] > 0


def test_register_warehouse_views(spark, tmp_path):
    pipe = CdcPipeline(spark, str(tmp_path / "wh"),
                       TableKeys.from_json('{"users": "id"}'), num_buckets=4)
    pipe.process_batch("users", ["id"], spark.createDataFrame(
        [Row(id=1, name="a", Op="I", load_timestamp=dt.datetime(2024, 1, 1))]))
    views = sqlapi.register_warehouse(spark, str(tmp_path / "wh"), prefix="wh_")
    assert views == ["wh_users"]
    rows = spark.sql("SELECT * FROM wh_users").collect()
    assert len(rows) == 1 and rows[0]["name"] == "a"
    assert "_bucket" not in spark.table("wh_users").columns
