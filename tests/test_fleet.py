"""Multi-table fleet orchestration: concurrent streams, null-PK skip."""

import datetime as dt

from pyspark.sql import Row

from firebolt_cdc_lambda_spark.config import TableKeys
from firebolt_cdc_lambda_spark.pipeline import CdcPipeline
from firebolt_cdc_lambda_spark.streaming.fleet import CdcFleet

TS = dt.datetime(2024, 1, 1, 10, 0)
TS2 = dt.datetime(2024, 1, 2, 10, 0)


def write_file(spark, root, table, date, name, rows):
    y, m, d = date.split("-")
    path = f"{root}/fair/{table}/{y}/{m}/{d}/{name}"
    spark.createDataFrame(rows).coalesce(1).write.mode("overwrite").parquet(path)


def test_fleet_drains_all_tables(spark, tmp_path):
    root = str(tmp_path / "src")
    write_file(spark, root, "users", "2024-01-01", "a.parquet", [
        Row(id=1, name="alice", Op="I", load_timestamp=TS)])
    write_file(spark, root, "users", "2024-01-02", "b.parquet", [
        Row(id=1, name="alice2", Op="U", load_timestamp=TS2)])
    write_file(spark, root, "orders", "2024-01-01", "a.parquet", [
        Row(oid=7, amt=5.0, Op="I", load_timestamp=TS)])
    write_file(spark, root, "nokeys", "2024-01-01", "a.parquet", [
        Row(x=1, Op="I", load_timestamp=TS)])

    pipe = CdcPipeline(
        spark, str(tmp_path / "wh"),
        TableKeys.from_json('{"users": "id", "orders": "oid", "nokeys": null}'),
        num_buckets=4)
    fleet = CdcFleet(pipe, root, str(tmp_path / "ckpt"))
    assert fleet.discover_tables() == ["nokeys", "orders", "users"]
    assert set(fleet.streams()) == {"orders", "users"}   # null PK skipped

    status = fleet.run_once(spark)
    assert status == {"orders": "drained", "users": "drained"}
    users = {r["id"]: r["name"]
             for r in pipe.target_for("users", ["id"]).read().collect()}
    assert users == {1: "alice2"}
    orders = pipe.target_for("orders", ["oid"]).read().collect()
    assert len(orders) == 1 and orders[0]["amt"] == 5.0

    # second drain: checkpoints make it a fleet-wide no-op
    status2 = fleet.run_once(spark)
    assert status2 == {"orders": "drained", "users": "drained"}
    assert pipe.target_for("users", ["id"]).read().count() == 1
