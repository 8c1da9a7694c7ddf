"""Regression: rollup pre-images must survive a same-batch schema
evolution (the evolution rewrite replaces the files a lazy snapshot
reference points at)."""

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from firebolt_cdc_lambda_spark.config import TableKeys
from firebolt_cdc_lambda_spark.operators.rollup_table import RollupTable
from firebolt_cdc_lambda_spark.pipeline import CdcPipeline

TS = dt.datetime(2024, 1, 1)
TS2 = dt.datetime(2024, 1, 2)


def aggs():
    return [F.count(F.lit(1)).alias("n")]


def test_rollup_survives_same_batch_schema_evolution(spark, tmp_path):
    pipe = CdcPipeline(spark, str(tmp_path / "wh"),
                       TableKeys.from_json('{"t": "id"}'), num_buckets=4)
    rollup = RollupTable(spark, str(tmp_path / "r"), ["status"], aggs, num_buckets=4)
    pipe.register_rollup("t", rollup, project=lambda df: df)
    pipe.process_batch("t", ["id"], spark.createDataFrame(
        [Row(id=i, status="a", Op="I", load_timestamp=TS) for i in range(10)]))
    # batch 2 both evolves the schema (new column) AND updates rows
    b2 = spark.createDataFrame(
        [Row(id=1, status="b", extra="new-col", Op="U", load_timestamp=TS2)])
    r = pipe.process_batch("t", ["id"], b2)
    assert r.status == "completed"
    assert [n for n, _ in r.schema_report.added] == ["extra"]
    snap = pipe.target_for("t", ["id"]).read()
    want = {x["status"]: x["n"] for x in snap.groupBy("status").agg(*aggs()).collect()}
    got = {x["status"]: x["n"] for x in rollup.read().collect()}
    assert got == want == {"a": 9, "b": 1}
