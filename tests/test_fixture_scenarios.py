"""FIXTURES.md adversarial scenarios at pipeline level: full-load batches
without Op, decimal precision mismatch mid-stream, string PKs,
epoch-seconds tie-breakers."""

import datetime as dt
from decimal import Decimal

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from firebolt_cdc_lambda_spark.config import TableKeys
from firebolt_cdc_lambda_spark.operators.merge import MergeKeyError
from firebolt_cdc_lambda_spark.pipeline import CdcPipeline

TS = dt.datetime(2024, 1, 1, 10, 0)
TS2 = dt.datetime(2024, 1, 2, 10, 0)


def pipe_for(spark, tmp_path, keys_json):
    return CdcPipeline(spark, str(tmp_path / "wh"),
                       TableKeys.from_json(keys_json), num_buckets=4)


def test_full_load_batch_without_op_column(spark, tmp_path):
    """First full-load batch may omit Op entirely (FIXTURES §1)."""
    pipe = pipe_for(spark, tmp_path, '{"users": "id"}')
    first = spark.createDataFrame([
        Row(id=1, name="a", load_timestamp=TS),
        Row(id=2, name="b", load_timestamp=TS),
    ])
    r = pipe.process_batch("users", ["id"], first)
    assert r.status == "bootstrapped"
    # later a normal CDC batch with Op applies on top
    second = spark.createDataFrame([
        Row(id=2, name="b2", Op="U", load_timestamp=TS2),
    ])
    pipe.process_batch("users", ["id"], second)
    rows = {r["id"]: r["name"]
            for r in pipe.target_for("users", ["id"]).read().collect()}
    assert rows == {1: "a", 2: "b2"}


def test_update_batch_without_op_is_pure_upsert(spark, tmp_path):
    """No Op column => nothing is a delete; all rows upsert."""
    pipe = pipe_for(spark, tmp_path, '{"t": "id"}')
    pipe.process_batch("t", ["id"], spark.createDataFrame(
        [Row(id=1, v="x", load_timestamp=TS)]))
    pipe.process_batch("t", ["id"], spark.createDataFrame(
        [Row(id=1, v="y", load_timestamp=TS2),
         Row(id=2, v="z", load_timestamp=TS2)]))
    rows = {r["id"]: r["v"] for r in pipe.target_for("t", ["id"]).read().collect()}
    assert rows == {1: "y", 2: "z"}


def _dec_schema(loan_precision):
    return T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("loan_id", T.DecimalType(loan_precision, 0)),
        T.StructField("amount", T.DecimalType(38, 10)),
        T.StructField("status", T.StringType()),
        T.StructField("Op", T.StringType()),
        T.StructField("load_timestamp", T.TimestampType()),
    ])


def test_decimal_mismatch_dropped_from_merge_in_pipeline(spark, tmp_path):
    """FIXTURES cent_borrower_transaction variant: loan_id arrives as
    DECIMAL(38,0) against a DECIMAL(20,0) target -> column dropped from
    the merge, other columns still applied (handler.py:884-897)."""
    pipe = pipe_for(spark, tmp_path, '{"txn": "id"}')
    b1 = spark.createDataFrame(
        [(1, Decimal(500), Decimal("10.5"), "new", "I", TS)], _dec_schema(20))
    pipe.process_batch("txn", ["id"], b1)
    b2 = spark.createDataFrame(
        [(1, Decimal(999), Decimal("99.9"), "paid", "U", TS2)], _dec_schema(38))
    r = pipe.process_batch("txn", ["id"], b2)
    assert r.schema_report.dropped_from_merge == ["loan_id"]
    row = pipe.target_for("txn", ["id"]).read().collect()[0]
    assert row["status"] == "paid"                  # updated
    assert row["loan_id"] == Decimal(500)           # mismatched col untouched
    assert row["amount"] == Decimal("99.9000000000")


def test_decimal_mismatch_on_pk_hard_fails(spark, tmp_path):
    pipe = pipe_for(spark, tmp_path, '{"txn": "loan_id"}')
    b1 = spark.createDataFrame(
        [(1, Decimal(500), Decimal("10.5"), "new", "I", TS)], _dec_schema(20))
    pipe.process_batch("txn", ["loan_id"], b1)
    b2 = spark.createDataFrame(
        [(1, Decimal(500), Decimal("99.9"), "paid", "U", TS2)], _dec_schema(38))
    with pytest.raises(MergeKeyError):
        pipe.process_batch("txn", ["loan_id"], b2)


def test_string_pk_sessions(spark, tmp_path):
    """FIXTURES sessions: string PK + epoch-seconds created."""
    pipe = pipe_for(spark, tmp_path, '{"sessions": "sid"}')
    b1 = spark.createDataFrame([
        Row(sid="abc", uid=1, created=1700000000, Op="I", load_timestamp=TS),
        Row(sid="def", uid=2, created=1700000100, Op="I", load_timestamp=TS),
    ])
    pipe.process_batch("sessions", ["sid"], b1)
    b2 = spark.createDataFrame([
        # same load_timestamp, created epoch tie-break decides
        Row(sid="abc", uid=10, created=1700000300, Op="U", load_timestamp=TS2),
        Row(sid="abc", uid=11, created=1700000200, Op="U", load_timestamp=TS2),
        Row(sid="def", uid=2, created=1700000100, Op="D", load_timestamp=TS2),
    ])
    pipe.process_batch("sessions", ["sid"], b2)
    rows = {r["sid"]: r["uid"]
            for r in pipe.target_for("sessions", ["sid"]).read().collect()}
    assert rows == {"abc": 10}   # newer created wins; def deleted
