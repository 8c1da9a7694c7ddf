"""Schema evolution gate: additive adds, report-only removals/changes,
decimal merge gate, PK hard-fail."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from firebolt_cdc_lambda_spark.operators.evolution import (
    diff_schemas,
    evolve_target,
    merge_columns,
)
from firebolt_cdc_lambda_spark.operators.merge import MergeKeyError


def schema(*fields):
    return T.StructType([T.StructField(n, t, True) for n, t in fields])


def test_new_safe_column_added(spark):
    tgt = schema(("id", T.LongType()), ("name", T.StringType()))
    stg = spark.createDataFrame([Row(id=1, name="a", new_col=2.5, Op="I")])
    rep = diff_schemas(tgt, stg)
    assert [n for n, _ in rep.added] == ["new_col"]
    assert rep.manual == [] and rep.removed == []


def test_metadata_columns_not_added(spark):
    tgt = schema(("id", T.LongType()))
    stg = spark.createDataFrame(
        [(1, "I", None, 1, 1)],
        schema=schema(("id", T.LongType()), ("Op", T.StringType()),
                      ("load_timestamp", T.TimestampType()),
                      ("ingestion_seq", T.IntegerType()), ("rn", T.IntegerType())))
    rep = diff_schemas(tgt, stg)
    assert rep.added == [] and rep.manual == []


def test_unsafe_column_reported_manual(spark):
    tgt = schema(("id", T.LongType()))
    stg = spark.createDataFrame(
        [Row(id=1, geo=[1.0, 2.0])],
        schema=schema(("id", T.LongType()),
                      ("geo", T.ArrayType(T.DoubleType()))))
    rep = diff_schemas(tgt, stg)
    assert [n for n, _ in rep.manual] == ["geo"] and rep.added == []


def test_removed_column_report_only(spark):
    tgt = schema(("id", T.LongType()), ("legacy", T.StringType()))
    stg = spark.createDataFrame([Row(id=1)])
    rep = diff_schemas(tgt, stg)
    assert rep.removed == ["legacy"]


def test_evolve_target_adds_null_columns(spark):
    tgt = spark.createDataFrame([Row(id=1)])
    stg = spark.createDataFrame([Row(id=1, extra="x", Op="I")])
    rep = diff_schemas(tgt.schema, stg)
    out = evolve_target(tgt, rep)
    assert out.columns == ["id", "extra"]
    assert out.collect()[0]["extra"] is None


def test_decimal_mismatch_dropped_from_merge(spark):
    tgt = schema(("id", T.LongType()), ("amt", T.DecimalType(20, 0)),
                 ("name", T.StringType()))
    stg_schema = schema(("id", T.LongType()), ("amt", T.DecimalType(38, 0)),
                        ("name", T.StringType()))
    stg = spark.createDataFrame([], stg_schema)
    rep = diff_schemas(tgt, stg)
    cols = merge_columns(tgt, stg, ["id"], report=rep)
    assert "amt" not in cols and "name" in cols and "id" in cols
    assert rep.dropped_from_merge == ["amt"]


def test_pk_decimal_mismatch_hard_fails(spark):
    tgt = schema(("id", T.DecimalType(20, 0)), ("v", T.StringType()))
    stg = spark.createDataFrame([], schema(("id", T.DecimalType(38, 0)),
                                           ("v", T.StringType())))
    with pytest.raises(MergeKeyError):
        merge_columns(tgt, stg, ["id"])
