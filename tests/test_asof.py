"""As-of join operator: inclusive boundary, unmatched lefts, inner mode,
no cross-row payload tearing."""

import datetime as dt

from pyspark.sql import Row

from firebolt_cdc_lambda_spark.operators.asof import asof_join


def ts(day, hour=0):
    return dt.datetime(2024, 1, day, hour)


def test_basic_asof(spark):
    left = spark.createDataFrame([
        Row(k=1, lts=ts(5), name="e1"),
        Row(k=1, lts=ts(10), name="e2"),
        Row(k=2, lts=ts(5), name="e3"),
    ])
    right = spark.createDataFrame([
        Row(k=1, rts=ts(1), price=10.0),
        Row(k=1, rts=ts(7), price=20.0),
        Row(k=2, rts=ts(9), price=30.0),   # after the left row
    ])
    out = {r["name"]: r["price"]
           for r in asof_join(left, right, "k", "lts", "rts", ["price"]).collect()}
    assert out == {"e1": 10.0, "e2": 20.0, "e3": None}


def test_boundary_inclusive(spark):
    left = spark.createDataFrame([Row(k=1, lts=ts(7), name="e")])
    right = spark.createDataFrame([Row(k=1, rts=ts(7), price=42.0)])
    out = asof_join(left, right, "k", "lts", "rts", ["price"]).collect()
    assert out[0]["price"] == 42.0


def test_inner_mode_drops_unmatched(spark):
    left = spark.createDataFrame([
        Row(k=1, lts=ts(5), name="hit"),
        Row(k=9, lts=ts(5), name="miss"),
    ])
    right = spark.createDataFrame([Row(k=1, rts=ts(1), price=1.0)])
    out = asof_join(left, right, "k", "lts", "rts", ["price"], how="inner").collect()
    assert [r["name"] for r in out] == ["hit"]


def test_null_payload_field_not_torn(spark):
    """A NULL field inside the matched right row must NOT be filled from
    an older right row (struct-atomic carry)."""
    left = spark.createDataFrame([Row(k=1, lts=ts(9), name="e")])
    right = spark.createDataFrame([
        Row(k=1, rts=ts(1), price=10.0, note="old"),
        Row(k=1, rts=ts(5), price=20.0, note=None),   # latest; note is NULL
    ])
    out = asof_join(left, right, "k", "lts", "rts", ["price", "note"]).collect()
    assert out[0]["price"] == 20.0 and out[0]["note"] is None


def test_forward_basic(spark):
    left = spark.createDataFrame([
        Row(k=1, lts=ts(5), name="e1"),
        Row(k=1, lts=ts(8), name="e2"),
        Row(k=2, lts=ts(10), name="e3"),
    ])
    right = spark.createDataFrame([
        Row(k=1, rts=ts(7), price=10.0),
        Row(k=1, rts=ts(12), price=20.0),
        Row(k=2, rts=ts(3), price=30.0),   # before the left row
    ])
    out = {r["name"]: r["price"]
           for r in asof_join(left, right, "k", "lts", "rts", ["price"],
                              direction="forward").collect()}
    assert out == {"e1": 10.0, "e2": 20.0, "e3": None}


def test_forward_boundary_inclusive(spark):
    left = spark.createDataFrame([Row(k=1, lts=ts(7), name="e")])
    right = spark.createDataFrame([Row(k=1, rts=ts(7), price=42.0)])
    out = asof_join(left, right, "k", "lts", "rts", ["price"],
                    direction="forward").collect()
    assert out[0]["price"] == 42.0


def test_forward_inner_mode(spark):
    left = spark.createDataFrame([
        Row(k=1, lts=ts(5), name="hit"),
        Row(k=1, lts=ts(9), name="miss"),   # no right row at/after
    ])
    right = spark.createDataFrame([Row(k=1, rts=ts(6), price=1.0)])
    out = asof_join(left, right, "k", "lts", "rts", ["price"],
                    how="inner", direction="forward").collect()
    assert [r["name"] for r in out] == ["hit"]


def test_bad_direction_rejected(spark):
    left = spark.createDataFrame([Row(k=1, lts=ts(5), name="e")])
    import pytest
    with pytest.raises(ValueError, match="backward|forward"):
        asof_join(left, left, "k", "lts", "lts", ["name"], direction="nearest")
