"""Expectations: the single-pass declarative quality gate."""

import pytest
from pyspark.sql import Row, functions as F

from firebolt_cdc_lambda_spark.operators.expectations import (
    ExpectationError, Expectations)


@pytest.fixture()
def df(spark):
    return spark.createDataFrame([
        Row(id=1, status="O", amount=10.0, name="ok_one"),
        Row(id=2, status="F", amount=-5.0, name="bad amount"),
        Row(id=2, status="P", amount=20.0, name="dup id"),
        Row(id=3, status="X", amount=30.0, name=None),
        Row(id=None, status="O", amount=40.0, name="null id"),
    ])


def test_report_counts_each_violation_class(spark, df):
    rep = {r["check"]: (r["violations"], r["passed"]) for r in (
        Expectations(df)
        .not_null("id", "name")
        .unique("id")
        .in_range("amount", 0, 100)
        .accepted_values("status", ["O", "F", "P"])
        .matches("name", r"^[a-z_]+$")
        .report().collect())}
    assert rep["not_null:id"] == (1, False)
    assert rep["not_null:name"] == (1, False)
    assert rep["unique:id"] == (1, False)          # id=2 twice
    assert rep["in_range:amount"] == (1, False)    # -5.0
    assert rep["accepted_values:status"] == (1, False)  # X
    # "bad amount", "dup id", "null id" (NULL name is skipped, not counted)
    assert rep["matches:name"] == (3, False)


def test_single_aggregation_job(spark, df):
    """All checks compile into ONE aggregate over one scan — no join,
    no per-check job."""
    exp = (Expectations(df).not_null("id").unique("id")
           .in_range("amount", 0, 100))
    agg = df.agg(*[c for _, c in exp._checks])
    plan = agg._jdf.queryExecution().executedPlan().toString()
    for join in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
                 "CartesianProduct", "BroadcastNestedLoopJoin"):
        assert join not in plan, join
    assert plan.count("Exchange") <= 2      # partial + final of one agg


def test_enforce_raises_with_every_failure_listed(spark, df):
    with pytest.raises(ExpectationError) as exc:
        Expectations(df).not_null("id").unique("id").enforce()
    msg = str(exc.value)
    assert "not_null:id (1 violations)" in msg
    assert "unique:id (1 violations)" in msg


def test_enforce_passes_clean_data(spark):
    clean = spark.createDataFrame([Row(id=1), Row(id=2)])
    Expectations(clean).not_null("id").unique("id").enforce()  # no raise


def test_unique_counts_null_keys_like_the_merge(spark):
    """NULL-keyed rows group like any value (struct distinct) — two
    NULL-id rows are duplicates, matching merge_cdc's null-safe key
    semantics."""
    d = spark.createDataFrame([(None, 1), (None, 2)], "id bigint, v int")
    rep = Expectations(d).unique("id").report().collect()[0]
    assert rep["violations"] == 1 and not rep["passed"]


def test_custom_predicate(spark, df):
    rep = (Expectations(df)
           .custom("amount_vs_status",
                   (F.col("status") == "F") & (F.col("amount") >= 0))
           .report().collect()[0])
    assert rep["check"] == "custom:amount_vs_status"
    assert rep["violations"] == 0 and rep["passed"]


def test_no_checks_rejected(spark, df):
    with pytest.raises(ValueError, match="no expectations"):
        Expectations(df).report()


def test_pipeline_quality_gate_blocks_bad_batch(spark, tmp_path):
    """CdcPipeline(expectations=...): a violating batch alerts, raises,
    records 'failed' in the ledger, and does NOT land; the next clean
    batch lands normally."""
    import datetime as dt
    from firebolt_cdc_lambda_spark.config import TableKeys
    from firebolt_cdc_lambda_spark.pipeline import CdcPipeline
    from firebolt_cdc_lambda_spark.sources.ledger import FileLedger

    alerts = []
    ledger = FileLedger(spark, str(tmp_path / "ledger"),
                        cleanup_probability=0.0)
    pipe = CdcPipeline(
        spark, str(tmp_path / "wh"), TableKeys.from_json('{"users": "id"}'),
        ledger=ledger, num_buckets=4, alert_hook=alerts.append,
        expectations={"users": lambda df: Expectations(df)
                      .not_null("id").in_range("amount", 0, 100)})

    def write_batch(name, rows):
        p = str(tmp_path / "fair" / "users" / "2024" / "01" / "05" / name)
        spark.createDataFrame(rows, "id bigint, amount double, Op string") \
            .withColumn("load_timestamp",
                        F.lit(dt.datetime(2024, 1, 5)).cast("timestamp")) \
            .coalesce(1).write.mode("overwrite").parquet(p)
        return p

    bad = write_batch("f1.parquet", [(1, 50.0, "I"), (None, 999.0, "I")])
    with pytest.raises(ExpectationError):
        pipe.process_file(bad)
    assert alerts and "quality gate" in alerts[0]
    assert not (tmp_path / "wh" / "users").exists()      # nothing landed
    assert ledger.is_processed(bad) is False             # recorded failed

    good = write_batch("f2.parquet", [(1, 50.0, "I"), (2, 60.0, "I")])
    res = pipe.process_file(good)
    assert res.status == "bootstrapped"
    kt = pipe.target_for("users", ["id"])
    assert kt.read().count() == 2


def test_full_load_bootstrap_is_gated_too(spark, tmp_path):
    """Review finding: bootstrap_from_load_files must run the same
    quality gate as process_batch — a bad full load must not land."""
    import datetime as dt
    from firebolt_cdc_lambda_spark.config import TableKeys
    from firebolt_cdc_lambda_spark.pipeline import CdcPipeline

    alerts = []
    pipe = CdcPipeline(
        spark, str(tmp_path / "wh"), TableKeys.from_json('{"users": "id"}'),
        ledger=False, num_buckets=4, alert_hook=alerts.append,
        expectations={"users": lambda df: Expectations(df).not_null("id")})
    p = str(tmp_path / "LOAD00000001.parquet")
    spark.createDataFrame([(1, "I"), (None, "I")], "id bigint, Op string") \
        .withColumn("load_timestamp",
                    F.lit(dt.datetime(2024, 1, 5)).cast("timestamp")) \
        .coalesce(1).write.mode("overwrite").parquet(p)
    with pytest.raises(ExpectationError):
        pipe.bootstrap_from_load_files("users", [p])
    assert alerts and "quality gate" in alerts[0]
    assert not (tmp_path / "wh" / "users").exists()
