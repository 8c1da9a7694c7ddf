"""KeyedTable.diff — the change-data-feed surface of versioned tables:
classification exactness, identical-version emptiness, tombstone
deletes, and the changed-bucket scan pruning."""

import re

import pytest
from pyspark.sql import functions as F

from firebolt_cdc_lambda_spark.operators.merge import KeyedTable


def _table(spark, path, rows, **kw):
    kt = KeyedTable(spark, path, ["k"], num_buckets=8, versioned=True, **kw)
    kt.init(spark.createDataFrame(rows, "k int, v string, x int"))
    return kt


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_diff_classifies_insert_update_delete(spark, tmp_path):
    kt = _table(spark, str(tmp_path / "t"),
                [(1, "a", 10), (2, "b", 20), (3, "c", 30)])
    batch = spark.createDataFrame(
        [(2, "b2", 20, "U"),      # value change -> update
         (3, "c", 30, "D"),       # delete
         (9, "z", 90, "U")],      # new key -> insert
        "k int, v string, x int, Op string")
    kt.merge_batch(batch)
    assert _canon(kt.diff(0)) == [
        (2, "b", 20, "update_preimage"),
        (2, "b2", 20, "update_postimage"),
        (3, "c", 30, "delete"),
        (9, "z", 90, "insert"),
    ]


def test_diff_same_version_is_empty_and_no_op_update_invisible(spark, tmp_path):
    kt = _table(spark, str(tmp_path / "t"), [(1, "a", 10), (2, "b", 20)])
    # an upsert writing the IDENTICAL row is not a logical change
    kt.merge_batch(spark.createDataFrame(
        [(1, "a", 10, "U")], "k int, v string, x int, Op string"))
    assert kt.diff(0, 0).count() == 0
    assert kt.diff(1, 1).count() == 0
    assert _canon(kt.diff(0, 1)) == []


def test_diff_between_intermediate_versions(spark, tmp_path):
    kt = _table(spark, str(tmp_path / "t"), [(1, "a", 10)])
    kt.merge_batch(spark.createDataFrame(
        [(1, "a2", 10, "U")], "k int, v string, x int, Op string"))
    kt.merge_batch(spark.createDataFrame(
        [(1, "a3", 10, "U")], "k int, v string, x int, Op string"))
    assert _canon(kt.diff(1, 2)) == [
        (1, "a2", 10, "update_preimage"),
        (1, "a3", 10, "update_postimage"),
    ]
    # composed end-to-end view skips the intermediate value entirely
    assert _canon(kt.diff(0, 2)) == [
        (1, "a", 10, "update_preimage"),
        (1, "a3", 10, "update_postimage"),
    ]


def test_diff_tombstoned_delete_reads_as_delete(spark, tmp_path):
    kt = _table(spark, str(tmp_path / "t"), [(1, "a", 10), (2, "b", 20)],
                tombstones=True)
    kt.merge_batch(spark.createDataFrame(
        [(1, "a", 10, "D")], "k int, v string, x int, Op string"))
    assert _canon(kt.diff(0)) == [(1, "a", 10, "delete")]


def test_diff_scans_only_changed_buckets(spark, tmp_path):
    rows = [(k, f"v{k}", k) for k in range(64)]
    kt = _table(spark, str(tmp_path / "t"), rows)
    kt.merge_batch(spark.createDataFrame(
        [(5, "v5x", 5, "U")], "k int, v string, x int, Op string"))
    d = kt.diff(0)
    files = d.inputFiles()
    assert files, "diff plan must read something"
    buckets = {int(m.group(1)) for f in files
               for m in [re.search(r"_bucket=(\d+)", f)] if m}
    # only the single touched key's bucket is scanned, on both sides
    assert len(buckets) == 1
    assert _canon(d) == [
        (5, "v5", 5, "update_preimage"),
        (5, "v5x", 5, "update_postimage"),
    ]


def test_diff_rejects_unversioned(spark, tmp_path):
    kt = KeyedTable(spark, str(tmp_path / "t"), ["k"], num_buckets=4)
    kt.init(spark.createDataFrame([(1, "a")], "k int, v string"))
    with pytest.raises(ValueError, match="versioned"):
        kt.diff(0)


def test_diff_after_rebucket_full_scan_still_correct(spark, tmp_path):
    kt = _table(spark, str(tmp_path / "t"), [(1, "a", 10), (2, "b", 20)])
    kt.merge_batch(spark.createDataFrame(
        [(2, "b2", 20, "U")], "k int, v string, x int, Op string"))
    kt.rebucket(16)
    assert _canon(kt.diff(0)) == [
        (2, "b", 20, "update_preimage"),
        (2, "b2", 20, "update_postimage"),
    ]


def test_diff_rejects_inverted_range(spark, tmp_path):
    kt = _table(spark, str(tmp_path / "t"), [(1, "a", 10)])
    kt.merge_batch(spark.createDataFrame(
        [(1, "a2", 10, "U")], "k int, v string, x int, Op string"))
    with pytest.raises(ValueError, match="inverted"):
        kt.diff(1, 0)
    with pytest.raises(ValueError, match="inverted"):
        kt.diff(2)          # from beyond latest
