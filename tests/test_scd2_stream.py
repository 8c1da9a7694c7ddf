"""Scd2Stream: per-file micro-batches fold into the persistent SCD2
dimension with the stamped ingestion_seq tie-break and Op-aware delete
closure; restart from the checkpoint skips processed files; LOAD*
files are excluded."""

import os

from firebolt_cdc_lambda_spark.operators.scd2 import (DELETED_COL,
                                                      Scd2Table)
from firebolt_cdc_lambda_spark.streaming.scd2_stream import Scd2Stream

KEYS, ORDER, TRACKED = ["k"], ["t", "ingestion_seq"], ["attr"]
SCHEMA = "k int, t bigint, attr string, Op string"


def _write_file(spark, path, rows, mtime):
    spark.createDataFrame(rows, SCHEMA).coalesce(1) \
        .write.mode("overwrite").parquet(path)
    for root, _, fs in os.walk(path):
        for f in fs:
            os.utime(os.path.join(root, f), (mtime, mtime))
    os.utime(path, (mtime, mtime))


def _canon(df):
    rows = df.select("k", "attr", "valid_from", "valid_to", "version",
                     "is_current", DELETED_COL).collect()
    return sorted((tuple(r) for r in rows),
                  key=lambda t: tuple((v is None, v) for v in t))


def _mk(spark, tmp_path, files):
    src = str(tmp_path / "src")
    for i, rows in enumerate(files):
        _write_file(spark, os.path.join(src, "2024", "01", f"{i+1:02d}",
                                        f"f{i}.parquet"), rows, 1000 + i)
    dim = Scd2Table(spark, str(tmp_path / "dim"), KEYS, ORDER, TRACKED,
                    num_buckets=8, op_col="Op")
    stream = Scd2Stream(dim, src, str(tmp_path / "ckpt"))
    stream.run_to_completion(spark)
    return dim, stream, src


def test_stream_folds_deletes_and_resumes(spark, tmp_path):
    files = [
        [(1, 10, "a", "I"), (2, 10, "x", "I")],
        [(1, 20, "b", "U"), (2, 20, "x", "D")],   # 2 deleted
        [(2, 30, "y", "I")],                       # 2 re-inserted
    ]
    dim, stream, src = _mk(spark, tmp_path, files)
    out = _canon(dim.read())
    # key 1: a -> b (2 versions); key 2: x -> deleted -> y (3 versions)
    assert [t for t in out if t[0] == 1] == [
        (1, "a", 10, 20, 1, False, False),
        (1, "b", 20, None, 2, True, False),
    ]
    k2 = [t for t in out if t[0] == 2]
    assert [(t[4], t[6]) for t in k2] == [(1, False), (2, True), (3, False)]
    # current() hides nothing here (key 2's open version is the
    # re-insert), but it must have hidden key 2 mid-history; assert the
    # final live view
    cur = {(r["k"], r["attr"]) for r in dim.current().collect()}
    assert cur == {(1, "b"), (2, "y")}

    # restart: no new files -> no change
    before = _canon(dim.read())
    stream.run_to_completion(spark)
    assert _canon(dim.read()) == before


def test_stream_delete_hides_key_from_current(spark, tmp_path):
    files = [
        [(5, 10, "v", "I")],
        [(5, 20, "v", "D")],
    ]
    dim, _, _ = _mk(spark, tmp_path, files)
    assert dim.current().count() == 0
    out = _canon(dim.read())
    assert [(t[4], t[6]) for t in out] == [(1, False), (2, True)]


def test_stream_same_timestamp_rows_fold_in_file_order(spark, tmp_path):
    """Two changes to one key with IDENTICAL event times in one file:
    the stamped ingestion_seq makes the LATER row in file order win."""
    files = [
        [(7, 10, "first", "I"), (7, 10, "second", "U")],
    ]
    dim, _, _ = _mk(spark, tmp_path, files)
    cur = dim.current().collect()
    assert len(cur) == 1 and cur[0]["attr"] == "second"


def test_stream_requires_ingestion_seq_order(spark, tmp_path):
    import pytest
    dim = Scd2Table(spark, str(tmp_path / "dim"), KEYS, ["t"], TRACKED,
                    num_buckets=4, op_col="Op")
    with pytest.raises(ValueError, match="ingestion_seq"):
        Scd2Stream(dim, str(tmp_path / "src"), str(tmp_path / "ck"))


def test_stream_skips_load_files(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_file(spark, os.path.join(src, "2024", "01", "01",
                                    "LOAD00000001.parquet"),
                [(99, 10, "x", "I")], 1000)
    _write_file(spark, os.path.join(src, "2024", "01", "01", "a.parquet"),
                [(1, 10, "a", "I")], 1100)
    dim = Scd2Table(spark, str(tmp_path / "dim"), KEYS, ORDER, TRACKED,
                    num_buckets=4, op_col="Op")
    Scd2Stream(dim, src, str(tmp_path / "ckpt")).run_to_completion(spark)
    ks = {r["k"] for r in dim.read().collect()}
    assert ks == {1}


def test_wrecked_first_init_recovers(spark, tmp_path):
    """A table dir containing only non-bucket wreckage (the crashed
    first-write shape) routes the next batch to init, not apply."""
    dimdir = tmp_path / "dim"
    (dimdir / "_temporary").mkdir(parents=True)
    src = str(tmp_path / "src")
    _write_file(spark, os.path.join(src, "2024", "01", "01", "a.parquet"),
                [(1, 10, "a", "I")], 1000)
    dim = Scd2Table(spark, str(dimdir), KEYS, ORDER, TRACKED,
                    num_buckets=4, op_col="Op")
    assert not dim.has_data()
    Scd2Stream(dim, src, str(tmp_path / "ckpt")).run_to_completion(spark)
    assert dim.has_data()
    assert dim.current().count() == 1


def test_meta_sidecar_pins_bucket_count_and_keys(spark, tmp_path):
    import pytest
    p = str(tmp_path / "dim")
    t = Scd2Table(spark, p, KEYS, ORDER, TRACKED, num_buckets=64,
                  op_col="Op")
    t.init(spark.createDataFrame([(1, 10, 0, "a", "I")],
                                 "k int, t bigint, ingestion_seq bigint, "
                                 "attr string, Op string"))
    # reopening with a different count silently HONORS the stored one
    t2 = Scd2Table(spark, p, KEYS, ORDER, TRACKED, num_buckets=8,
                   op_col="Op")
    assert t2.num_buckets == 64
    t2.apply(spark.createDataFrame([(1, 20, 0, "b", "U")],
                                   "k int, t bigint, ingestion_seq bigint, "
                                   "attr string, Op string"))
    assert {r["attr"] for r in t2.current().collect()} == {"b"}
    with pytest.raises(ValueError, match="keys"):
        Scd2Table(spark, p, ["other"], ORDER, TRACKED, num_buckets=64)


def test_reinit_reasserts_constructor_definition(spark, tmp_path):
    """init() is the reconfiguration point: a re-init with different
    delete_values (or bucket count) must WIN over the stored sidecar —
    otherwise a reconfigured delete value silently folds deletes as
    updates again."""
    p = str(tmp_path / "dim")
    rows = "k int, t bigint, ingestion_seq bigint, attr string, Op string"
    t = Scd2Table(spark, p, KEYS, ORDER, TRACKED, num_buckets=8,
                  op_col="Op", delete_values=("D",))
    t.init(spark.createDataFrame([(1, 10, 0, "a", "I")], rows))
    t2 = Scd2Table(spark, p, KEYS, ORDER, TRACKED, num_buckets=16,
                   op_col="Op", delete_values=("D", "delete"))
    # before re-init: stored definition governs apply()
    assert t2.delete_values == ["D"] and t2.num_buckets == 8
    t2.init(spark.createDataFrame([(1, 10, 0, "a", "I")], rows))
    assert t2.delete_values == ["D", "delete"] and t2.num_buckets == 16
    t2.apply(spark.createDataFrame([(1, 20, 0, "a", "delete")], rows))
    assert t2.current().count() == 0          # 'delete' now recognized
    # and a fresh reopen sees the NEW stored definition
    t3 = Scd2Table(spark, p, KEYS, ORDER, TRACKED)
    assert t3.delete_values == ["D", "delete"] and t3.num_buckets == 16


def test_delete_values_with_quote_and_backslash(spark, tmp_path):
    """Configured delete values are escaped into the IN-list exactly
    like merge.py's delete predicate."""
    rows = "k int, t bigint, ingestion_seq bigint, attr string, Op string"
    t = Scd2Table(spark, str(tmp_path / "dim"), KEYS, ORDER, TRACKED,
                  num_buckets=4, op_col="Op",
                  delete_values=("D\\x", "o'p"))
    t.init(spark.createDataFrame([(1, 10, 0, "a", "I")], rows))
    t.apply(spark.createDataFrame([(1, 20, 1, "a", "D\\x")], rows))
    t.apply(spark.createDataFrame([(2, 20, 2, "b", "o'p")], rows))
    out = {(r["k"], r[DELETED_COL]) for r in
           t.read().where("is_current").collect()}
    assert out == {(1, True), (2, True)}
    assert t.current().count() == 0
