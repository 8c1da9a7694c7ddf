"""Scd2Stream: per-file micro-batches fold into the persistent SCD2
dimension; the result equals the one-shot rebuild; restart from the
checkpoint skips processed files; LOAD* files are excluded."""

import os

from pyspark.sql import functions as F

from firebolt_cdc_lambda_spark.operators.scd2 import Scd2Table, scd2_snapshot
from firebolt_cdc_lambda_spark.streaming.scd2_stream import Scd2Stream

KEYS, ORDER, TRACKED = ["k"], ["t", "seq"], ["attr"]
SCHEMA = "k int, t bigint, seq bigint, attr string"


def _write_file(spark, path, rows, mtime):
    spark.createDataFrame(rows, SCHEMA).coalesce(1) \
        .write.mode("overwrite").parquet(path)
    for root, _, fs in os.walk(path):
        for f in fs:
            os.utime(os.path.join(root, f), (mtime, mtime))
    os.utime(path, (mtime, mtime))


def _rows(lo, hi, seed_attr):
    return [(k, 10 * i, 1000 * i + k, seed_attr[(k + i) % len(seed_attr)])
            for k in range(6) for i in range(lo, hi)]


def test_stream_folds_batches_and_resumes(spark, tmp_path):
    src = str(tmp_path / "src")
    f1, f2 = _rows(0, 3, "ab"), _rows(3, 6, "ba")
    _write_file(spark, os.path.join(src, "2024", "01", "01", "a.parquet"),
                f1, 1000)
    _write_file(spark, os.path.join(src, "2024", "01", "02", "b.parquet"),
                f2, 1100)
    dim = Scd2Table(spark, str(tmp_path / "dim"), KEYS, ORDER, TRACKED,
                    num_buckets=8)
    stream = Scd2Stream(dim, src, str(tmp_path / "ckpt"))
    stream.run_to_completion(spark)

    want = sorted(tuple(r) for r in scd2_snapshot(
        spark.createDataFrame(f1 + f2, SCHEMA), KEYS, ORDER, TRACKED)
        .collect())
    got = sorted(tuple(r) for r in dim.read()
                 .select(*[f.name for f in scd2_snapshot(
                     spark.createDataFrame(f1, SCHEMA), KEYS, ORDER,
                     TRACKED).schema.fields]).collect())
    assert got == want

    # restart: nothing new -> no change (checkpoint skips both files)
    stream.run_to_completion(spark)
    got2 = sorted(tuple(r) for r in dim.read().collect())
    assert len(got2) == len(want)

    # a third file arrives; only it is processed
    f3 = _rows(6, 8, "ab")
    _write_file(spark, os.path.join(src, "2024", "01", "03", "c.parquet"),
                f3, 1200)
    stream.run_to_completion(spark)
    want3 = sorted(tuple(r) for r in scd2_snapshot(
        spark.createDataFrame(f1 + f2 + f3, SCHEMA), KEYS, ORDER, TRACKED)
        .collect())
    got3 = sorted(tuple(r) for r in dim.read().collect())
    assert len(got3) == len(want3)
    assert {t[:2] for t in got3} == {
        (r["k"], r["attr"]) for r in scd2_snapshot(
            spark.createDataFrame(f1 + f2 + f3, SCHEMA), KEYS, ORDER,
            TRACKED).collect()}


def test_stream_skips_load_files(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_file(spark, os.path.join(src, "2024", "01", "01",
                                    "LOAD00000001.parquet"),
                [(99, 10, 0, "x")], 1000)
    _write_file(spark, os.path.join(src, "2024", "01", "01", "a.parquet"),
                [(1, 10, 0, "a")], 1100)
    dim = Scd2Table(spark, str(tmp_path / "dim"), KEYS, ORDER, TRACKED,
                    num_buckets=4)
    Scd2Stream(dim, src, str(tmp_path / "ckpt")).run_to_completion(spark)
    ks = {r["k"] for r in dim.read().collect()}
    assert ks == {1}
