"""Bucketed range join: boundary semantics, bucket-crossing pairs,
no duplicates."""

import datetime as dt

from pyspark.sql import Row

from firebolt_cdc_lambda_spark.operators.rangejoin import range_join


def ts(minute, sec=0):
    return dt.datetime(2024, 1, 1, 10, minute, sec)


def make(spark, rows):
    return spark.createDataFrame([Row(k=k, eid=e, t=t) for k, e, t in rows])


def test_pairs_within_gap_including_bucket_crossings(spark):
    df = make(spark, [
        (1, 1, ts(0)), (1, 2, ts(9, 59)),   # within 10min, crosses bucket
        (1, 3, ts(10, 1)),                  # 2->3 within; 1->3 outside (601s)
        (2, 4, ts(0)),                      # other key
    ])
    out = range_join(df, df, "k", "t", "t", max_gap_sec=600)
    pairs = {(r["eid_l"], r["eid_r"]) for r in out.collect()}
    assert pairs == {(1, 1), (2, 2), (3, 3), (4, 4), (1, 2), (2, 3)}


def test_strict_upper_bound(spark):
    df = make(spark, [(1, 1, ts(0)), (1, 2, ts(10, 0))])  # exactly 600s apart
    strictp = {(r["eid_l"], r["eid_r"])
               for r in range_join(df, df, "k", "t", "t", 600).collect()}
    assert (1, 2) not in strictp
    incl = {(r["eid_l"], r["eid_r"])
            for r in range_join(df, df, "k", "t", "t", 600, strict=False).collect()}
    assert (1, 2) in incl


def test_no_duplicate_pairs(spark):
    df = make(spark, [(1, i, ts(i)) for i in range(8)])
    out = range_join(df, df, "k", "t", "t", max_gap_sec=300).collect()
    pairs = [(r["eid_l"], r["eid_r"]) for r in out]
    assert len(pairs) == len(set(pairs))
