"""Property-based CDC semantics: random event streams vs a pure-Python
reference fold of the dedup cascade + merge contract."""

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import types as T

from firebolt_cdc_lambda_spark.operators.dedup import deduplicate
from firebolt_cdc_lambda_spark.operators.merge import merge_cdc

_OP_RANK = {"D": 3, "U": 2, "I": 1}
BASE = dt.datetime(2024, 1, 1)

EVENT = st.fixed_dictionaries({
    "id": st.integers(min_value=0, max_value=5),
    "Op": st.sampled_from(["I", "U", "D"]),
    "load_ts_h": st.integers(min_value=0, max_value=3),     # coarse -> ties
    "updated_h": st.one_of(st.none(), st.integers(min_value=0, max_value=5)),
    "v": st.integers(min_value=0, max_value=100),
})

SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("Op", T.StringType()),
    T.StructField("load_timestamp", T.TimestampType()),
    T.StructField("updated", T.TimestampType()),
    T.StructField("v", T.LongType()),
    T.StructField("ingestion_seq", T.LongType()),
])


def to_rows(events):
    return [
        (e["id"], e["Op"], BASE + dt.timedelta(hours=e["load_ts_h"]),
         None if e["updated_h"] is None else BASE + dt.timedelta(hours=e["updated_h"]),
         e["v"], i + 1)
        for i, e in enumerate(events)
    ]


def ref_winner(rows_for_key):
    """The cascade contract (lambda/handler.py:345-404) as a plain fold."""
    def sort_key(r):
        _id, op, load_ts, updated, v, seq = r
        upd_epoch = 0 if updated is None else updated.timestamp()
        return (load_ts, _OP_RANK.get(op, 0), upd_epoch, seq)
    return max(rows_for_key, key=sort_key)


def ref_dedup(rows):
    by_key = {}
    for r in rows:
        by_key.setdefault(r[0], []).append(r)
    return {k: ref_winner(v) for k, v in by_key.items()}


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(EVENT, min_size=1, max_size=25))
def test_dedup_matches_reference_fold(spark, events):
    rows = to_rows(events)
    df = spark.createDataFrame(rows, SCHEMA)
    got = {r["id"]: (r["Op"], r["v"], r["ingestion_seq"])
           for r in deduplicate(df, ["id"]).collect()}
    want = {k: (r[1], r[4], r[5]) for k, r in ref_dedup(rows).items()}
    assert got == want


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(EVENT, min_size=1, max_size=20),
       st.lists(EVENT, min_size=1, max_size=20))
def test_merge_matches_reference_fold(spark, batch1, batch2):
    """Bootstrap from batch1 (deletes dropped), then merge batch2's
    winners: D removes, I/U upserts, untouched keys survive."""
    rows1, rows2 = to_rows(batch1), to_rows(batch2)
    d1, d2 = ref_dedup(rows1), ref_dedup(rows2)
    target_state = {k: r for k, r in d1.items() if r[1] != "D"}
    expect = dict(target_state)
    for k, r in d2.items():
        if r[1] == "D":
            expect.pop(k, None)
        else:
            expect[k] = r

    target = spark.createDataFrame(
        [(k, r[4]) for k, r in target_state.items()] or
        [(None, None)], "id long, v long").where("id IS NOT NULL")
    staging = deduplicate(spark.createDataFrame(rows2, SCHEMA), ["id"])
    got = {r["id"]: r["v"] for r in merge_cdc(target, staging, ["id"]).collect()}
    assert got == {k: r[4] for k, r in expect.items()}


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(EVENT, min_size=1, max_size=15),
       st.lists(EVENT, min_size=1, max_size=20))
def test_merge_raw_batch_equals_dedup_then_merge(spark, batch1, batch2):
    """The fused path (merge_raw_batch on a RAW duplicate-keyed batch)
    must land exactly the state of the two-step deduplicate + merge_batch
    path, and report did_dedup correctly."""
    import tempfile
    from firebolt_cdc_lambda_spark.operators.merge import KeyedTable

    rows1, rows2 = to_rows(batch1), to_rows(batch2)
    boot = {k: r for k, r in ref_dedup(rows1).items() if r[1] != "D"}
    boot_df = spark.createDataFrame(
        [(k, r[4]) for k, r in boot.items()] or
        [(None, None)], "id long, v long").where("id IS NOT NULL")
    raw2 = spark.createDataFrame(rows2, SCHEMA)

    paths = [tempfile.mkdtemp(prefix="prop_raw_") + "/t" for _ in range(2)]
    kt_two_step = KeyedTable(spark, paths[0], ["id"], num_buckets=4)
    kt_two_step.init(boot_df)
    kt_two_step.merge_batch(deduplicate(raw2, ["id"]))

    kt_fused = KeyedTable(spark, paths[1], ["id"], num_buckets=4)
    kt_fused.init(boot_df)
    _, n_rows, did_dedup = kt_fused.merge_raw_batch(raw2)

    got_two = {r["id"]: r["v"] for r in kt_two_step.read().collect()}
    got_fused = {r["id"]: r["v"] for r in kt_fused.read().collect()}
    assert got_fused == got_two
    assert did_dedup == (len({r[0] for r in rows2}) != len(rows2))
    assert n_rows == len({r[0] for r in rows2})


@settings(max_examples=4, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.lists(EVENT, min_size=1, max_size=12),
                min_size=2, max_size=3),
       st.integers(min_value=1, max_value=2),   # maintenance after batch i
       st.sampled_from([2, 8, 16]),             # rebucket target
       st.booleans())                           # also cluster_by
def test_keyedtable_maintenance_matches_reference_fold(
        spark, batches, maint_after, new_buckets, do_cluster):
    """Random merge sequences interleaved with rebucket/cluster_by must
    leave exactly the state of the pure-Python fold, including when the
    post-maintenance merges go through a FRESH handle constructed with a
    stale bucket count (the persisted meta must win)."""
    import tempfile
    from firebolt_cdc_lambda_spark.operators.merge import KeyedTable

    path = tempfile.mkdtemp(prefix="prop_maint_") + "/t"
    rows_per_batch = [to_rows(b) for b in batches]

    # reference fold: bootstrap = non-delete winners of batch 0
    state = {k: r[4] for k, r in ref_dedup(rows_per_batch[0]).items()
             if r[1] != "D"}
    for rows in rows_per_batch[1:]:
        for k, r in ref_dedup(rows).items():
            if r[1] == "D":
                state.pop(k, None)
            else:
                state[k] = r[4]

    kt = KeyedTable(spark, path, ["id"], num_buckets=4)
    boot = deduplicate(spark.createDataFrame(rows_per_batch[0], SCHEMA), ["id"])
    kt.init(boot.where("Op <> 'D'").select("id", "v"))
    for i, rows in enumerate(rows_per_batch[1:], start=1):
        if i == maint_after:
            kt.rebucket(new_buckets)
            if do_cluster:
                kt.cluster_by(["v"])
            # all further merges: fresh handle with a stale constructor
            # guess — must pick up the persisted count
            kt = KeyedTable(spark, path, ["id"], num_buckets=4)
            assert kt.num_buckets == new_buckets
        stg = deduplicate(spark.createDataFrame(rows, SCHEMA), ["id"])
        kt.merge_batch(stg)

    got = {r["id"]: r["v"] for r in kt.read().collect()}
    assert got == state
    assert set(kt.file_stats()) <= set(range(kt.num_buckets))
