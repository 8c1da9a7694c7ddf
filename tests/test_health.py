"""Small-file / history health report (KeyedTable.health_report) and
its fleet surface (CdcFleet.health, run_maintenance's dead-ratio gate).

The reference's maintenance story is a scheduled cleanup Lambda
(AUTOMATIC_CLEANUP.md); this engine's epoch-versioned targets
additionally accumulate history until purge_versions, so maintenance
needs an observability surface that is METADATA-cheap: every number
here comes from one filesystem listing, never a Spark job."""

import datetime as dt

from pyspark.sql import Row

from firebolt_cdc_lambda_spark.config import TableKeys
from firebolt_cdc_lambda_spark.operators.merge import KeyedTable
from firebolt_cdc_lambda_spark.pipeline import CdcPipeline
from firebolt_cdc_lambda_spark.streaming.fleet import CdcFleet

TS = dt.datetime(2024, 1, 1, 10, 0)


def base_df(spark, n=20):
    return spark.createDataFrame(
        [Row(k=i, v=f"v{i}") for i in range(n)])


def test_plain_table_all_live(spark, tmp_path):
    kt = KeyedTable(spark, str(tmp_path / "t"), ["k"], num_buckets=4)
    kt.init(base_df(spark))
    r = kt.health_report()
    assert r["versioned"] is False and r["manifest_entries"] == 0
    assert r["dead_files"] == 0 and r["dead_ratio"] == 0.0
    assert r["live_files"] == sum(kt.file_stats().values()) >= 1
    assert r["live_bytes"] > 0
    assert r["max_bucket_bytes"] >= r["mean_bucket_bytes"] > 0
    assert r["bucket_bytes_skew"] >= 1.0


def test_small_file_threshold(spark, tmp_path):
    kt = KeyedTable(spark, str(tmp_path / "t"), ["k"], num_buckets=4)
    kt.init(base_df(spark))
    # tiny fixtures: every live file is "small" under the default 32 MiB
    assert kt.health_report()["small_live_files"] == \
        kt.health_report()["live_files"]
    assert kt.health_report(small_file_bytes=1)["small_live_files"] == 0


def test_absent_table_reports_empty(spark, tmp_path):
    kt = KeyedTable(spark, str(tmp_path / "missing"), ["k"])
    r = kt.health_report()
    assert r["live_files"] == 0 and r["dead_files"] == 0
    assert r["dead_ratio"] == 0.0 and r["bucket_bytes_skew"] == 1.0


def test_versioned_history_counts_dead_until_purge(spark, tmp_path):
    kt = KeyedTable(spark, str(tmp_path / "t"), ["k"], num_buckets=4,
                    versioned=True)
    kt.init(base_df(spark))
    r0 = kt.health_report()
    assert r0["dead_files"] == 0 and r0["manifest_entries"] == 1
    # every merge writes fresh epoch leaves for touched buckets; the
    # superseded leaves are history (readable via as_of, counted dead)
    for i in range(3):
        kt.merge_batch(spark.createDataFrame(
            [Row(k=j, v=f"u{i}_{j}", Op="U") for j in range(20)]))
    r1 = kt.health_report()
    assert r1["manifest_entries"] == 4
    assert r1["dead_files"] > 0 and r1["dead_bytes"] > 0
    assert 0.0 < r1["dead_ratio"] < 1.0
    # live view is exactly the current snapshot, independent of history
    assert r1["live_files"] == r0["live_files"]
    kt.purge_versions(keep_last=1)
    r2 = kt.health_report()
    # keep_last=1 retains precisely the live (bucket, epoch) leaves
    assert r2["dead_files"] == 0 and r2["dead_ratio"] == 0.0
    assert r2["live_bytes"] == r1["live_bytes"]
    assert kt.read().count() == 20


def test_versioned_still_referenced_old_epoch_is_live(spark, tmp_path):
    """A bucket untouched since init keeps resolving to epoch 0 — its
    file is LIVE even though newer epochs exist for other buckets."""
    kt = KeyedTable(spark, str(tmp_path / "t"), ["k"], num_buckets=8,
                    versioned=True)
    kt.init(base_df(spark, n=40))
    kt.merge_batch(spark.createDataFrame([Row(k=0, v="u", Op="U")]))
    r = kt.health_report()
    # exactly the touched bucket's superseded leaf is dead
    assert r["dead_files"] == 1
    assert r["live_files"] == sum(kt.file_stats().values()) - 1


def write_file(spark, root, table, name, rows):
    path = f"{root}/fair/{table}/2024/01/01/{name}"
    spark.createDataFrame(rows).coalesce(1).write.mode(
        "overwrite").parquet(path)


def test_fleet_health_and_dead_ratio_gate(spark, tmp_path):
    root = str(tmp_path / "src")
    write_file(spark, root, "users", "a.parquet", [
        Row(id=1, name="alice", Op="I", load_timestamp=TS)])
    write_file(spark, root, "nokeys", "a.parquet", [
        Row(x=1, Op="I", load_timestamp=TS)])
    pipe = CdcPipeline(
        spark, str(tmp_path / "wh"),
        TableKeys.from_json('{"users": "id", "nokeys": null}'),
        num_buckets=2, versioned=True)
    fleet = CdcFleet(pipe, root, str(tmp_path / "ckpt"))
    assert fleet.run_once(spark) == {"users": "drained"}

    health = fleet.health()
    assert set(health) == {"users"}   # null-PK table has no target
    assert health["users"]["versioned"] is True
    assert health["users"]["live_files"] >= 1
    assert pipe.table_health("nokeys") is None
    assert pipe.table_health("users")["live_bytes"] > 0

    # churn the table so history accumulates
    tgt = pipe.target_for("users", ["id"])
    for i in range(3):
        tgt.merge_batch(spark.createDataFrame(
            [Row(id=1, name=f"v{i}", Op="U", load_timestamp=TS)]))
    assert fleet.health()["users"]["dead_ratio"] > 0.5

    # gate above the measured ratio: GC must NOT run — and the
    # tombstone-free table's purge probe must not rewrite either, so the
    # whole sweep leaves history byte-identical (regression: the purge
    # used to full-rewrite every tombstone-mode table, minting a fresh
    # epoch per maintenance sweep even with zero tombstone rows)
    before = fleet.health()["users"]
    assert fleet.run_maintenance(
        keep_versions=1, purge_dead_ratio=0.99) == {
            "users": "skipped", "nokeys": "skipped"}
    assert fleet.health()["users"] == before
    assert fleet.health()["users"]["dead_ratio"] > 0.5
    # gate below it: GC runs, history reclaimed, data intact
    fleet.run_maintenance(keep_versions=1, purge_dead_ratio=0.5)
    after = fleet.health()["users"]
    assert after["dead_files"] == 0
    assert [r["name"] for r in tgt.read().collect()] == ["v2"]


def test_manifest_unreadable_degrades_to_all_live(spark, tmp_path):
    """Review regression: a versioned root whose manifest is lost (crash
    between epoch write and manifest save, or a deleted sidecar) must
    REPORT, not raise — and must classify everything LIVE so the
    dead_ratio gate can never invite purge_versions to delete history a
    manifest repair might still need."""
    import os
    kt = KeyedTable(spark, str(tmp_path / "t"), ["k"], num_buckets=4,
                    versioned=True)
    kt.init(base_df(spark))
    kt.merge_batch(spark.createDataFrame(
        [Row(k=0, v="u", Op="U")]))
    os.remove(str(tmp_path / "t" / "_epochs.json"))
    KeyedTable._sidecar_cache.clear()
    r = kt.health_report()
    assert r["manifest_unreadable"] is True
    assert r["dead_files"] == 0 and r["dead_ratio"] == 0.0
    assert r["live_files"] == sum(kt.file_stats().values())


def test_dead_ratio_gate_requires_keep_versions(spark, tmp_path):
    """Review regression: purge_dead_ratio alone would be silently
    inert (it gates the keep_versions GC) — reject it loudly."""
    import pytest
    pipe = CdcPipeline(spark, str(tmp_path / "wh"),
                       TableKeys.from_json('{"users": "id"}'),
                       num_buckets=2)
    fleet = CdcFleet(pipe, str(tmp_path / "src"), str(tmp_path / "ckpt"))
    with pytest.raises(ValueError, match="keep_versions"):
        fleet.run_maintenance(purge_dead_ratio=0.5)


def test_maintenance_reuses_precomputed_health(spark, tmp_path):
    """Round-6 advisor (low): an operator that just called fleet.health()
    can hand the report map to run_maintenance so the dead-ratio gate
    reuses that listing instead of re-listing every table.  Proof of
    reuse: a (stale) precomputed report saying dead_ratio=0 must skip
    GC on a table whose REAL dead_ratio is above the gate."""
    root = str(tmp_path / "src")
    spark.createDataFrame([Row(id=1, name="a", Op="I", load_timestamp=TS)]) \
        .coalesce(1).write.parquet(f"{root}/fair/users/2024/01/01/a.parquet")
    pipe = CdcPipeline(spark, str(tmp_path / "wh"),
                       TableKeys.from_json('{"users": "id"}'),
                       num_buckets=2, versioned=True)
    fleet = CdcFleet(pipe, root, str(tmp_path / "ckpt"))
    assert fleet.run_once(spark) == {"users": "drained"}
    tgt = pipe.target_for("users", ["id"])
    for i in range(3):
        tgt.merge_batch(spark.createDataFrame(
            [Row(id=1, name=f"v{i}", Op="U", load_timestamp=TS)]))
    real = fleet.health()
    assert real["users"]["dead_ratio"] > 0.5

    fake = {"users": dict(real["users"], dead_ratio=0.0)}
    assert fleet.run_maintenance(
        keep_versions=1, purge_dead_ratio=0.5,
        health_reports=fake) == {"users": "skipped"}
    assert fleet.health()["users"]["dead_ratio"] > 0.5   # GC did not run

    # the honest map gates normally; tables missing from the map (or
    # error rows) fall back to a fresh read
    assert fleet.run_maintenance(
        keep_versions=1, purge_dead_ratio=0.5,
        health_reports={"users": {"error": "boom"}}) == {"users": "purged"}
    assert fleet.health()["users"]["dead_files"] == 0


def test_recommended_buckets_derivation(spark, tmp_path):
    """health_report's recommended_buckets: the power-of-two count that
    puts mean live bucket bytes at the 256 MiB target — tiny fixture
    tables recommend 1; the arithmetic is pinned against live_bytes."""
    kt = KeyedTable(spark, str(tmp_path / "t"), ["k"], num_buckets=4)
    kt.init(base_df(spark))
    r = kt.health_report()
    assert r["recommended_buckets"] == 1          # tiny table
    # derivation check at a synthetic size: 3 GiB of live bytes -> 12
    # target-sized buckets -> next power of two = 16
    target = 256 * 1024 * 1024
    want = max(1, round(3 * 1024**3 / target))
    assert 1 << (want - 1).bit_length() == 16
