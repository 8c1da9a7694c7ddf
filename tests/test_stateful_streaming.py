"""Streaming-native stateful operators: cross-batch keyed state and
watermarked windows, driven through real streaming queries."""

import datetime as dt
import json

import pytest
from pyspark.sql import Row

from firebolt_cdc_lambda_spark.streaming.stateful import (
    session_window_stats,
    stateful_last_value,
    windowed_event_counts,
)

TS = dt.datetime(2024, 1, 1, 10, 0)
TS2 = dt.datetime(2024, 1, 2, 10, 0)


def write_file(spark, root, name, rows):
    spark.createDataFrame(rows).coalesce(1).write.mode("overwrite") \
        .parquet(f"{root}/{name}")


def stream_source(spark, root, schema):
    return (spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .option("recursiveFileLookup", "true")
            .parquet(root))


def run_stream(df, tmp_path, name, output_mode="update"):
    q = (df.writeStream.format("memory").queryName(name)
         .outputMode(output_mode)
         .option("checkpointLocation", f"{tmp_path}/ckpt_{name}")
         .trigger(availableNow=True).start())
    q.awaitTermination(300)
    return q


def test_stateful_last_value_cross_batch(spark, tmp_path):
    root = str(tmp_path / "src")
    write_file(spark, root, "2024/01/01/b1.parquet", [
        Row(id=1, v=10.0, Op="I", load_timestamp=TS),
        Row(id=2, v=20.0, Op="I", load_timestamp=TS),
    ])
    write_file(spark, root, "2024/01/02/b2.parquet", [
        Row(id=1, v=11.0, Op="U", load_timestamp=TS2),
        Row(id=2, v=0.0, Op="D", load_timestamp=TS2),
        Row(id=3, v=30.0, Op="I", load_timestamp=TS2),
    ])
    schema = spark.createDataFrame(
        [Row(id=1, v=1.0, Op="I", load_timestamp=TS)]).schema
    events = stream_source(spark, root, schema)
    out = stateful_last_value(events, "id")
    run_stream(out, tmp_path, "changelog")
    # memory sink in update mode keeps every emitted row; the LAST row
    # per key is the current state
    rows = spark.sql("SELECT * FROM changelog ORDER BY version_us").collect()
    final = {}
    for r in rows:
        final[r["id"]] = r
    assert set(final) == {1, 2, 3}
    assert json.loads(final[1]["payload"])["v"] == 11.0
    assert final[1]["deleted"] is False
    assert final[2]["deleted"] is True          # tombstone, not absence
    assert json.loads(final[3]["payload"])["v"] == 30.0


def test_stateful_stale_replay_loses(spark, tmp_path):
    root = str(tmp_path / "src2")
    # newer file arrives FIRST, older one second (late replay)
    write_file(spark, root, "2024/01/01/b1.parquet", [
        Row(id=1, v=99.0, Op="U", load_timestamp=TS2),
    ])
    write_file(spark, root, "2024/01/02/b2.parquet", [
        Row(id=1, v=1.0, Op="I", load_timestamp=TS),
    ])
    schema = spark.createDataFrame(
        [Row(id=1, v=1.0, Op="I", load_timestamp=TS)]).schema
    out = stateful_last_value(stream_source(spark, root, schema), "id")
    run_stream(out, tmp_path, "stale")
    rows = spark.sql("SELECT * FROM stale").collect()
    # every emission keeps the newer version (cross-batch version compare)
    assert all(json.loads(r["payload"])["v"] == 99.0 for r in rows)


def test_session_windows_streaming(spark, tmp_path):
    root = str(tmp_path / "src4")
    base = dt.datetime(2024, 1, 1, 0, 0)
    rows = (
        # user 1: two sessions (gap > 30min between minute 20 and 100)
        [Row(user_id=1, ts=base + dt.timedelta(minutes=m)) for m in (0, 10, 20, 100, 110)]
        # user 2: one session
        + [Row(user_id=2, ts=base + dt.timedelta(minutes=m)) for m in (5, 15)]
    )
    write_file(spark, root, "b.parquet", rows)
    schema = spark.createDataFrame(rows[:1]).schema
    out = session_window_stats(stream_source(spark, root, schema),
                               key="user_id", ts_col="ts", gap="30 minutes")
    run_stream(out, tmp_path, "sess", output_mode="complete")
    got = {(r["user_id"], r["session_start"].minute, r["n_events"])
           for r in spark.sql("SELECT * FROM sess").collect()}
    assert got == {(1, 0, 3), (1, 40, 2), (2, 5, 2)}


def test_windowed_counts_with_watermark(spark, tmp_path):
    root = str(tmp_path / "src3")
    base = dt.datetime(2024, 1, 1, 0, 0)
    rows = [Row(event_id=i, ts=base + dt.timedelta(minutes=3 * i)) for i in range(20)]
    write_file(spark, root, "b.parquet", rows)
    schema = spark.createDataFrame(rows[:1]).schema
    out = windowed_event_counts(stream_source(spark, root, schema),
                                ts_col="ts", window="10 minutes")
    run_stream(out, tmp_path, "win")
    got = {(r["window_start"].minute, r["n_events"])
           for r in spark.sql("SELECT * FROM win").collect()}
    # 20 events at 3-min spacing over [0, 57] -> windows 0/10/20/30/40/50
    # with ceil/floor occupancy 4,3,3,4,3,3
    assert got == {(0, 4), (10, 3), (20, 3), (30, 4), (40, 3), (50, 3)}


def test_idle_timeout_sessions(spark, tmp_path):
    """Processing-time timeout closes a session when its key goes idle:
    batch 1 opens sessions for users 1 and 2; after > timeout of idle
    wall-clock, batch 2 (user 3 only) fires their timeouts and emits the
    final closed rows."""
    import time
    from firebolt_cdc_lambda_spark.streaming.stateful import idle_timeout_sessions

    root = str(tmp_path / "src")
    write_file(spark, root, "b1.parquet", [
        Row(user_id=1, value=10.0),
        Row(user_id=1, value=5.0),
        Row(user_id=2, value=7.0),
    ])
    schema = spark.createDataFrame([Row(user_id=1, value=1.0)]).schema
    out = idle_timeout_sessions(stream_source(spark, root, schema),
                                key="user_id", timeout_ms=1500)
    q = (out.writeStream.format("memory").queryName("idle_sessions")
         .outputMode("update")
         .option("checkpointLocation", f"{tmp_path}/ckpt_idle")
         .trigger(processingTime="300 milliseconds").start())
    try:
        def rows():
            return spark.sql("SELECT * FROM idle_sessions").collect()

        deadline = time.time() + 120
        while time.time() < deadline:
            open_users = {r["user_id"] for r in rows() if not r["closed"]}
            if {1, 2} <= open_users:
                break
            time.sleep(0.3)
        else:
            raise AssertionError(f"interim rows never appeared: {rows()}")

        time.sleep(2.5)                 # > timeout_ms of idle time
        write_file(spark, root, "b2.parquet", [Row(user_id=3, value=1.0)])

        deadline = time.time() + 120
        while time.time() < deadline:
            closed = {r["user_id"]: r for r in rows() if r["closed"]}
            if {1, 2} <= set(closed):
                break
            time.sleep(0.3)
        else:
            raise AssertionError(f"timeout rows never appeared: {rows()}")
    finally:
        q.stop()

    closed = {r["user_id"]: r for r in rows() if r["closed"]}
    assert closed[1]["n_events"] == 2 and closed[1]["total_value"] == 15.0
    assert closed[2]["n_events"] == 1 and closed[2]["total_value"] == 7.0
    assert 3 not in closed              # user 3's session still open


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """Duplicate keys delivered across micro-batches within the watermark
    are emitted exactly once; state is watermark-bounded."""
    from firebolt_cdc_lambda_spark.streaming.stateful import streaming_dedup

    root = str(tmp_path / "src")
    write_file(spark, root, "2024/01/01/b1.parquet", [
        Row(id=1, v=10.0, load_timestamp=TS),
        Row(id=2, v=20.0, load_timestamp=TS),
    ])
    write_file(spark, root, "2024/01/02/b2.parquet", [
        Row(id=1, v=10.0, load_timestamp=TS),                # retried delivery
        Row(id=3, v=30.0, load_timestamp=TS),
    ])
    schema = spark.createDataFrame([Row(id=1, v=1.0, load_timestamp=TS)]).schema
    out = streaming_dedup(stream_source(spark, root, schema), ["id"])
    run_stream(out, tmp_path, "stream_dedup", output_mode="append")
    got = sorted((r["id"], r["v"]) for r in
                 spark.sql("SELECT * FROM stream_dedup").collect())
    assert got == [(1, 10.0), (2, 20.0), (3, 30.0)]
