"""Pure-streaming stateful CDC operators.

The snapshot-table pipeline (cdc_stream.py) is the production path; this
module is the *streaming-native* variant SURVEY §2.9 sketches
("flatMapGroupsWithState for a pure-streaming variant"): per-key state
lives in the Structured Streaming state store instead of a Parquet
snapshot, and each micro-batch emits the keys whose current value
changed — i.e. a changelog stream of the production table.

* ``stateful_last_value``: applyInPandasWithState keyed last-writer-wins
  with Op-priority tie-breaks and delete tombstones.  State per key is
  (version epoch, op rank, payload JSON) — tiny and bounded, so a
  1000-executor cluster shards billions of keys across the state store
  with RocksDB backend if configured.
* ``windowed_event_counts``: event-time tumbling-window aggregation with
  a watermark — the late-data policy the reference lacks entirely
  (SURVEY §2.9 row "Late/out-of-order data").

Arrow-batched pandas state functions keep the Python boundary columnar.
"""

from __future__ import annotations

import json
from collections.abc import Iterator, Sequence
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OP_RANK = {"D": 3, "U": 2, "I": 1}

STATE_SCHEMA = T.StructType([
    T.StructField("version_us", T.LongType()),
    T.StructField("op_rank", T.IntegerType()),
    T.StructField("payload", T.StringType()),     # JSON of non-key columns
    T.StructField("deleted", T.BooleanType()),
])


def changelog_schema(key_field: T.StructField) -> T.StructType:
    return T.StructType([
        key_field,
        T.StructField("payload", T.StringType()),
        T.StructField("deleted", T.BooleanType()),
        T.StructField("version_us", T.LongType()),
    ])


def stateful_last_value(
    events: DataFrame,
    key: str,
    version_col: str = "load_timestamp",
    op_col: str = "Op",
    delete_values: Sequence[str] = ("D",),
) -> DataFrame:
    """Streaming keyed last-value store emitting a changelog.

    ``events`` must be a streaming DataFrame.  Within and across batches
    the winner per key is max (version, op-rank) — the first two levels
    of the dedup cascade (lambda/handler.py:376-387); state makes the
    cross-batch comparison the reference could not do (SURVEY §7.4).
    """
    key_field = events.schema[key]
    payload_cols = [c for c in events.columns
                    if c not in {key, version_col, op_col}]
    out_schema = changelog_schema(key_field)
    deletes = set(delete_values)

    def fn(key_tuple: Any, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            version_us, op_rank, payload, deleted = state.get
        else:
            version_us, op_rank, payload, deleted = -1, -1, None, False
        for pdf in pdfs:
            for _, row in pdf.iterrows():
                ver = row[version_col]
                ver_us = int(pd.Timestamp(ver).value // 1000) if ver is not None else 0
                op = row[op_col] if op_col in pdf.columns else "I"
                rank = _OP_RANK.get(op, 0)
                if (ver_us, rank) >= (version_us, op_rank):
                    version_us, op_rank = ver_us, rank
                    deleted = op in deletes
                    payload = json.dumps(
                        {c: (None if pd.isna(row[c]) else
                             (row[c].item() if hasattr(row[c], "item") else row[c]))
                         for c in payload_cols})
        state.update((version_us, op_rank, payload, deleted))
        yield pd.DataFrame({
            key: [key_tuple[0]],
            "payload": [payload],
            "deleted": [deleted],
            "version_us": [version_us],
        })

    return (events.groupBy(key)
            .applyInPandasWithState(fn, out_schema, STATE_SCHEMA,
                                    "update", GroupStateTimeout.NoTimeout))


def idle_timeout_sessions(events: DataFrame, key: str = "user_id",
                          value_col: str = "value",
                          timeout_ms: int = 30_000) -> DataFrame:
    """Processing-time idle-timeout sessions — the custom stateful shape
    Spark's native ``session_window`` cannot express (it is event-time /
    gap-based only).

    A key's session accumulates (count, sum) across micro-batches; when
    no batch has carried events for the key for ``timeout_ms`` of
    *processing* time, the next micro-batch fires the group's timeout and
    emits the final ``closed=true`` row, then drops the state.  Interim
    ``closed=false`` rows are emitted as batches arrive (update mode).

    Scale notes: state is two scalars per live key, partitioned by key
    across executors by the streaming state store; timed-out groups are
    invoked with no input rows, so a quiet fleet costs one state-store
    sweep per batch, not a shuffle of data.
    """
    key_field = events.schema[key]
    out_schema = T.StructType([
        key_field,
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("closed", T.BooleanType()),
    ])
    state_schema = T.StructType([
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ])

    def fn(key_tuple: Any, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            n, total = state.get
            state.remove()
            yield pd.DataFrame({key: [key_tuple[0]], "n_events": [n],
                                "total_value": [total], "closed": [True]})
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            if value_col in pdf.columns:
                total += float(pdf[value_col].fillna(0.0).sum())
        state.update((n, float(total)))
        state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame({key: [key_tuple[0]], "n_events": [n],
                            "total_value": [total], "closed": [False]})

    return (events.groupBy(key)
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "update",
                                    GroupStateTimeout.ProcessingTimeTimeout))


def streaming_dedup(events: DataFrame, keys: Sequence[str],
                    ts_col: str = "load_timestamp",
                    watermark: str = "1 hour") -> DataFrame:
    """Watermark-bounded streaming dedup: rows with the same key arriving
    within ``watermark`` of each other are emitted once (the
    streaming-native form of the reference's duplicate-delivery
    protection, FIX_DUPLICATE_INSERTS_ON_RETRY.md — retried uploads land
    minutes apart, far inside any sane watermark).

    Uses ``dropDuplicatesWithinWatermark``, so state per key is evicted
    once the watermark passes — bounded memory on an unbounded stream,
    unlike plain ``dropDuplicates`` whose state grows forever."""
    return (events.withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(list(keys)))


def windowed_event_counts(events: DataFrame, ts_col: str = "ts",
                          window: str = "10 minutes",
                          watermark: str = "30 minutes") -> DataFrame:
    """Event-time tumbling windows with a late-data watermark."""
    return (events
            .withWatermark(ts_col, watermark)
            .groupBy(F.window(ts_col, window).alias("win"))
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(F.col("win.start").alias("window_start"),
                    F.col("win.end").alias("window_end"),
                    "n_events"))


def session_window_stats(events: DataFrame, key: str = "user_id",
                         ts_col: str = "ts", gap: str = "30 minutes",
                         watermark: str = "1 hour") -> DataFrame:
    """Event-time SESSION windows (gap-based) per key — the native
    streaming form of the batch sessionization in corpus/analytics.py.
    State for a session closes once the watermark passes its end."""
    return (events
            .withWatermark(ts_col, watermark)
            .groupBy(F.col(key), F.session_window(ts_col, gap).alias("sess"))
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(key,
                    F.col("sess.start").alias("session_start"),
                    F.col("sess.end").alias("session_end"),
                    "n_events"))
