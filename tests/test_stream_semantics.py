"""Pins of Spark's observable watermark semantics — the empirical facts
the events_stream_watermark / events_stream_dedup oracles (corpus/
analytics.py) are built on.  If a Spark upgrade shifts any of these
(filter lag, end-based vs ts-based late filter, equality boundaries,
expiry extension, final no-data-batch emission), these tests fail
locally instead of the driver gate going red.
"""

import datetime
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

BASE = 1_700_000_000


def _write_batches(spark, src, schema, files):
    """files: list of row-lists, one file per micro-batch (increasing
    mtimes, one row-tuple per entry)."""
    for i, rows in enumerate(files):
        d = os.path.join(src, f"f{i}.parquet")
        spark.createDataFrame(rows, schema).coalesce(1) \
            .write.mode("overwrite").parquet(d)
        mt = 1000 + i * 100
        for root, _, fs in os.walk(d):
            for f in fs:
                os.utime(os.path.join(root, f), (mt, mt))
        os.utime(d, (mt, mt))


def _run(spark, src, schema, build, name, ckpt):
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1")
              .option("recursiveFileLookup", "true").parquet(src))
    q = (build(stream).writeStream.outputMode("append")
         .format("memory").queryName(name)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(300)
    if q.isActive:
        q.stop()
    return spark.table(name)


def _ts(t):
    return datetime.datetime.utcfromtimestamp(BASE + t)


def test_windowed_agg_watermark_pins(spark, tmp_path):
    """One run covering the aggregation pins: (a) the late filter for
    batch N lags one cycle (uses max ts through batch N-2 - delay);
    (b) it is window-END-based and drops on equality; (c) append
    emission includes windows with end == final watermark, via the
    trailing no-data batch; (d) open windows never emit."""
    schema = T.StructType([T.StructField("ts", T.TimestampType()),
                           T.StructField("v", T.LongType())])
    files = [
        [(_ts(100), 0), (_ts(112), 0), (_ts(120), 0)],  # b0: max 120
        [(_ts(121), 0)],                                # b1: max 121
        [(_ts(105), 0)],   # b2: filter wm = wm(1) = 110; end(105) = 110
                           #     == wm -> DROPPED (equality boundary)
        [(_ts(130), 0), (_ts(119), 0)],  # b3: filter wm = wm(2) = 111;
                           #     119's end 120 > 111 -> late but KEPT
    ]
    src = str(tmp_path / "src")
    _write_batches(spark, src, schema, files)

    def build(stream):
        return (stream.withWatermark("ts", "10 seconds")
                .groupBy(F.window("ts", "10 seconds").alias("w"))
                .agg(F.count(F.lit(1)).alias("n"))
                .select(F.unix_timestamp("w.start").alias("ws"), "n"))

    out = sorted((r.ws - BASE, r.n) for r in
                 _run(spark, src, schema, build, "wm_pins",
                      str(tmp_path / "ck")).collect())
    # [100,110): 100 only (105 dropped at equality end==wm) -> n=1
    # [110,120): 112 + 119 (late but end 120 > lagged wm 111) -> n=2,
    #            and end 120 == final wm 120 -> STILL EMITTED (c)
    # [120,130): 120,121 -> end 130 > 120 -> never emitted (d)
    assert out == [(100, 1), (110, 2)], out


def test_windowed_agg_filter_is_window_end_based(spark, tmp_path):
    """A row with ts < lagged-wm < window_end is KEPT: the late filter
    compares the window END, not the raw event time."""
    schema = T.StructType([T.StructField("ts", T.TimestampType()),
                           T.StructField("v", T.LongType())])
    files = [
        [(_ts(150), 0)],              # b0: max 150 -> lagged wm(b2) = 140
        [(_ts(300), 0)],              # b1
        [(_ts(400), 0), (_ts(120), 0)],  # b2: ts 120 < 140 < end 200
    ]
    src = str(tmp_path / "src")
    _write_batches(spark, src, schema, files)

    def build(stream):
        return (stream.withWatermark("ts", "10 seconds")
                .groupBy(F.window("ts", "100 seconds").alias("w"))
                .agg(F.count(F.lit(1)).alias("n"))
                .select(F.unix_timestamp("w.start").alias("ws"), "n"))

    out = sorted((r.ws - BASE, r.n) for r in
                 _run(spark, src, schema, build, "wm_endbased",
                      str(tmp_path / "ck")).collect())
    assert (100, 2) in out, out     # 150 and the late 120 both counted


def test_dedup_within_watermark_pins(spark, tmp_path):
    """dropDuplicatesWithinWatermark pins: (a) state checked before the
    batch's own eviction (a dup in the eviction batch is still
    suppressed); (b) suppressed dups do NOT extend expiry; (c) after
    eviction the key RE-EMITS; (d) the late filter is lagged one cycle
    (a row at ts just above the two-batch-old watermark is kept)."""
    schema = T.StructType([T.StructField("k", T.StringType()),
                           T.StructField("ts", T.TimestampType())])
    files = [
        [("A", _ts(100))],                     # b0: emit A100; max 100
        [("A", _ts(105)), ("X", _ts(122))],    # b1: A suppressed (b);
                                               #     emit X; max 122
        [("Y", _ts(300)), ("H", _ts(100))],    # b2: lagged wm = 90 ->
                                               #     H100 KEPT (d); max 300
        [("A", _ts(150)), ("Z", _ts(400))],    # b3: A state expired at
                                               #     wm 112 (no extension
                                               #     by the 105 dup) ->
                                               #     RE-EMIT (b)+(c)
    ]
    src = str(tmp_path / "src")
    _write_batches(spark, src, schema, files)

    def build(stream):
        return (stream.withWatermark("ts", "10 seconds")
                .dropDuplicatesWithinWatermark(["k"])
                .select("k", F.unix_timestamp("ts").alias("t")))

    out = sorted((r.k, r.t - BASE) for r in
                 _run(spark, src, schema, build, "dd_pins",
                      str(tmp_path / "ck")).collect())
    assert out == [("A", 100), ("A", 150), ("H", 100),
                   ("X", 122), ("Y", 300), ("Z", 400)], out


def test_dedup_suppression_in_eviction_batch(spark, tmp_path):
    """A duplicate arriving in the very batch whose commit will evict
    its key's state is still SUPPRESSED — input is matched against
    state before eviction runs."""
    schema = T.StructType([T.StructField("k", T.StringType()),
                           T.StructField("ts", T.TimestampType())])
    files = [
        [("B", _ts(100))],              # b0: emit; expiry 110
        [("D", _ts(200))],              # b1: max 200 -> wm(b2) = 190
        [("B", _ts(195))],              # b2: expiry 110 <= 190 will evict
                                        #     at COMMIT, but input first ->
                                        #     suppressed
        [("B", _ts(400))],              # b3: state long gone -> re-emit
    ]
    src = str(tmp_path / "src")
    _write_batches(spark, src, schema, files)

    def build(stream):
        return (stream.withWatermark("ts", "10 seconds")
                .dropDuplicatesWithinWatermark(["k"])
                .select("k", F.unix_timestamp("ts").alias("t")))

    out = sorted((r.k, r.t - BASE) for r in
                 _run(spark, src, schema, build, "dd_evict",
                      str(tmp_path / "ck")).collect())
    assert out == [("B", 100), ("B", 400), ("D", 200)], out


def test_session_window_late_row_becomes_standalone_session(spark, tmp_path):
    """Session-window pins: (a) the late filter is end-based on the
    row's pre-merge session end (ts + gap) and lags one cycle; (b) a
    late row landing inside the gap of an ALREADY-EMITTED session is
    NOT retro-merged — it opens a standalone session, so the final
    output can contain overlapping sessions.  This corner is why the
    events_stream_sessions oracle keeps late rows out of its data."""
    schema = T.StructType([T.StructField("u", T.LongType()),
                           T.StructField("ts", T.TimestampType())])
    files = [
        [(1, _ts(100)), (1, _ts(105))],  # b0: session A [100,115)
        [(1, _ts(130))],                 # b1: max 130 -> wm(2)=120 > 115
        [(1, _ts(400))],                 # b2: commit emits A; wm(3)=390
        [(1, _ts(112))],                 # b3: filter wm = wm(2) = 120;
                                         #     ts 112 < 120 < ts+gap 122
                                         #     -> KEPT (end-based), and A
                                         #     is gone -> standalone
    ]
    src = str(tmp_path / "src")
    _write_batches(spark, src, schema, files)

    def build(stream):
        return (stream.withWatermark("ts", "10 seconds")
                .groupBy("u", F.session_window("ts", "10 seconds").alias("s"))
                .agg(F.count(F.lit(1)).alias("n"))
                .select(F.unix_timestamp("s.start").alias("ss"),
                        F.unix_timestamp("s.end").alias("se"), "n"))

    out = sorted((r.ss - BASE, r.se - BASE, r.n) for r in
                 _run(spark, src, schema, build, "sw_corner",
                      str(tmp_path / "ck")).collect())
    # A emitted with its pre-late shape; the late 112 overlaps it as a
    # separate session; 130's session closed by the final wm 390; the
    # 400 session stays open (end 410 > 390) and never emits.
    assert out == [(100, 115, 2), (112, 122, 1), (130, 140, 1)], out


def test_stream_stream_join_pins(spark, tmp_path):
    """Stream-stream inner join pins: (a) a pair whose sides arrive in
    DIFFERENT micro-batches is emitted through the join state store,
    exactly once; (b) the join's lateness frontier is the SAME
    one-cycle-lagged watermark aggregation uses (filter for batch N =
    max ts through batch N-2, taken as the MIN across sides, minus
    delay) — a right row below it is LOST even though a stored left
    row is in range, while one cycle earlier the identical row is
    kept.  (b) is the eviction/late-filter reality that makes the
    corpus query's delay >= disorder sizing load-bearing."""
    lschema = T.StructType([T.StructField("u", T.LongType()),
                            T.StructField("vid", T.LongType()),
                            T.StructField("v_ts", T.TimestampType())])
    rschema = T.StructType([T.StructField("pu", T.LongType()),
                            T.StructField("pid", T.LongType()),
                            T.StructField("p_ts", T.TimestampType())])
    lfiles = [
        [(1, 10, _ts(100))],            # b0: view v1@100
        [(1, 20, _ts(200))],            # b1: view v2@200 (advances wm)
        [],                             # b2
        [],                             # b3
    ]
    rfiles = [
        [],                             # b0: nothing
        [(1, 11, _ts(105)), (1, 21, _ts(200))],  # b1: p@105 matches v1
                                        #     ACROSS the batch boundary
        [(1, 12, _ts(104))],            # b2: frontier = through b0 =
                                        #     min(100, nothing)-10 -> 0,
                                        #     so this late row still
                                        #     JOINS v1 (one-cycle lag)
        [(1, 31, _ts(103))],            # b3: frontier = through b1 =
                                        #     min(200,200)-10 = 190 ->
                                        #     LOST despite v1 in range
    ]
    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    _write_batches(spark, lsrc, lschema, lfiles)
    _write_batches(spark, rsrc, rschema, rfiles)

    def src(path, schema):
        return (spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", "1")
                .option("recursiveFileLookup", "true").parquet(path))

    j = (src(lsrc, lschema).withWatermark("v_ts", "10 seconds")
         .join(src(rsrc, rschema).withWatermark("p_ts", "10 seconds"),
               F.expr("u = pu AND p_ts >= v_ts "
                      "AND p_ts < v_ts + INTERVAL 10 SECONDS"))
         .select("vid", "pid"))
    q = (j.writeStream.outputMode("append").format("memory")
         .queryName("ssj_pins")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(300)
    if q.isActive:
        q.stop()
    out = sorted((r.vid, r.pid) for r in spark.table("ssj_pins").collect())
    assert out == [(10, 11), (10, 12), (20, 21)]


def test_stream_stream_outer_join_pins(spark, tmp_path):
    """Left-outer join emission pins (the events_stream_join_outer
    oracle's model): (a) matched pairs emit as inner; (b) an unmatched
    left row emits its null row once its join window closes below the
    final watermark; (c) the final watermark is the MIN across sides of
    each side's own max event time minus delay — here the LEFT side's
    max (300) caps it at 290, so the unmatched left@300 (window end
    310 > 290) is WITHHELD even though the right side reached 400."""
    lschema = T.StructType([T.StructField("u", T.LongType()),
                            T.StructField("vid", T.LongType()),
                            T.StructField("v_ts", T.TimestampType())])
    rschema = T.StructType([T.StructField("pu", T.LongType()),
                            T.StructField("pid", T.LongType()),
                            T.StructField("p_ts", T.TimestampType())])
    lfiles = [
        [(1, 10, _ts(100)), (1, 20, _ts(110))],  # v1 matched; v2 never
        [(1, 30, _ts(300))],                     # v3 unmatched, trailing
        [],
    ]
    rfiles = [
        [],
        [(1, 11, _ts(105))],                     # matches v1
        [(1, 99, _ts(400))],                     # advances right side only
    ]
    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    _write_batches(spark, lsrc, lschema, lfiles)
    _write_batches(spark, rsrc, rschema, rfiles)

    def src(path, schema):
        return (spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", "1")
                .option("recursiveFileLookup", "true").parquet(path))

    j = (src(lsrc, lschema).withWatermark("v_ts", "10 seconds")
         .join(src(rsrc, rschema).withWatermark("p_ts", "10 seconds"),
               F.expr("u = pu AND p_ts >= v_ts "
                      "AND p_ts < v_ts + INTERVAL 10 SECONDS"),
               "left_outer")
         .select("vid", "pid"))
    q = (j.writeStream.outputMode("append").format("memory")
         .queryName("ssjo_pins")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(300)
    if q.isActive:
        q.stop()
    out = sorted((r.vid, r.pid if r.pid is not None else -1)
                 for r in spark.table("ssjo_pins").collect())
    # v2's null row emitted (window end 120 <= 290); v3 withheld
    assert out == [(10, 11), (20, -1)]


def test_sliding_window_late_filter_is_per_window(spark, tmp_path):
    """Sliding windows (20s, slide 10s): a late row belonging to TWO
    windows is filtered per (row, window) pair, not per row — its older
    window's contribution (end <= lagged wm) is dropped while the same
    row still counts in its newer window (end > lagged wm).  The
    window-END-based, one-cycle-lagged frontier of the tumbling pin
    therefore applies after window EXPANSION."""
    schema = T.StructType([T.StructField("ts", T.TimestampType()),
                           T.StructField("v", T.LongType())])
    files = [
        [(_ts(100), 1)],   # windows [90,110) and [100,120)
        [(_ts(115), 1)],   # max 115 -> lagged wm for b3 = 105
        [(_ts(300), 1)],   # advances final wm to 290
        [(_ts(95), 1)],    # late: [80,100) end 100 <= 105 -> dropped;
                           #       [90,110) end 110 >  105 -> KEPT
    ]
    src = str(tmp_path / "src")
    _write_batches(spark, src, schema, files)

    def build(stream):
        return (stream.withWatermark("ts", "10 seconds")
                .groupBy(F.window("ts", "20 seconds", "10 seconds")
                         .alias("w"))
                .agg(F.count(F.lit(1)).alias("n"))
                .select(F.unix_timestamp("w.start").alias("ws"), "n"))

    out = sorted((r.ws - BASE, r.n) for r in
                 _run(spark, src, schema, build, "slide_pins",
                      str(tmp_path / "ck")).collect())
    # [80,100) never emits (its only row was dropped); [90,110) counts
    # BOTH 100 and the late 95; [100,120) = {100,115}; [110,130) = {115}
    assert out == [(90, 2), (100, 2), (110, 1)], out


def test_stream_stream_full_outer_pins(spark, tmp_path):
    """Full-outer pins (the events_stream_join_full oracle's model):
    matched pairs as inner; unmatched-LEFT null rows on window closure
    (the left_outer rule); unmatched-RIGHT null rows once no future
    left can match — the frontier is the right row's OWN timestamp,
    STRICT: a right row exactly AT the final watermark is withheld."""
    lschema = T.StructType([T.StructField("u", T.LongType()),
                            T.StructField("vid", T.LongType()),
                            T.StructField("v_ts", T.TimestampType())])
    rschema = T.StructType([T.StructField("pu", T.LongType()),
                            T.StructField("pid", T.LongType()),
                            T.StructField("p_ts", T.TimestampType())])
    lfiles = [
        [(1, 10, _ts(100))],                     # matched by p@105
        [(1, 98, _ts(400))],                     # matches p@400
        [],
    ]
    rfiles = [
        [(1, 11, _ts(105)), (1, 20, _ts(110))],  # 11 matches; 20 never
        [(1, 30, _ts(390)), (1, 99, _ts(400))],  # 30 unmatched AT the
        [],                                      #   final wm (390)
    ]
    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    _write_batches(spark, lsrc, lschema, lfiles)
    _write_batches(spark, rsrc, rschema, rfiles)

    def src(path, schema):
        return (spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", "1")
                .option("recursiveFileLookup", "true").parquet(path))

    j = (src(lsrc, lschema).withWatermark("v_ts", "10 seconds")
         .join(src(rsrc, rschema).withWatermark("p_ts", "10 seconds"),
               F.expr("u = pu AND p_ts >= v_ts "
                      "AND p_ts < v_ts + INTERVAL 10 SECONDS"),
               "full_outer")
         .select("vid", "pid"))
    q = (j.writeStream.outputMode("append").format("memory")
         .queryName("ssjf_pins")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(300)
    if q.isActive:
        q.stop()
    out = sorted((r.vid if r.vid is not None else -1,
                  r.pid if r.pid is not None else -1)
                 for r in spark.table("ssjf_pins").collect())
    # fwm = min(400, 400) - 10 = 390.  p@110 null-emits (110 < 390);
    # p@390 withheld (390 < 390 is false — STRICT); both matches emit.
    assert out == [(-1, 20), (10, 11), (98, 99)], out
