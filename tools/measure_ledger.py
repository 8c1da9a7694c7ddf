#!/usr/bin/env python
"""Ledger GC cost vs ledger size, flat vs day-partitioned layouts
(round-12 judge order #6's done-criterion: show GC cost FLAT vs ledger
size under the day layout).

The flat layout's GC is a full O(rows) rewrite (temp-dir-and-swap);
the day layout's GC is a pure directory drop of expired days — FS ops
∝ expired DAYS, independent of row count.  At the reference's ~10k
files/day a year of history is ~3.6M rows: the flat rewrite is a
Spark job over all of them every cadence hit, the day drop is ~30
directory deletes.

Usage: python tools/measure_ledger.py [--reps 3]
Prints one JSON line per (layout, rows) cell.
"""

from __future__ import annotations

import argparse
import datetime as dt
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from firebolt_cdc_lambda_spark.session import get_spark  # noqa: E402
from firebolt_cdc_lambda_spark.sources.ledger import (  # noqa: E402
    LEDGER_SCHEMA, PDAY_COL, FileLedger)

DAYS = 64           # history span; half expires under days_to_keep=32
KEEP = 32


def build(spark, path: str, n_rows: int, partitioned: bool) -> None:
    """Bulk-build a ledger in the target layout (record() writes one
    file per row — fine on the cadence, wrong for a 160k-row build)."""
    base = dt.datetime(2024, 1, 1)
    rows = (spark.range(n_rows)
            .select(F.concat(F.lit("fair/t/f"), "id").alias("file_key"),
                    F.lit("completed").alias("status"),
                    F.lit(None).cast("string").alias("error_message"),
                    (F.lit(base) + F.make_interval(
                        days=(F.col("id") % DAYS).cast("int")))
                    .alias("processed_at")))
    rows = spark.createDataFrame(rows.rdd, LEDGER_SCHEMA) \
        if rows.schema != LEDGER_SCHEMA else rows
    if partitioned:
        (rows.withColumn(PDAY_COL,
                         F.date_format("processed_at", "yyyyMMdd"))
         .repartition(PDAY_COL).write.mode("overwrite")
         .partitionBy(PDAY_COL).parquet(path))
    else:
        rows.coalesce(8).write.mode("overwrite").parquet(path)


def cell(spark, n_rows: int, partitioned: bool, reps: int) -> dict:
    samples = []
    for _ in range(reps):
        tmp = tempfile.mkdtemp(prefix="measure_ledger_")
        try:
            path = f"{tmp}/ledger"
            build(spark, path, n_rows, partitioned)
            led = FileLedger(spark, path, days_to_keep=KEEP,
                             partition_by_day=partitioned)
            # cutoff relative to NOW >> 2024: everything would expire;
            # pin the clock by aging days_to_keep so exactly the OLD
            # half expires — the steady-state cadence shape
            led.days_to_keep = (dt.datetime.now(dt.timezone.utc)
                                .replace(tzinfo=None)
                                - dt.datetime(2024, 1, KEEP + 1)).days
            t0 = time.time()
            led.maybe_cleanup(force=True)
            samples.append(time.time() - t0)
            kept = led._read().count()
            assert 0 < kept < n_rows, (kept, n_rows)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    return {"layout": "day" if partitioned else "flat",
            "rows": n_rows, "gc_min_s": round(min(samples), 3)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    spark = get_spark(app_name="measure-ledger")
    spark.sparkContext.setLogLevel("ERROR")
    for n in (10_000, 40_000, 160_000):
        for part in (False, True):
            print(json.dumps(cell(spark, n, part, args.reps)))


if __name__ == "__main__":
    main()
