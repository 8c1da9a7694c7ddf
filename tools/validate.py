#!/usr/bin/env python
"""Differential validation client — the Spark analogue of the reference's
``validate_data_redshift_firebolt.py`` (entry point 3, SURVEY §3.3):
run every corpus query on Spark AND its DuckDB oracle, compare
row-count / schema / order-insensitive values, and write a CSV report.

Usage:
    python tools/validate.py [--sf-dir /root/testdata/sf0.01] [--out report.csv]
                             [--only name1,name2]
"""

from __future__ import annotations

import argparse
import csv
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from firebolt_cdc_lambda_spark.corpus import ALL_QUERIES  # noqa: E402
from firebolt_cdc_lambda_spark.corpus.base import TABLES  # noqa: E402
from firebolt_cdc_lambda_spark.corpus.compare import (  # noqa: E402
    canon_rows, schema_mismatches)
from firebolt_cdc_lambda_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--out", default="validation_report.csv")
    ap.add_argument("--only", default=None)
    ap.add_argument("--gate", action="store_true",
                    help="run only the driver's 50 gate slots, in "
                         "priority order (ALL_QUERIES is priority-first)")
    ap.add_argument("--plain", action="store_true",
                    help="plain default SparkSession (the driver's "
                         "condition) instead of the tuned session")
    args = ap.parse_args()

    if args.plain:
        from pyspark.sql import SparkSession
        spark = (SparkSession.builder.master("local[*]")
                 .appName("fcls-validate-plain").getOrCreate())
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    else:
        spark = get_spark(app_name="fcls-validate")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'")

    names = (list(ALL_QUERIES)[:50] if args.gate else sorted(ALL_QUERIES))
    if args.only:
        names = [n for n in names if n in set(args.only.split(","))]

    results = []
    n_fail = 0
    for name in names:
        q = ALL_QUERIES[name]
        t0 = time.time()
        try:
            df = q.fn(spark, args.sf_dir)
            got_rows = [tuple(r) for r in df.collect()]
            got_cols = df.columns
            elapsed = time.time() - t0
            if q.oracle is None:
                results.append((name, "ROWS_ONLY", len(got_rows), "", elapsed))
                print(f"  ~ {name:<34} {len(got_rows):>7} rows   (rows-only) {elapsed:5.1f}s")
                continue
            exp_tbl = con.sql(q.oracle).arrow()  # driver-fidelity: Arrow
            exp_cols = exp_tbl.schema.names
            exp_rows = [tuple(d.values()) for d in exp_tbl.to_pylist()]
            bad_types = schema_mismatches(df.dtypes, exp_tbl.schema)
            if sorted(got_cols) != sorted(exp_cols):
                status, detail = "SCHEMA_MISMATCH", f"{sorted(got_cols)} vs {sorted(exp_cols)}"
            elif bad_types:
                status, detail = "EXPOSED_TYPE_MISMATCH", str(bad_types)
            elif len(got_rows) != len(exp_rows):
                status, detail = "COUNT_MISMATCH", f"{len(got_rows)} vs {len(exp_rows)}"
            elif canon_rows(got_rows, got_cols) != canon_rows(exp_rows, exp_cols):
                status, detail = "VALUE_MISMATCH", ""
            else:
                status, detail = "MATCH", ""
            if status != "MATCH":
                n_fail += 1
            mark = "ok" if status == "MATCH" else "XX"
            print(f"  {mark} {name:<34} {len(got_rows):>7} rows   {status} {elapsed:5.1f}s")
            results.append((name, status, len(got_rows), detail, elapsed))
        except Exception as exc:  # noqa: BLE001
            n_fail += 1
            results.append((name, "ERROR", 0, str(exc)[:200], time.time() - t0))
            print(f"  XX {name:<34} ERROR: {str(exc)[:120]}")

    with open(args.out, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["query", "status", "rows", "detail", "seconds"])
        for r in results:
            w.writerow(r)
    matched = sum(1 for r in results if r[1] == "MATCH")
    print(f"\n{matched}/{len([r for r in results if r[1] != 'ROWS_ONLY'])} oracle-checked "
          f"queries match ({len(results)} total) -> {args.out}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
