#!/usr/bin/env python
"""Z-order vs lexicographic layout at sf0.1 lineitem scale (PLANS §5c).

Measures, on the real 600k-row lineitem table laid out as 64 parquet
files (the file-level skipping that IS partition pruning at cluster
scale):

* write cost of each layout (same shuffle shape; z-order adds only the
  interleave projection);
* the fraction of (file, query) pairs a footer min/max check skips for
  2%-wide range predicates on EACH clustered column, from parquet
  metadata only.

Usage: python tools/stress_zorder.py [sf_dir]   (prints one JSON line)
"""

from __future__ import annotations

import glob
import json
import os
import random
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from firebolt_cdc_lambda_spark.session import get_spark  # noqa: E402
from firebolt_cdc_lambda_spark.corpus.base import load_table  # noqa: E402
from firebolt_cdc_lambda_spark.operators.zorder import (  # noqa: E402
    minmax, zorder_column)

N_FILES = 64
COLS = ("l_partkey", "l_suppkey")


def file_ranges(path_glob: str, col: str):
    out = []
    for f in sorted(glob.glob(path_glob)):
        md = pq.ParquetFile(f).metadata
        mn = mx = None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    mn = s.min if mn is None else min(mn, s.min)
                    mx = s.max if mx is None else max(mx, s.max)
        out.append((mn, mx))
    return out


def skip_fraction(ranges, queries):
    skipped = total = 0
    for lo, hi in queries:
        for mn, mx in ranges:
            total += 1
            if mx < lo or mn > hi:
                skipped += 1
    return round(skipped / total, 4)


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else \
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="stress-zorder", master="local[8]",
                      shuffle_partitions=N_FILES)
    li = load_table(spark, sf, "lineitem").select(*COLS)
    n_rows = li.count()
    stats = minmax(li, list(COLS))
    tmp = tempfile.mkdtemp(prefix="stress_zorder_")
    res = {"sf_dir": sf, "rows": n_rows, "n_files": N_FILES,
           "cols": list(COLS)}
    try:
        t0 = time.time()
        (li.repartitionByRange(N_FILES, *[F.col(c) for c in COLS])
         .write.parquet(f"{tmp}/lex"))
        res["lex_write_sec"] = round(time.time() - t0, 3)
        t0 = time.time()
        (li.repartitionByRange(N_FILES, zorder_column(stats, 16))
         .write.parquet(f"{tmp}/z"))
        res["z_write_sec"] = round(time.time() - t0, 3)
        rng = random.Random(5)

        # 25 random 2%-wide ranges per column
        def qs(col):
            lo_, hi_ = stats[col]
            span = hi_ - lo_
            out = []
            for _ in range(25):
                a = lo_ + rng.random() * span * 0.98
                out.append((a, a + span * 0.02))
            return out

        for layout in ("lex", "z"):
            for col in COLS:
                ranges = file_ranges(f"{tmp}/{layout}/*.parquet", col)
                res[f"{layout}_skip_{col}"] = skip_fraction(ranges, qs(col))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
