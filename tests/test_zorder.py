"""Z-order clustering: interleave math, layout-only contract, and the
measured pruning claim (z-order skips files on EITHER filter column;
lexicographic only on the leading one)."""

import glob
import random

import pyarrow.parquet as pq
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from firebolt_cdc_lambda_spark.operators.merge import KeyedTable
from firebolt_cdc_lambda_spark.operators.zorder import (
    minmax, zorder_column, zorder_py)


def df_of(spark, rows):
    return spark.createDataFrame(rows)


def test_zorder_expression_matches_python_reference(spark):
    """The Column interleave is bit-for-bit the reference interleave."""
    rng = random.Random(11)
    rows = [Row(a=rng.randrange(1000), b=rng.randrange(1 << 16))
            for _ in range(300)]
    df = df_of(spark, rows)
    stats = minmax(df, ["a", "b"])
    bits = 16
    top = (1 << bits) - 1

    def grid(v, lo, hi):
        g = int((float(v) - lo) * (top / (hi - lo)))
        return max(0, min(top, g))

    out = df.withColumn("z", zorder_column(stats, bits)).collect()
    for r in out:
        ga = grid(r["a"], stats["a"][0], stats["a"][1])
        gb = grid(r["b"], stats["b"][0], stats["b"][1])
        assert r["z"] == zorder_py([ga, gb], bits), (r["a"], r["b"])


def test_zorder_edge_cases(spark):
    # constant column and NULLs both map to grid 0 instead of crashing
    df = df_of(spark, [Row(a=5, b=None), Row(a=5, b=3), Row(a=5, b=9)])
    stats = minmax(df, ["a", "b"])
    zs = [r["z"] for r in
          df.withColumn("z", zorder_column(stats, 16)).collect()]
    assert all(z >= 0 for z in zs)
    # a(constant) contributes nothing; NULL b sorts with the b-min cell
    assert zs[0] == 0
    # bits capped so n_cols*bits <= 62
    with pytest.raises(ValueError):
        zorder_column({f"c{i}": (0.0, 1.0) for i in range(70)}, 16)


def test_zorder_negative_double_timestamp_columns(spark):
    """The grid cast handles negative ints, doubles, and timestamps
    (cast-to-double epoch seconds) — any orderable numericizable column
    z-orders without constant-collapse."""
    import datetime
    rng = random.Random(1)
    rows = [Row(a=rng.randrange(-500, 500),
                t=datetime.datetime(2024, 1, 1)
                + datetime.timedelta(seconds=rng.randrange(10**6)),
                d=rng.random() * 200 - 100)
            for _ in range(200)]
    df = df_of(spark, rows)
    for cols in (["a", "d"], ["a", "t"], ["t", "d"]):
        stats = minmax(df, cols)
        zs = [r.z for r in
              df.withColumn("z", zorder_column(stats, 16)).collect()]
        assert all(z is not None and 0 <= z < (1 << 62) for z in zs), cols
        assert len(set(zs)) > 150, (cols, len(set(zs)))


def test_keyed_table_zorder_layout_only(spark, tmp_path):
    """zorder_by preserves content exactly and sorts each physical file
    by the z-value (so parquet row-group min/max skipping engages)."""
    kt = KeyedTable(spark, str(tmp_path / "tz"), ["id"], num_buckets=2)
    rng = random.Random(7)
    rows = [Row(id=i, a=rng.randrange(10_000), b=rng.randrange(10_000))
            for i in range(400)]
    kt.init(df_of(spark, rows))
    kt.zorder_by(["a", "b"])
    got = sorted((r["id"], r["a"], r["b"]) for r in kt.read().collect())
    assert got == sorted((r.id, r.a, r.b) for r in rows)
    stats = minmax(kt.read(), ["a", "b"])
    files = glob.glob(str(tmp_path / "tz" / "_bucket=*" / "*.parquet"))
    assert files
    for f in files:
        t = pq.read_table(f, columns=["a", "b"])
        pairs = list(zip(t.column("a").to_pylist(), t.column("b").to_pylist()))
        top = (1 << 16) - 1

        def grid(v, lo, hi):
            return max(0, min(top, int((float(v) - lo) * (top / (hi - lo)))))

        zs = [zorder_py([grid(a, *stats["a"]), grid(b, *stats["b"])], 16)
              for a, b in pairs]
        assert zs == sorted(zs), f"{f} not in z-order"


def _file_ranges(path_glob, col):
    """[(min, max)] per parquet file from footer stats only."""
    out = []
    for f in sorted(glob.glob(path_glob)):
        md = pq.ParquetFile(f).metadata
        mn, mx = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    mn = s.min if mn is None else min(mn, s.min)
                    mx = s.max if mx is None else max(mx, s.max)
        out.append((mn, mx))
    return out


def _skip_fraction(ranges, queries):
    """Fraction of (file, query-range) pairs a min/max check skips."""
    skipped = total = 0
    for lo, hi in queries:
        for mn, mx in ranges:
            total += 1
            if mx < lo or mn > hi:
                skipped += 1
    return skipped / total


def test_zorder_prunes_both_dims_lexicographic_only_leading(spark, tmp_path):
    """The measured claim behind zorder_by: with files laid out along the
    z-curve, narrow range predicates on EITHER column skip most files;
    a lexicographic layout skips only on its leading column."""
    n_files = 32
    rng = random.Random(3)
    rows = [Row(a=rng.randrange(100_000), b=rng.randrange(100_000))
            for _ in range(20_000)]
    df = df_of(spark, rows)
    stats = minmax(df, ["a", "b"])
    z = str(tmp_path / "z")
    lex = str(tmp_path / "lex")
    (df.repartitionByRange(n_files, zorder_column(stats, 16))
       .write.parquet(z))
    (df.repartitionByRange(n_files, F.col("a"), F.col("b"))
       .write.parquet(lex))
    # 20 random 2%-wide range queries per dimension
    qrng = random.Random(5)

    def qs():
        out = []
        for _ in range(20):
            lo = qrng.randrange(98_000)
            out.append((lo, lo + 2_000))
        return out

    qa, qb = qs(), qs()
    za = _skip_fraction(_file_ranges(f"{z}/*.parquet", "a"), qa)
    zb = _skip_fraction(_file_ranges(f"{z}/*.parquet", "b"), qb)
    la = _skip_fraction(_file_ranges(f"{lex}/*.parquet", "a"), qa)
    lb = _skip_fraction(_file_ranges(f"{lex}/*.parquet", "b"), qb)
    # lexicographic: near-perfect on the leading column, ~zero on b
    assert la > 0.9
    assert lb < 0.2
    # z-order: strong on BOTH; the minimum of the two dims beats lex's b
    # by a wide margin (files are ~sqrt-rectangles, not full-range strips)
    assert min(za, zb) > 0.5, (za, zb)
    assert min(za, zb) > lb + 0.3
