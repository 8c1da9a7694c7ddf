"""Differential harness: every corpus query vs its DuckDB oracle,
mimicking the driver's compare (row count + schema-width + column-sorted,
order-insensitive value comparison)."""

import math

import duckdb
import pytest

from firebolt_cdc_lambda_spark.corpus import ALL_QUERIES
from firebolt_cdc_lambda_spark.corpus.base import TABLES

from conftest import SF_DIR


@pytest.fixture(scope="module")
def oracle():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def normalize(rows, cols):
    """Column-name-sorted, order-insensitive canonical form."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = f"{v:.10g}"   # tolerate <1e-10 relative fp noise
            vals.append(str(v))
        out.append("|".join(vals))
    return sorted(out)


@pytest.mark.parametrize("name", sorted(ALL_QUERIES))
def test_query_matches_oracle(spark, oracle, name):
    q = ALL_QUERIES[name]
    got = q.fn(spark, SF_DIR)
    got_rows = got.collect()
    got_cols = got.columns
    if q.oracle is None:
        assert len(got_rows) >= 0  # rows-only check, mirroring the driver
        return
    exp = oracle.sql(q.oracle)
    exp_rows = exp.fetchall()
    exp_cols = [d[0] for d in exp.description]
    assert sorted(got_cols) == sorted(exp_cols), (
        f"{name}: columns {sorted(got_cols)} != {sorted(exp_cols)}")
    assert len(got_rows) == len(exp_rows), (
        f"{name}: row count {len(got_rows)} != {len(exp_rows)}")
    g = normalize([tuple(r) for r in got_rows], got_cols)
    e = normalize(exp_rows, exp_cols)
    mismatches = [(a, b) for a, b in zip(g, e) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"
