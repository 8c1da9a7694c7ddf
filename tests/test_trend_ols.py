"""orders_trend_ols edge cases: the degenerate-group guard.

The closed-form OLS statistics divide by (n*Sxx - Sx^2) and take
sqrt(n*Syy - Sy^2); a group with a single point, or with all points on
one day (zero x-variance), or constant price (zero y-variance) would
divide by zero.  The guard is an exact integer predicate applied
identically on both engines, so the surviving rows still hash-match.
Same latent-crash class as the round-4 ngram-novelty advisory — pinned
here so it cannot regress.
"""

import duckdb
import pytest

from firebolt_cdc_lambda_spark.corpus.analytics import (
    ORDERS_TREND_OLS_SQL, orders_trend_ols)


@pytest.fixture()
def edge_orders(spark, tmp_path):
    rows = [("a", f"2024-01-{i + 1:02d}", 100.0 + i) for i in range(5)]
    rows += [("b", "2024-02-01", 50.0)]                      # single point
    rows += [("c", "2024-03-01", float(10 + i)) for i in range(4)]  # zero x-var
    rows += [("d", f"2024-04-{i + 1:02d}", 7.0) for i in range(3)]  # zero y-var
    df = (spark.createDataFrame(
        rows, "o_orderpriority string, d string, o_totalprice double")
        .selectExpr("o_orderpriority", "CAST(d AS TIMESTAMP) AS o_orderdate",
                    "o_totalprice"))
    p = str(tmp_path / "orders.parquet")
    df.write.mode("overwrite").parquet(p)
    return str(tmp_path), p


def test_degenerate_groups_filtered_not_crashed(spark, edge_orders):
    sf_dir, p = edge_orders
    got = orders_trend_ols(spark, sf_dir).collect()
    assert sorted(r["grp"] for r in got) == ["a"]
    # price rises 1.00/day in group a -> slope exactly 100 cents/day
    [a] = got
    assert a["slope_cents_per_day"] == 100.0
    assert a["pearson_r"] == 1.0


def test_guard_is_mirrored_in_the_oracle(spark, edge_orders):
    sf_dir, p = edge_orders
    got = orders_trend_ols(spark, sf_dir).collect()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{p}/*.parquet'")
    exp = con.sql(ORDERS_TREND_OLS_SQL).fetchall()
    assert len(exp) == len(got) == 1
    # identical surviving statistics, bit-for-bit
    g = got[0]
    (grp, n, slope, intercept, r) = exp[0]
    assert (grp, n) == (g["grp"], g["n_orders"])
    assert slope == g["slope_cents_per_day"]
    assert intercept == g["intercept_cents"]
    assert r == g["pearson_r"]
