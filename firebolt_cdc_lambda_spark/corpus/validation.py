"""The reference's 18-check validation corpus (DATA_VALIDATION_QUERIES.sql)
re-expressed as native DataFrame plans over the testdata star schema.

V-numbers cite the reference file; each query keeps the *operator shape*
(multi-agg, conditional agg, GROUP BY expression, HAVING, checksum,
top-k, UNION ALL freshness, global summary) on the tables we have.
"""

from __future__ import annotations

import functools

from pyspark.sql import functions as F

from .base import Query, davg, dec, dsum, load_table, sql_davg, sql_dsum


# -- V1/V2: row counts across tables (DATA_VALIDATION_QUERIES.sql:13-44) --
_COUNT_TABLES = ("orders", "lineitem", "customer", "events")


def val_row_counts(spark, sf):
    parts = [
        load_table(spark, sf, n)
        .agg(F.count(F.lit(1)).alias("row_count"))
        .select(F.lit(n).alias("table_name"), "row_count")
        for n in _COUNT_TABLES
    ]
    return functools.reduce(lambda a, b: a.unionByName(b), parts)


VAL_ROW_COUNTS_SQL = " UNION ALL ".join(
    f"SELECT '{n}' AS table_name, COUNT(*) AS row_count FROM {n}"
    for n in _COUNT_TABLES
)


# -- V3: aggregate stats in one pass (:51-61) ----------------------------
def val_agg_summary(spark, sf):
    o = load_table(spark, sf, "orders")
    return o.agg(
        F.count(F.lit(1)).alias("total_rows"),
        F.count_distinct("o_custkey").alias("unique_customers"),
        dsum("o_totalprice").alias("sum_totalprice"),
        davg("o_totalprice").alias("avg_totalprice"),
        F.min(F.to_date("o_orderdate")).alias("min_orderdate"),
        F.max(F.to_date("o_orderdate")).alias("max_orderdate"),
    )


VAL_AGG_SUMMARY_SQL = f"""
SELECT COUNT(*) AS total_rows,
       COUNT(DISTINCT o_custkey) AS unique_customers,
       {sql_dsum('o_totalprice')} AS sum_totalprice,
       {sql_davg('o_totalprice')} AS avg_totalprice,
       MIN(CAST(o_orderdate AS DATE)) AS min_orderdate,
       MAX(CAST(o_orderdate AS DATE)) AS max_orderdate
FROM orders
"""


# -- V4: daily distribution, recent window (:67-77) ----------------------
def val_date_distribution(spark, sf):
    o = load_table(spark, sf, "orders")
    return (
        o.where(F.to_date("o_orderdate") >= F.lit("2001-01-01"))
        .groupBy(F.to_date("o_orderdate").alias("order_date"))
        .agg(F.count(F.lit(1)).alias("order_count"),
             dsum("o_totalprice").alias("daily_total"))
    )


VAL_DATE_DISTRIBUTION_SQL = f"""
SELECT CAST(o_orderdate AS DATE) AS order_date,
       COUNT(*) AS order_count,
       {sql_dsum('o_totalprice')} AS daily_total
FROM orders
WHERE CAST(o_orderdate AS DATE) >= DATE '2001-01-01'
GROUP BY 1
"""


# -- V5: NULL counts per column (:84-91) ---------------------------------
def val_null_counts(spark, sf):
    li = load_table(spark, sf, "lineitem")
    nullcnt = lambda c: F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
    return li.agg(
        F.count(F.lit(1)).alias("total_rows"),
        nullcnt("l_quantity").alias("null_quantity"),
        nullcnt("l_returnflag").alias("null_returnflag"),
        nullcnt("l_shipdate").alias("null_shipdate"),
    )


VAL_NULL_COUNTS_SQL = """
SELECT COUNT(*) AS total_rows,
       CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_quantity,
       CAST(SUM(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_returnflag,
       CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_shipdate
FROM lineitem
"""


# -- V6: duplicate-key probe, GROUP BY + HAVING + top-k (:98-107) --------
def val_duplicate_keys(spark, sf):
    e = load_table(spark, sf, "events")
    return (
        e.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("event_count"))
        .where(F.col("event_count") > 1)
        .orderBy(F.desc("event_count"), F.asc("user_id"))
        .limit(100)
    )


VAL_DUPLICATE_KEYS_SQL = """
SELECT user_id, COUNT(*) AS event_count
FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events) GROUP BY user_id HAVING COUNT(*) > 1
ORDER BY event_count DESC, user_id ASC LIMIT 100
"""


# -- V6b: true-PK duplicate check (expected empty) -----------------------
def val_duplicate_pks(spark, sf):
    li = load_table(spark, sf, "lineitem")
    return (
        li.groupBy("l_orderkey", "l_linenumber")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") > 1)
    )


VAL_DUPLICATE_PKS_SQL = """
SELECT l_orderkey, l_linenumber, COUNT(*) AS cnt
FROM lineitem GROUP BY l_orderkey, l_linenumber HAVING COUNT(*) > 1
"""


# -- V8: MD5 checksum fingerprint (:125-133) -----------------------------
def val_checksum(spark, sf):
    def one(tbl, keycol):
        df = load_table(spark, sf, tbl)
        return df.agg(
            F.md5(F.sum(F.col(keycol).cast("long")).cast("string")).alias("key_checksum"),
            F.count(F.lit(1)).alias("row_count"),
        ).select(F.lit(tbl).alias("table_name"), "key_checksum", "row_count")
    return one("orders", "o_orderkey").unionByName(one("lineitem", "l_orderkey"))


VAL_CHECKSUM_SQL = """
SELECT 'orders' AS table_name,
       MD5(CAST(CAST(SUM(CAST(o_orderkey AS BIGINT)) AS BIGINT) AS VARCHAR)) AS key_checksum,
       COUNT(*) AS row_count
FROM orders
UNION ALL
SELECT 'lineitem' AS table_name,
       MD5(CAST(CAST(SUM(CAST(l_orderkey AS BIGINT)) AS BIGINT) AS VARCHAR)) AS key_checksum,
       COUNT(*) AS row_count
FROM lineitem
"""


# -- V9: category counts (:139-147) --------------------------------------
def val_category_counts(spark, sf):
    o = load_table(spark, sf, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("order_count"),
             dsum("o_totalprice").alias("status_total"))
    )


VAL_CATEGORY_COUNTS_SQL = f"""
SELECT o_orderstatus, COUNT(*) AS order_count,
       {sql_dsum('o_totalprice')} AS status_total
FROM orders GROUP BY o_orderstatus
"""


# -- V13: monthly distribution via DATE_TRUNC (:216-223) -----------------
def val_monthly_distribution(spark, sf):
    o = load_table(spark, sf, "orders")
    return (
        o.groupBy(F.to_date(F.date_trunc("month", "o_orderdate")).alias("month"))
        .agg(F.count(F.lit(1)).alias("order_count"),
             dsum("o_totalprice").alias("monthly_total"))
    )


VAL_MONTHLY_DISTRIBUTION_SQL = f"""
SELECT CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month,
       COUNT(*) AS order_count,
       {sql_dsum('o_totalprice')} AS monthly_total
FROM orders GROUP BY 1
"""


# -- V10: freshness via UNION ALL over 3 streams (:154-179) --------------
def val_freshness(spark, sf):
    def one(tbl, tscol):
        df = load_table(spark, sf, tbl)
        mx, mn = F.unix_micros(F.max(tscol)), F.unix_micros(F.min(tscol))
        return df.agg(
            mx.alias("max_ts_us"),
            ((mx - mn) / F.lit(60_000_000)).cast("long").alias("span_minutes"),
        ).select(F.lit(tbl).alias("table_name"), "max_ts_us", "span_minutes")
    return (one("orders", "o_orderdate")
            .unionByName(one("lineitem", "l_shipdate"))
            .unionByName(one("events", "ts")))


VAL_FRESHNESS_SQL = """
SELECT 'orders' AS table_name, EPOCH_US(MAX(o_orderdate)) AS max_ts_us,
       CAST(FLOOR((EPOCH_US(MAX(o_orderdate)) - EPOCH_US(MIN(o_orderdate))) / 60000000.0) AS BIGINT) AS span_minutes
FROM orders
UNION ALL
SELECT 'lineitem', EPOCH_US(MAX(l_shipdate)),
       CAST(FLOOR((EPOCH_US(MAX(l_shipdate)) - EPOCH_US(MIN(l_shipdate))) / 60000000.0) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'events', EPOCH_US(MAX(ts)),
       CAST(FLOOR((EPOCH_US(MAX(ts)) - EPOCH_US(MIN(ts))) / 60000000.0) AS BIGINT)
FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)
"""


# -- V18: global summary over per-table counts (:289-297) ----------------
def val_global_summary(spark, sf):
    counts = val_row_counts(spark, sf)
    return counts.agg(
        F.count(F.lit(1)).alias("table_count"),
        F.sum("row_count").alias("total_rows"),
        F.max("row_count").alias("max_rows"),
        F.min("row_count").alias("min_rows"),
        (F.sum("row_count") / F.count(F.lit(1))).alias("avg_rows"),
    )


VAL_GLOBAL_SUMMARY_SQL = f"""
SELECT COUNT(*) AS table_count, CAST(SUM(row_count) AS BIGINT) AS total_rows,
       MAX(row_count) AS max_rows, MIN(row_count) AS min_rows,
       CAST(SUM(row_count) AS BIGINT) / COUNT(*) AS avg_rows
FROM ({VAL_ROW_COUNTS_SQL})
"""


# -- V15: top-k by size (:246-253) ---------------------------------------
def val_topk_orders(spark, sf):
    o = load_table(spark, sf, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice",
                 F.to_date("o_orderdate").alias("order_date"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


VAL_TOPK_ORDERS_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice, CAST(o_orderdate AS DATE) AS order_date
FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100
"""


# -- V7: deterministic sample rows (:114-117) ----------------------------
def val_sample_rows(spark, sf):
    c = load_table(spark, sf, "customer")
    return (c.select("c_custkey", "c_name", "c_nationkey", "c_mktsegment")
            .orderBy("c_custkey").limit(10))


VAL_SAMPLE_ROWS_SQL = """
SELECT c_custkey, c_name, c_nationkey, c_mktsegment
FROM customer ORDER BY c_custkey LIMIT 10
"""


# -- scalar-function showcase (SURVEY §2.8 coverage in one projection) ---
def scalar_functions_showcase(spark, sf):
    o = load_table(spark, sf, "orders").where(F.col("o_orderkey") < 100)
    return o.select(
        "o_orderkey",
        F.md5(F.col("o_orderkey").cast("string")).alias("key_md5"),
        F.concat_ws(".", "o_orderstatus", "o_orderpriority").alias("status_priority"),
        F.substring("o_orderpriority", 1, 3).alias("priority_prefix"),
        F.instr("o_orderpriority", "-").cast("long").alias("dash_pos"),
        F.upper("o_orderstatus").alias("status_upper"),
        F.when(F.col("o_totalprice") > 100000, "big").otherwise("small").alias("size_class"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("none")).alias("status_or_none"),
        F.floor(F.col("o_totalprice") / 1000).cast("long").alias("price_k"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date"))
        .cast("long").alias("days_since_1995"),
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
    )


SCALAR_FUNCTIONS_SQL = """
SELECT o_orderkey,
       MD5(CAST(o_orderkey AS VARCHAR)) AS key_md5,
       CONCAT_WS('.', o_orderstatus, o_orderpriority) AS status_priority,
       SUBSTR(o_orderpriority, 1, 3) AS priority_prefix,
       CAST(STRPOS(o_orderpriority, '-') AS BIGINT) AS dash_pos,
       UPPER(o_orderstatus) AS status_upper,
       CASE WHEN o_totalprice > 100000 THEN 'big' ELSE 'small' END AS size_class,
       COALESCE(NULLIF(o_orderstatus, 'O'), 'none') AS status_or_none,
       CAST(FLOOR(o_totalprice / 1000) AS BIGINT) AS price_k,
       CAST(DATE_DIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since_1995,
       CAST(YEAR(o_orderdate) AS BIGINT) AS order_year,
       CAST(MONTH(o_orderdate) AS BIGINT) AS order_month
FROM orders WHERE o_orderkey < 100
"""


# -- ROLLUP aggregation (beyond-reference; SURVEY §2.4 notes it's free) --
def val_rollup_status_priority(spark, sf):
    o = load_table(spark, sf, "orders")
    return (o.rollup("o_orderstatus", "o_orderpriority")
            .agg(F.count(F.lit(1)).alias("order_count"),
                 dsum("o_totalprice").alias("total")))


VAL_ROLLUP_SQL = f"""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS order_count,
       {sql_dsum('o_totalprice')} AS total
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


# -- exact percentiles (beyond-reference; Spark percentile == DuckDB
# quantile_cont: both linear interpolation, bit-identical) ---------------
def val_percentiles(spark, sf):
    o = load_table(spark, sf, "orders")
    return o.select(
        F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
        F.expr("percentile(o_totalprice, 0.9)").alias("p90"),
        F.expr("percentile(o_totalprice, 0.99)").alias("p99"),
    )


VAL_PERCENTILES_SQL = """
SELECT quantile_cont(o_totalprice, 0.5) AS p50,
       quantile_cont(o_totalprice, 0.9) AS p90,
       quantile_cont(o_totalprice, 0.99) AS p99
FROM orders
"""


# -- JSON column access (reference stores JSON as TEXT and cannot touch
# it, mysql_firebolt_type_mapping.py:46-47; Spark parses it natively) ----
def events_json_extract(spark, sf):
    e = load_table(spark, sf, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (e.withColumn("k", k)
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum("k").alias("sum_k"),
                 F.max("k").alias("max_k")))


EVENTS_JSON_EXTRACT_SQL = """
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events GROUP BY event_type
"""


# -- P10: file-local ingestion_seq through the real ingest operator ------
def val_ingestion_seq(spark, sf):
    from ..sources.ingest import with_ingestion_seq
    li = with_ingestion_seq(load_table(spark, sf, "lineitem"))
    # single file per table => seq must be a dense 1..N numbering
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.max("ingestion_seq").cast("long").alias("max_seq"),
        F.count_distinct("ingestion_seq").alias("distinct_seq"),
        F.min("ingestion_seq").cast("long").alias("min_seq"),
    )


VAL_INGESTION_SEQ_SQL = """
SELECT COUNT(*) AS n_rows,
       COUNT(*) AS max_seq,
       COUNT(*) AS distinct_seq,
       CAST(1 AS BIGINT) AS min_seq
FROM lineitem
"""


# -- equi-width histogram (profiling shape) ------------------------------
# identical floor-division arithmetic on both engines (DuckDB 1.0 has no
# width_bucket; and different internal formulas can disagree at bucket
# boundaries in the last ulp)
def val_price_histogram(spark, sf):
    o = load_table(spark, sf, "orders")
    return (o.select((F.floor(F.col("o_totalprice") / 50000) + 1)
                     .cast("long").alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n_orders")))


VAL_PRICE_HISTOGRAM_SQL = """
SELECT CAST(FLOOR(o_totalprice / 50000) + 1 AS BIGINT) AS bucket,
       COUNT(*) AS n_orders
FROM orders GROUP BY 1
"""


# -- pivot: counts per priority across status columns --------------------
_STATUSES = ("O", "F", "P")


def val_pivot_status(spark, sf):
    o = load_table(spark, sf, "orders")
    return (o.groupBy("o_orderpriority")
            .pivot("o_orderstatus", list(_STATUSES))
            .agg(F.count(F.lit(1)))
            .select("o_orderpriority",
                    *[F.coalesce(F.col(s), F.lit(0)).cast("long").alias(f"n_{s}")
                      for s in _STATUSES]))


VAL_PIVOT_STATUS_SQL = """
SELECT o_orderpriority,
       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_O,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_F,
       CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_P
FROM orders GROUP BY o_orderpriority
"""


# -- HLL sketch distinct (beyond-reference; engine-specific estimate so
# no cross-engine oracle — the driver records a rows-only check) ---------
def val_approx_distinct(spark, sf):
    """HLL sketch with a checkable contract: the approx value itself is
    engine-specific, so the emitted row carries the EXACT count plus a
    boolean asserting the sketch landed within 5% of it — both columns
    are deterministic and hash-matchable against the oracle (which
    computes the same exact count and asserts TRUE for the bound)."""
    o = load_table(spark, sf, "orders")
    agg = o.agg(
        F.approx_count_distinct("o_custkey", 0.01).alias("_approx"),
        F.count_distinct("o_custkey").alias("exact_customers"),
    )
    return agg.select(
        "exact_customers",
        (F.abs(F.col("_approx") - F.col("exact_customers"))
         <= 0.05 * F.col("exact_customers")).alias("approx_within_5pct"),
    )


VAL_APPROX_DISTINCT_SQL = """
SELECT COUNT(DISTINCT o_custkey) AS exact_customers,
       TRUE AS approx_within_5pct
FROM orders
"""


# -- one-pass column profile (data-quality shape: min/max/distinct/nulls
# per column in a single scan) -------------------------------------------
def val_profile_orders(spark, sf):
    o = load_table(spark, sf, "orders")
    return o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct("o_orderstatus").alias("status_cardinality"),
        F.count_distinct("o_orderpriority").alias("priority_cardinality"),
        F.min("o_totalprice").alias("price_min"),
        F.max("o_totalprice").alias("price_max"),
        F.min(F.to_date("o_orderdate")).alias("date_min"),
        F.max(F.to_date("o_orderdate")).alias("date_max"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).cast("long").alias("null_custkey"),
    )


VAL_PROFILE_ORDERS_SQL = """
SELECT COUNT(*) AS n_rows,
       COUNT(DISTINCT o_orderstatus) AS status_cardinality,
       COUNT(DISTINCT o_orderpriority) AS priority_cardinality,
       MIN(o_totalprice) AS price_min,
       MAX(o_totalprice) AS price_max,
       MIN(CAST(o_orderdate AS DATE)) AS date_min,
       MAX(CAST(o_orderdate AS DATE)) AS date_max,
       CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_custkey
FROM orders
"""


# -- skew-salted aggregation under the oracle gate ------------------------
# Drives operators/skew.salted_agg (two-phase (key, salt) -> key
# aggregation for hot-key groupBys) and proves it returns EXACTLY what
# the plain GROUP BY returns: count/min/max are salt-invariant, and the
# sum goes through decimal so the two-phase re-aggregation is exact in
# any order.  See skew.py's measured caveat on WHEN to salt; this row
# pins the semantics, not the strategy.
def skew_salted_agg(spark, sf):
    from ..operators.skew import salted_agg
    e = load_table(spark, sf, "events").withColumn("v_dec", dec("value", 2))
    out = salted_agg(e, ["event_type"],
                     [("count", "event_id", "n_events"),
                      ("sum", "v_dec", "sum_value_dec"),
                      ("min", "value", "min_value"),
                      ("max", "value", "max_value")])
    return out.selectExpr("event_type", "n_events",
                          "CAST(sum_value_dec AS DOUBLE) AS sum_value",
                          "min_value", "max_value")


SKEW_SALTED_AGG_SQL = """
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
       MIN(value) AS min_value, MAX(value) AS max_value
FROM events GROUP BY 1
"""


# -- skew-salted join under the oracle gate -------------------------------
# Drives operators/skew.salted_join (fact keys salted, dim replicated
# once per salt, join on (key, salt)) and proves it returns EXACTLY what
# the plain equi-join returns: lineitem x orders -> revenue per order
# priority.  The salt is invisible to the result by construction (the
# dim side carries every salt value); aggregates go through decimal so
# re-aggregation order cannot leak into the hash.  See salted_join's
# docstring for when to salt instead of letting AQE split the skew.
def skew_salted_join(spark, sf):
    from ..operators.skew import salted_join
    li = load_table(spark, sf, "lineitem").select("l_orderkey",
                                                  "l_extendedprice")
    o = (load_table(spark, sf, "orders")
         .selectExpr("o_orderkey AS l_orderkey", "o_orderpriority"))
    joined = salted_join(li, o, on="l_orderkey", num_salts=8)
    return (joined.groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n_lines"),
                 dsum("l_extendedprice").alias("revenue"))
            .orderBy("o_orderpriority"))


SKEW_SALTED_JOIN_SQL = f"""
SELECT o_orderpriority, COUNT(*) AS n_lines,
       {sql_dsum('l_extendedprice')} AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1 ORDER BY 1
"""


# -- UNPIVOT / stack surface ---------------------------------------------
# The wide->long reshape (Spark `stack`, DuckDB UNPIVOT): inverse of
# val_pivot_status.  All three measures are cast to DOUBLE pre-reshape so
# the long `value` column has one type; sums/avgs are decimal-exact.
def sql_surface_unpivot(spark, sf):
    o = load_table(spark, sf, "orders")
    agg = (o.groupBy("o_orderstatus")
           .agg(dsum("o_totalprice").alias("sum_price"),
                davg("o_totalprice").alias("avg_price"),
                F.count(F.lit(1)).cast("double").alias("n_orders")))
    return agg.selectExpr(
        "o_orderstatus",
        "stack(3, 'sum_price', sum_price, 'avg_price', avg_price, "
        "'n_orders', n_orders) AS (metric, value)")


SQL_SURFACE_UNPIVOT_SQL = f"""
WITH a AS (
  SELECT o_orderstatus,
         {sql_dsum('o_totalprice')} AS sum_price,
         {sql_davg('o_totalprice')} AS avg_price,
         CAST(COUNT(*) AS DOUBLE) AS n_orders
  FROM orders GROUP BY 1)
SELECT o_orderstatus, metric, value
FROM a UNPIVOT (value FOR metric IN (sum_price, avg_price, n_orders))
"""


# -- declarative expectations report (operators/expectations.py) ----------
# The reference's DATA_VALIDATION_QUERIES.sql practice as ONE operator
# call: five constraint families declared fluently, compiled into a
# single aggregation over a single scan, reported long-format.  The
# oracle restates each check as its own conditional aggregate — an
# independent second derivation of every count.  All-integer outputs.
# Bounds chosen so BOTH report sides bind on the fixtures: the range
# cap (400k < max totalprice ~499k) and the accepted-values set
# (excluding the real 'P' status) each count real violations, while
# not_null/unique/matches pass with 0 — the report mixes live
# failures with live passes instead of an all-zero column.
def val_expectations_report(spark, sf):
    from ..operators.expectations import Expectations
    o = load_table(spark, sf, "orders")
    return (Expectations(o)
            .not_null("o_custkey")
            .unique("o_orderkey")
            .in_range("o_totalprice", 0, 400000)
            .accepted_values("o_orderstatus", ["O", "F"])
            .matches("o_orderpriority", "^[1-5]-")
            .report())


VAL_EXPECTATIONS_REPORT_SQL = """
WITH s AS (
  SELECT CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn,
         CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS uq,
         CAST(SUM(CASE WHEN o_totalprice IS NOT NULL
                        AND o_totalprice NOT BETWEEN 0 AND 400000
                       THEN 1 ELSE 0 END) AS BIGINT) AS rng,
         CAST(SUM(CASE WHEN o_orderstatus IS NOT NULL
                        AND o_orderstatus NOT IN ('O', 'F')
                       THEN 1 ELSE 0 END) AS BIGINT) AS av,
         CAST(SUM(CASE WHEN o_orderpriority IS NOT NULL
                        AND NOT regexp_matches(o_orderpriority, '^[1-5]-')
                       THEN 1 ELSE 0 END) AS BIGINT) AS mt
  FROM orders
)
SELECT 'not_null:o_custkey' AS "check", nn AS violations, nn = 0 AS passed FROM s
UNION ALL
SELECT 'unique:o_orderkey', uq, uq = 0 FROM s
UNION ALL
SELECT 'in_range:o_totalprice', rng, rng = 0 FROM s
UNION ALL
SELECT 'accepted_values:o_orderstatus', av, av = 0 FROM s
UNION ALL
SELECT 'matches:o_orderpriority', mt, mt = 0 FROM s
"""


QUERIES = {
    "sql_surface_unpivot": Query(
        sql_surface_unpivot, SQL_SURFACE_UNPIVOT_SQL,
        "wide->long reshape: stack / UNPIVOT surface"),
    "skew_salted_agg": Query(
        skew_salted_agg, SKEW_SALTED_AGG_SQL,
        "two-phase salted hot-key aggregation == plain GROUP BY"),
    "val_price_histogram": Query(val_price_histogram, VAL_PRICE_HISTOGRAM_SQL,
                                 "width_bucket histogram"),
    "val_pivot_status": Query(val_pivot_status, VAL_PIVOT_STATUS_SQL,
                              "pivot status columns per priority"),
    "val_profile_orders": Query(val_profile_orders, VAL_PROFILE_ORDERS_SQL,
                                "one-pass column profile"),
    "val_approx_distinct": Query(val_approx_distinct, VAL_APPROX_DISTINCT_SQL,
                                 "HLL approx distinct: exact count + 5%-bound flag"),
    "val_percentiles": Query(val_percentiles, VAL_PERCENTILES_SQL,
                             "exact interpolated percentiles"),
    "events_json_extract": Query(events_json_extract, EVENTS_JSON_EXTRACT_SQL,
                                 "JSON field extraction + aggregation"),
    "val_ingestion_seq": Query(val_ingestion_seq, VAL_INGESTION_SEQ_SQL,
                               "P10 file-local ingestion_seq density check"),
    "scalar_functions_showcase": Query(scalar_functions_showcase, SCALAR_FUNCTIONS_SQL,
                                       "§2.8 scalar functions in one projection"),
    "val_rollup_status_priority": Query(val_rollup_status_priority, VAL_ROLLUP_SQL,
                                        "ROLLUP hierarchy aggregation"),
    "val_row_counts": Query(val_row_counts, VAL_ROW_COUNTS_SQL,
                            "V1/V2 row counts (A1, U1)"),
    "val_agg_summary": Query(val_agg_summary, VAL_AGG_SUMMARY_SQL,
                             "V3 multi-agg summary (A3)"),
    "val_date_distribution": Query(val_date_distribution, VAL_DATE_DISTRIBUTION_SQL,
                                   "V4 daily distribution (A6, P6)"),
    "val_null_counts": Query(val_null_counts, VAL_NULL_COUNTS_SQL,
                             "V5 NULL counts (A4)"),
    "val_duplicate_keys": Query(val_duplicate_keys, VAL_DUPLICATE_KEYS_SQL,
                                "V6 duplicate detection (A5, O2)"),
    "val_duplicate_pks": Query(val_duplicate_pks, VAL_DUPLICATE_PKS_SQL,
                               "V6 true-PK duplicates, expected empty (A5)"),
    "val_checksum": Query(val_checksum, VAL_CHECKSUM_SQL,
                          "V8 MD5 checksum (A7)"),
    "val_category_counts": Query(val_category_counts, VAL_CATEGORY_COUNTS_SQL,
                                 "V9 category counts (A6)"),
    "val_monthly_distribution": Query(val_monthly_distribution, VAL_MONTHLY_DISTRIBUTION_SQL,
                                      "V13 monthly distribution (A6)"),
    "val_freshness": Query(val_freshness, VAL_FRESHNESS_SQL,
                           "V10 freshness union (A9, U1)"),
    "val_global_summary": Query(val_global_summary, VAL_GLOBAL_SUMMARY_SQL,
                                "V18 global summary (A8)"),
    "val_topk_orders": Query(val_topk_orders, VAL_TOPK_ORDERS_SQL,
                             "V15 top-k (O2)"),
    "val_sample_rows": Query(val_sample_rows, VAL_SAMPLE_ROWS_SQL,
                             "V7 deterministic sample (O1, O3)"),
    # appended at the END of the module dict (gate-composition rule,
    # corpus/__init__.py): new queries must not shift the pinned first 50
    "skew_salted_join": Query(
        skew_salted_join, SKEW_SALTED_JOIN_SQL,
        "salted (key, salt) skew-spread equi-join == plain join"),
    "val_expectations_report": Query(
        val_expectations_report, VAL_EXPECTATIONS_REPORT_SQL,
        "declarative data-quality gate (operators/expectations): five "
        "constraint families compiled into ONE aggregation pass, "
        "reported as (check, violations, passed) — the reference's "
        "hand-written validation SQL as a composable operator"),
}
