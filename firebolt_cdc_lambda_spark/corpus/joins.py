"""Join + set-operation surface (SURVEY §2.3, §2.7).

J1 equi-join, J2 anti-join (pre-MERGE delete cleanup shape), J3
correlated scalar subquery, J4 full-outer comparison (the
Redshift-vs-Firebolt validator shape), J5 semi-join, U1/U2 set ops.

Scale notes: dimension tables (region/nation/customer) are broadcast —
the fact side never shuffles for them.  The full-outer compare shuffles
both sides on the key, as it must.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .base import Query, dsum, load_table, sql_dsum


# -- J1: multi-way equi-join, dims broadcast -----------------------------
def join_enriched_orders(spark, sf):
    o = load_table(spark, sf, "orders")
    c = F.broadcast(load_table(spark, sf, "customer"))
    n = F.broadcast(load_table(spark, sf, "nation"))
    r = F.broadcast(load_table(spark, sf, "region"))
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"),
                 F.col("n_name").alias("nation_name"))
        .agg(F.count(F.lit(1)).alias("order_count"),
             dsum("o_totalprice").alias("revenue"))
    )


JOIN_ENRICHED_ORDERS_SQL = f"""
SELECT r.r_name AS region_name, n.n_name AS nation_name,
       COUNT(*) AS order_count, {sql_dsum('o.o_totalprice')} AS revenue
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY 1, 2
"""


# -- J2: anti-join (DELETE ... WHERE keys IN (...) cleanup shape) --------
def join_anti_customers_no_orders(spark, sf):
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders")
    return (c.join(o, c.c_custkey == o.o_custkey, "left_anti")
            .select("c_custkey", "c_name", "c_mktsegment"))


JOIN_ANTI_SQL = """
SELECT c_custkey, c_name, c_mktsegment FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


# -- J5: semi-join + group -----------------------------------------------
def join_semi_active_customers(spark, sf):
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders")
    return (c.join(o, c.c_custkey == o.o_custkey, "left_semi")
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("active_customers")))


JOIN_SEMI_SQL = """
SELECT c_mktsegment, COUNT(*) AS active_customers FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY c_mktsegment
"""


# -- J4: full-outer differential compare (validate_data_redshift_firebolt.py:105-111)
def join_full_outer_compare(spark, sf):
    o = load_table(spark, sf, "orders")
    a = (o.where(F.col("o_orderkey") % 2 == 0)
         .groupBy("o_custkey").agg(F.count(F.lit(1)).alias("cnt_a")))
    b = (o.where(F.col("o_orderkey") % 2 == 1)
         .groupBy("o_custkey").agg(F.count(F.lit(1)).alias("cnt_b")))
    j = a.join(b, "o_custkey", "full_outer")
    status = (
        F.when(F.col("cnt_a").isNull(), F.lit("missing_in_a"))
        .when(F.col("cnt_b").isNull(), F.lit("missing_in_b"))
        .when(F.col("cnt_a") == F.col("cnt_b"), F.lit("match"))
        .otherwise(F.lit("mismatch"))
    )
    return j.select("o_custkey",
                    F.coalesce("cnt_a", F.lit(0)).alias("cnt_a"),
                    F.coalesce("cnt_b", F.lit(0)).alias("cnt_b"),
                    status.alias("status"))


JOIN_FULL_OUTER_COMPARE_SQL = """
WITH a AS (SELECT o_custkey, COUNT(*) AS cnt_a FROM orders WHERE o_orderkey % 2 = 0 GROUP BY 1),
     b AS (SELECT o_custkey, COUNT(*) AS cnt_b FROM orders WHERE o_orderkey % 2 = 1 GROUP BY 1)
SELECT COALESCE(a.o_custkey, b.o_custkey) AS o_custkey,
       COALESCE(cnt_a, 0) AS cnt_a, COALESCE(cnt_b, 0) AS cnt_b,
       CASE WHEN cnt_a IS NULL THEN 'missing_in_a'
            WHEN cnt_b IS NULL THEN 'missing_in_b'
            WHEN cnt_a = cnt_b THEN 'match'
            ELSE 'mismatch' END AS status
FROM a FULL OUTER JOIN b ON a.o_custkey = b.o_custkey
"""


# -- J3: correlated scalar subquery (DATA_VALIDATION_QUERIES.sql:233-235)
def join_correlated_nation_counts(spark, sf):
    n = load_table(spark, sf, "nation")
    c = load_table(spark, sf, "customer")
    counts = c.groupBy("c_nationkey").agg(F.count(F.lit(1)).alias("customer_count"))
    return (n.join(F.broadcast(counts), n.n_nationkey == counts.c_nationkey, "left")
            .select("n_nationkey", "n_name",
                    F.coalesce("customer_count", F.lit(0)).alias("customer_count")))


JOIN_CORRELATED_SQL = """
SELECT n_nationkey, n_name,
       CAST((SELECT COUNT(*) FROM customer c WHERE c.c_nationkey = n.n_nationkey) AS BIGINT)
         AS customer_count
FROM nation n
"""


# -- U1/U2 + INTERSECT/EXCEPT: set-operation summary ---------------------
def set_ops_summary(spark, sf):
    o = load_table(spark, sf, "orders")
    h1 = o.where(F.month("o_orderdate") <= 6).select("o_custkey").distinct()
    h2 = o.where(F.month("o_orderdate") > 6).select("o_custkey").distinct()
    tag = lambda name, df: df.agg(F.count(F.lit(1)).alias("n_customers")) \
        .select(F.lit(name).alias("set_op"), "n_customers")
    return (tag("both_halves", h1.intersect(h2))
            .unionByName(tag("only_first_half", h1.exceptAll(h2)))
            .unionByName(tag("any_half", h1.union(h2).distinct())))


SET_OPS_SUMMARY_SQL = """
WITH h1 AS (SELECT DISTINCT o_custkey FROM orders WHERE MONTH(o_orderdate) <= 6),
     h2 AS (SELECT DISTINCT o_custkey FROM orders WHERE MONTH(o_orderdate) > 6)
SELECT 'both_halves' AS set_op, COUNT(*) AS n_customers FROM (SELECT * FROM h1 INTERSECT SELECT * FROM h2)
UNION ALL
SELECT 'only_first_half', COUNT(*) FROM (SELECT * FROM h1 EXCEPT SELECT * FROM h2)
UNION ALL
SELECT 'any_half', COUNT(*) FROM (SELECT * FROM h1 UNION SELECT * FROM h2)
"""


# -- SQL-surface entry: the same engine through spark.sql ----------------
# Every other corpus entry declares its plan via the DataFrame API; this
# one goes through the engine's SQL front door (sqlapi.register_testdata
# temp views + spark.sql) so the SQL surface itself is oracle-graded.
# Catalyst rewrites the IN-subquery to a left-semi join, same physical
# plan either way.
_SQL_SURFACE = """
SELECT n_name AS nation_name, COUNT(*) AS n_rich_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 150000)
GROUP BY n_name
"""


def sql_surface_in_subquery(spark, sf):
    from ..sqlapi import register_testdata
    register_testdata(spark, sf)
    return spark.sql(_SQL_SURFACE)


SQL_SURFACE_IN_SUBQUERY_SQL = _SQL_SURFACE


QUERIES = {
    "sql_surface_in_subquery": Query(sql_surface_in_subquery, SQL_SURFACE_IN_SUBQUERY_SQL,
                                     "SQL front door: temp views + IN-subquery via spark.sql"),
    "join_enriched_orders": Query(join_enriched_orders, JOIN_ENRICHED_ORDERS_SQL,
                                  "J1 multi-way equi-join, broadcast dims"),
    "join_anti_customers_no_orders": Query(join_anti_customers_no_orders, JOIN_ANTI_SQL,
                                           "J2 anti-join"),
    "join_semi_active_customers": Query(join_semi_active_customers, JOIN_SEMI_SQL,
                                        "J5 semi-join + group"),
    "join_full_outer_compare": Query(join_full_outer_compare, JOIN_FULL_OUTER_COMPARE_SQL,
                                     "J4 full-outer differential compare"),
    "join_correlated_nation_counts": Query(join_correlated_nation_counts, JOIN_CORRELATED_SQL,
                                           "J3 correlated scalar subquery"),
    "set_ops_summary": Query(set_ops_summary, SET_OPS_SUMMARY_SQL,
                             "U1/U2 + INTERSECT/EXCEPT"),
}
