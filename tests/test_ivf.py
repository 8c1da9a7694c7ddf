"""IvfIndex: build-once / probe-many ANN over the embeddings testdata.

The probe must be EXACT within its probed cells (the approximation is
only in which cells are visited), its plan must show real partition
pruning, and results must be deterministic."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from firebolt_cdc_lambda_spark.operators.ivf import IvfIndex, _cosine, _prep

SF = "/root/testdata/sf0.001"


def _vectors(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_ivf_build_and_probe_exact_within_cells(spark, tmp_path):
    vecs = _vectors(spark)
    n = vecs.count()
    ivf = IvfIndex(spark, str(tmp_path / "ivf"), n_centroids=8, nprobe=2)
    ivf.build(vecs)

    cells = spark.read.parquet(str(tmp_path / "ivf" / "cells"))
    assert cells.count() == n                       # every vector indexed
    assert cells.select("cell").distinct().count() <= 8

    queries = vecs.where(F.col("vec_id") < 3)
    got = ivf.probe(queries, top_k=5).collect()
    assert {r["query_id"] for r in got} == {0, 1, 2}
    assert all(1 <= r["rank"] <= 5 for r in got)

    # exactness within probed cells: recompute brute-force cosine over
    # exactly the vectors in each query's probed cells
    q = _prep(queries, "vec_id", "embedding").selectExpr(
        "vec_id AS query_id", "qv AS qq", "norm2 AS qn")
    cos = _cosine("qq", "qv", "qn", "norm2")
    cents = spark.read.parquet(str(tmp_path / "ivf" / "centroids"))
    ccos = _cosine("qq", "cv", "qn", "cn")
    w_assign = Window.partitionBy("query_id").orderBy(
        F.desc("ccos"), F.asc("cent_id"))
    probe_cells = (q.crossJoin(F.broadcast(cents))
                   .selectExpr("query_id", "cent_id", f"{ccos} AS ccos")
                   .withColumn("crank", F.row_number().over(w_assign))
                   .where(F.col("crank") <= 2)
                   .select("query_id", F.col("cent_id").alias("cell")))
    expected = (q.join(probe_cells, "query_id")
                .join(cells, "cell")
                .where(F.col("vec_id") != F.col("query_id"))
                .selectExpr("query_id", "vec_id", f"{cos} AS cosine")
                .withColumn("rank", F.row_number().over(
                    Window.partitionBy("query_id")
                    .orderBy(F.desc("cosine"), F.asc("vec_id"))))
                .where(F.col("rank") <= 5).collect())
    key = lambda rows: sorted((r["query_id"], r["vec_id"], r["rank"]) for r in rows)
    assert key(got) == key(expected)


def test_ivf_probe_plan_prunes_partitions(spark, tmp_path):
    vecs = _vectors(spark)
    ivf = IvfIndex(spark, str(tmp_path / "ivf2"), n_centroids=8, nprobe=1)
    ivf.build(vecs)
    out = ivf.probe(vecs.where(F.col("vec_id") == 0), top_k=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan
    # nprobe=1, single query -> exactly one cell scanned
    import re
    m = re.search(r"PartitionFilters: \[.*?cell[^\]]*\]", plan)
    assert m, plan[:2000]
    # deterministic: same probe twice -> identical rows
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, ivf.probe(vecs.where(F.col("vec_id") == 0), top_k=3).collect()))
    assert a == b


def test_ivf_custom_centroids(spark, tmp_path):
    vecs = _vectors(spark)
    cents = vecs.where(F.col("vec_id").isin([10, 20, 30, 40]))
    ivf = IvfIndex(spark, str(tmp_path / "ivf3"), n_centroids=4, nprobe=2)
    ivf.build(vecs, centroids=cents)
    stored = {r["cent_id"] for r in
              spark.read.parquet(str(tmp_path / "ivf3" / "centroids")).collect()}
    assert stored == {10, 20, 30, 40}
    got = ivf.probe(vecs.where(F.col("vec_id") < 2), top_k=3)
    assert got.count() == 6                         # 2 queries x top-3
