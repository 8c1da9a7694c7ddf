"""IVF (inverted-file) ANN index: build once, probe many.

The corpus query ``ann_ivf_topk`` rebuilds its cell assignment per run,
which loses to brute force on small query batches (measured, PLANS.md
§7b).  This is the production form: a one-time build writes the corpus
``partitionBy(cell)``, so every probe afterwards is a partition-pruned
scan of ``nprobe/K`` of the data — the scan ratio that becomes the
wall-clock ratio at 100 TB.

Design notes (scale):
  * Centroids are a tiny table (K rows) persisted next to the index;
    probes never recompute them.  By default they are the first K
    vectors by id — a deterministic stand-in for sampled k-means; pass
    trained centroids for real workloads.
  * Cell assignment: broadcast nested-loop over the K centroids, then a
    ``min_by`` aggregation whose partials combine map-side, so the K×
    expansion never crosses the shuffle.
  * Probe: the query×centroid affinity is computed on the (small) query
    batch only; the DISTINCT probe-cell list (≤ K values, bounded by
    centroid count, not data) becomes a literal IN-filter, which Spark
    turns into real partition pruning (`PartitionFilters: cell IN ...`).
  * All similarity math is integer-quantized (round(x*1000)) with one
    final IEEE division — deterministic across partitionings and
    engines (same contract as corpus.simops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_QUANT = "transform({col}, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))"
_DOT = ("aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
        "CAST(0 AS BIGINT), (acc, v) -> acc + v)")


def _prep(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    q = df.selectExpr(f"{id_col} AS vec_id",
                      _QUANT.format(col=vec_col) + " AS qv")
    return q.selectExpr("vec_id", "qv",
                        _DOT.format(a="qv", b="qv") + " AS norm2")


def _cosine(a: str, b: str, an: str, bn: str) -> str:
    return (f"CAST({_DOT.format(a=a, b=b)} AS DOUBLE)"
            f" / sqrt(CAST({an} AS DOUBLE) * CAST({bn} AS DOUBLE))")


class IvfIndex:
    """Cell-partitioned ANN index over an embedding column."""

    def __init__(self, spark: SparkSession, path: str,
                 n_centroids: int = 16, nprobe: int = 2):
        self.spark = spark
        self.path = path.rstrip("/")
        self.n_centroids = n_centroids
        self.nprobe = nprobe

    # -- build ------------------------------------------------------------
    def build(self, vectors: DataFrame, id_col: str = "vec_id",
              vec_col: str = "embedding",
              centroids: DataFrame | None = None) -> None:
        """One-time (or periodic-rebuild) index construction.

        ``centroids``: optional (id_col, vec_col) DataFrame of trained
        centroids; defaults to the first ``n_centroids`` vectors by id.
        """
        qv = _prep(vectors, id_col, vec_col)
        if centroids is not None:
            cents = _prep(centroids, id_col, vec_col)
        else:
            cents = qv.orderBy("vec_id").limit(self.n_centroids)
        cents = cents.selectExpr("vec_id AS cent_id", "qv AS cv",
                                 "norm2 AS cn")
        ccos = _cosine("qv", "cv", "norm2", "cn")
        aff = (qv.crossJoin(F.broadcast(cents))
               .selectExpr("vec_id", "qv", "norm2", "cent_id",
                           f"{ccos} AS ccos"))
        cells = (aff.groupBy("vec_id")
                 .agg(F.min_by(
                     F.struct(F.col("cent_id").alias("cell"), "qv", "norm2"),
                     F.struct((-F.col("ccos")).alias("nc"),
                              F.col("cent_id").alias("cid"))).alias("m"))
                 .select("vec_id", "m.cell", "m.qv", "m.norm2"))
        (cells.write.mode("overwrite")
         .partitionBy("cell").parquet(f"{self.path}/cells"))
        (cents.write.mode("overwrite").parquet(f"{self.path}/centroids"))

    # -- probe ------------------------------------------------------------
    def probe(self, queries: DataFrame, top_k: int = 10,
              id_col: str = "vec_id", vec_col: str = "embedding",
              exclude_self: bool = True) -> DataFrame:
        """Top-k cosine neighbours for each query, scanning only the
        probed cells.  Returns (query_id, vec_id, cosine, rank)."""
        cents = self.spark.read.parquet(f"{self.path}/centroids")
        q = _prep(queries, id_col, vec_col).selectExpr(
            "vec_id AS query_id", "qv AS qq", "norm2 AS qn")
        ccos = _cosine("qq", "cv", "qn", "cn")
        w_assign = Window.partitionBy("query_id").orderBy(
            F.desc("ccos"), F.asc("cent_id"))
        probes = (q.crossJoin(F.broadcast(cents))
                  .selectExpr("query_id", "qq", "qn", "cent_id",
                              f"{ccos} AS ccos")
                  .withColumn("crank", F.row_number().over(w_assign))
                  .where(F.col("crank") <= self.nprobe)
                  .select("query_id", "qq", "qn",
                          F.col("cent_id").alias("probe_cell")))
        probes = probes.localCheckpoint(eager=True)
        # ≤ n_centroids values — bounded by K, not by data
        cell_list = [r[0] for r in
                     probes.select("probe_cell").distinct().collect()]
        idx = (self.spark.read.parquet(f"{self.path}/cells")
               .where(F.col("cell").isin(cell_list)))
        cos = _cosine("qq", "qv", "qn", "norm2")
        scored = (F.broadcast(probes)
                  .join(idx, probes.probe_cell == idx.cell)
                  .selectExpr("query_id", "vec_id", f"{cos} AS cosine"))
        if exclude_self:
            scored = scored.where(F.col("vec_id") != F.col("query_id"))
        w = Window.partitionBy("query_id").orderBy(
            F.desc("cosine"), F.asc("vec_id"))
        return (scored.withColumn("rank", F.row_number().over(w))
                .where(F.col("rank") <= top_k)
                .select("query_id", "vec_id", "cosine",
                        F.col("rank").cast("int").alias("rank")))
