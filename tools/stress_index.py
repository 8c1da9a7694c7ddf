#!/usr/bin/env python
"""Index maintenance stress at sf0.1: LshIndex append-accumulation +
rebuild compaction, and the IVF k-means trainer on the real embeddings.

Two questions the per-round bench doesn't answer:

1. LshIndex: probe cost is designed to be O(batch), but `add` appends
   small files per shard.  How fast does probe latency degrade over
   sustained appends, and does a `build` rebuild (compaction) restore
   it?  -> probe time: fresh vs after N appends vs after rebuild,
   plus files-per-shard from shard_stats().
2. IvfIndex.train_centroids at sf0.1 (5k x 64-dim real embeddings):
   does Lloyd's training beat the first-K default on cell balance
   (max cell size) and keep recall@10?

Usage: python tools/stress_index.py [n_appends]
Prints one JSON line.  Results recorded in PLANS.md §7e.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from firebolt_cdc_lambda_spark.session import get_spark  # noqa: E402
from firebolt_cdc_lambda_spark.operators.lsh import LshIndex  # noqa: E402
from firebolt_cdc_lambda_spark.operators.ivf import IvfIndex  # noqa: E402

N_REPS = 3


def _probe_time(ix: LshIndex, batch) -> float:
    best = float("inf")
    for _ in range(N_REPS):
        t0 = time.time()
        ix.probe(batch).write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return round(best, 3)


def _files_per_shard(ix: LshIndex) -> dict:
    st = ix.shard_stats()
    out = {}
    for store, per in st.items():
        vals = list(per.values()) or [0]
        out[store] = {"shards": len(per), "max_files": max(vals),
                      "total_files": sum(vals)}
    return out


def main() -> None:
    n_appends = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="stress-index")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    tmp = tempfile.mkdtemp(prefix="stress_index_")
    res: dict = {}
    try:
        # ---- 1. LshIndex append accumulation + rebuild compaction ------
        ix = LshIndex(spark, f"{tmp}/lsh", n_shards=64)
        t0 = time.time()
        ix.build(docs)
        res["lsh_build_sec"] = round(time.time() - t0, 3)
        batch = (docs.where("doc_id % 20 = 0")
                 .selectExpr("doc_id + 1000000 AS doc_id",
                             "substr(text, 4) AS text"))
        res["lsh_probe_fresh_sec"] = _probe_time(ix, batch)
        res["lsh_files_fresh"] = _files_per_shard(ix)
        for i in range(n_appends):
            add = (docs.where(f"doc_id % {n_appends} = {i}")
                   .selectExpr(f"doc_id + {2_000_000 + i * 100_000} AS doc_id",
                               "text"))
            ix.add(add)
        res["n_appends"] = n_appends
        res["lsh_probe_after_appends_sec"] = _probe_time(ix, batch)
        res["lsh_files_after_appends"] = _files_per_shard(ix)
        # compaction = full rebuild over corpus + accepted batches
        grown = ix  # the stored index now holds corpus + appends
        all_sigs = spark.read.option("basePath", f"{tmp}/lsh/sig") \
            .parquet(f"{tmp}/lsh/sig")
        res["lsh_indexed_docs"] = all_sigs.count()
        t0 = time.time()
        # rebuild from the original sources (what a maintenance job does)
        full = docs.select("doc_id", "text")
        for i in range(n_appends):
            full = full.unionByName(
                docs.where(f"doc_id % {n_appends} = {i}")
                .selectExpr(f"doc_id + {2_000_000 + i * 100_000} AS doc_id",
                            "text"))
        grown.build(full)
        res["lsh_rebuild_sec"] = round(time.time() - t0, 3)
        res["lsh_probe_after_rebuild_sec"] = _probe_time(ix, batch)
        res["lsh_files_after_rebuild"] = _files_per_shard(ix)

        # ---- 2. IVF trainer on real sf0.1 embeddings -------------------
        for mode in ("default", "trained"):
            ivf = IvfIndex(spark, f"{tmp}/ivf_{mode}", n_centroids=16,
                           nprobe=4)
            t0 = time.time()
            cents = (ivf.train_centroids(vecs) if mode == "trained" else None)
            ivf.build(vecs, centroids=cents)
            res[f"ivf_{mode}_build_sec"] = round(time.time() - t0, 3)
            cells = list(ivf.cell_stats().values())
            res[f"ivf_{mode}_cells"] = {
                "n": len(cells), "max": max(cells), "min": min(cells)}
            # recall@10 of the probe vs brute force over 20 queries
            queries = vecs.where(F.col("vec_id") < 20)
            got = ivf.probe(queries, top_k=10) \
                .selectExpr("query_id", "vec_id").collect()
            approx = {}
            for r in got:
                approx.setdefault(r["query_id"], set()).add(r["vec_id"])
            exact = _brute_topk(spark, vecs, queries)
            hits = sum(len(approx.get(q, set()) & e) for q, e in exact.items())
            res[f"ivf_{mode}_recall_at_10"] = round(
                hits / sum(len(e) for e in exact.values()), 3)
        print(json.dumps(res))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _brute_topk(spark, vecs, queries, k: int = 10) -> dict:
    from pyspark.sql import Window
    q = queries.selectExpr("vec_id AS query_id", "embedding AS qe")
    dot = ("aggregate(zip_with(qe, embedding, (x, y) -> CAST(x AS DOUBLE) * y), "
           "CAST(0 AS DOUBLE), (acc, v) -> acc + v)")
    nrm = ("sqrt(aggregate(transform({c}, x -> CAST(x AS DOUBLE) * x), "
           "CAST(0 AS DOUBLE), (acc, v) -> acc + v))")
    scored = (F.broadcast(q).crossJoin(vecs)
              .where("vec_id != query_id")
              .selectExpr("query_id", "vec_id",
                          f"{dot} / ({nrm.format(c='qe')} * {nrm.format(c='embedding')}) AS cos"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    top = (scored.withColumn("rn", F.row_number().over(w))
           .where(F.col("rn") <= k).select("query_id", "vec_id").collect())
    out: dict = {}
    for r in top:
        out.setdefault(r["query_id"], set()).add(r["vec_id"])
    return out


if __name__ == "__main__":
    main()
