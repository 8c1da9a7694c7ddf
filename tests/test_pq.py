"""Product-quantization ANN index: encode/ADC correctness, rerank
recall, IVF-PQ cell pruning, codebook training.

Baselines are exact integer-L2 top-k over the same quantized vectors
(the metric PQ approximates), so recall numbers are deterministic —
the fixtures and arithmetic contain no floats that could drift."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from firebolt_cdc_lambda_spark.operators.pq import PqIndex, _QUANT, _l2

SF = "/root/testdata/sf0.01"
TOP_K = 10
N_QUERIES = 5


def _vectors(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _exact_l2_topk(spark, vectors, queries, top_k=TOP_K):
    q = _QUANT.format(col="embedding")
    full = vectors.selectExpr("vec_id", f"{q} AS qv")
    ql = queries.selectExpr("vec_id AS query_id", f"{q} AS qq")
    ex = (F.broadcast(ql).crossJoin(full).where("vec_id <> query_id")
          .selectExpr("query_id", "vec_id", f"{_l2('qq', 'qv')} AS d"))
    w = Window.partitionBy("query_id").orderBy(F.asc("d"), F.asc("vec_id"))
    return (ex.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= top_k))


@pytest.fixture()
def built(spark, tmp_path):
    vectors = _vectors(spark)
    ix = PqIndex(spark, str(tmp_path / "pq"), n_subspaces=8, n_codes=16)
    ix.build(vectors)
    return ix, vectors


def test_codes_shape_and_stats(spark, built):
    ix, vectors = built
    codes = spark.read.parquet(f"{ix.path}/codes")
    assert codes.count() == vectors.count()
    bad = codes.where(
        f"size(codes) <> 8 OR exists(codes, c -> c < 0 OR c >= 16)")
    assert bad.count() == 0
    stats = ix.code_stats()
    assert set(stats) == set(range(8))          # all subspaces present
    assert all(sum(c.values()) == vectors.count() for c in stats.values())


def test_probe_matches_corpus_query(spark, built):
    """The persisted index's ADC must produce the SAME integer distances
    as the self-contained (DuckDB-oracled) corpus query ann_pq_topk."""
    from firebolt_cdc_lambda_spark.corpus.simops import ann_pq_topk
    ix, vectors = built
    got = ix.probe(vectors.where(f"vec_id < {N_QUERIES}"), top_k=TOP_K)
    exp = ann_pq_topk(spark, SF)
    g = sorted(tuple(r) for r in
               got.select("query_id", "vec_id", "approx_dist", "rank").collect())
    x = sorted(tuple(r) for r in
               exp.select("query_id", "vec_id", "approx_dist", "rank").collect())
    assert g == x


def test_probe_deterministic(spark, built):
    ix, vectors = built
    q = vectors.where(f"vec_id < {N_QUERIES}")
    a = sorted(tuple(r) for r in ix.probe(q).collect())
    b = sorted(tuple(r) for r in ix.probe(q).collect())
    assert a == b


def test_rerank_restores_recall(spark, built):
    """ADC-only recall on uniform-random embeddings is the honest worst
    case (~0.3 here); exact rerank of the top 20% must recover most of
    it.  Deterministic: integer arithmetic end-to-end."""
    ix, vectors = built
    queries = vectors.where(f"vec_id < {N_QUERIES}")
    exact = {(r["query_id"], r["vec_id"])
             for r in _exact_l2_topk(spark, vectors, queries).collect()}

    adc_only = {(r["query_id"], r["vec_id"])
                for r in ix.probe(queries, top_k=TOP_K).collect()}
    reranked = {(r["query_id"], r["vec_id"])
                for r in ix.probe(queries, top_k=TOP_K, rerank_factor=10,
                                  vectors=vectors).collect()}
    recall_adc = len(adc_only & exact) / len(exact)
    recall_rr = len(reranked & exact) / len(exact)
    assert recall_rr >= 0.8
    assert recall_rr > recall_adc


def test_ivf_pq_cell_pruning(spark, tmp_path):
    """Codes written partitionBy(cell) + cell_filter = the IVF-PQ
    composition: the probe's result must equal ADC restricted to the
    filtered cells."""
    vectors = _vectors(spark)
    cells = vectors.selectExpr("vec_id", "CAST(vec_id % 4 AS INT) AS cell")
    ix = PqIndex(spark, str(tmp_path / "pq"), n_subspaces=8, n_codes=16)
    ix.build(vectors, cells=cells)
    codes_root = f"{ix.path}/codes"
    names = {f.name for f in __import__("pathlib").Path(codes_root).iterdir()}
    assert any(n.startswith("cell=") for n in names)   # partitioned layout

    queries = vectors.where(f"vec_id < {N_QUERIES}")
    pruned = ix.probe(queries, top_k=TOP_K, cell_filter=[0, 1])
    full = ix.probe(queries, top_k=TOP_K)
    # every pruned hit must come from cells 0/1...
    assert all(r["vec_id"] % 4 in (0, 1) for r in pruned.collect())
    # ...and full-probe results restricted to those cells rank identically
    full_restricted = {r["query_id"]: [] for r in full.collect()}
    for r in sorted(full.collect(), key=lambda r: (r["query_id"], r["rank"])):
        if r["vec_id"] % 4 in (0, 1):
            full_restricted[r["query_id"]].append(r["vec_id"])
    pr = {q: [] for q in full_restricted}
    for r in sorted(pruned.collect(), key=lambda r: (r["query_id"], r["rank"])):
        pr[r["query_id"]].append(r["vec_id"])
    for q in pr:
        k = len(full_restricted[q])
        assert pr[q][:k] == full_restricted[q]


def test_trained_codebooks_reduce_quantization_error(spark, tmp_path):
    """Per-subspace Lloyd's must not increase total quantization error
    vs the first-Ks default (it minimizes it directly; unlike the IVF
    cosine-cell trainer there is no uniform-corpus failure mode)."""
    vectors = _vectors(spark)
    ix_d = PqIndex(spark, str(tmp_path / "pq_default"), 8, 16)
    ix_d.build(vectors)
    ix_t = PqIndex(spark, str(tmp_path / "pq_trained"), 8, 16)
    trained = ix_t.train_codebooks(vectors, max_iters=4)
    ix_t.build(vectors, codebooks=trained)

    def total_err(ix):
        cb = spark.read.parquet(f"{ix.path}/codebooks")
        sub = ix._subvectors(vectors, "vec_id", "embedding")
        d = (sub.join(F.broadcast(cb), "m")
             .selectExpr("vec_id", "m", f"{_l2('sv', 'cb_sv')} AS dist")
             .groupBy("vec_id", "m").agg(F.min("dist").alias("d")))
        return d.agg(F.sum("d")).first()[0]

    assert total_err(ix_t) <= total_err(ix_d)
