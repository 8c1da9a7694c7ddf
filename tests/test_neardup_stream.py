"""NearDupStream: the packaged streaming near-dup ingestion gate
(streaming/neardup.py) — bootstrap, gated drain, cross-batch catch,
restart and replay idempotency.

Anchored to the same shifted-copy near-dup construction as test_lsh /
the driver-green dedup_minhash_lsh corpus query."""

from firebolt_cdc_lambda_spark.streaming import NearDupStream

SF = "/root/testdata/sf0.001"
OFFSET = 1_000_000


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")


def _batches(spark, docs):
    shifted = (docs.where("doc_id % 20 = 0")
               .selectExpr(f"doc_id + {OFFSET} AS doc_id",
                           "substr(text, 4) AS text"))
    novel = spark.createDataFrame(
        [(2_000_000 + i,
          f"zqxj{i} wvun{i} kpfh{i} qgdm{i} xvbr{i} jwpl{i} tkzn{i}")
         for i in range(5)],
        "doc_id BIGINT, text STRING")
    return shifted, novel


def test_neardup_stream_end_to_end(spark, tmp_path):
    docs = _docs(spark)
    src = str(tmp_path / "incoming")
    nd = NearDupStream(spark, src, str(tmp_path / "store"),
                       str(tmp_path / "ckpt"), n_shards=16, num_buckets=4)
    nd.bootstrap(docs)

    shifted, novel = _batches(spark, docs)
    # b1: near-dups of the corpus + novel docs; b2: the novel docs
    # re-crawled under new ids — catchable ONLY via the fingerprints b1
    # appended (cross-batch self-consistency of the gate)
    shifted.unionByName(novel).coalesce(1).write.parquet(f"{src}/b1.parquet")
    (novel.selectExpr("doc_id + 500 AS doc_id", "text")
     .coalesce(1).write.parquet(f"{src}/b2.parquet"))
    nd.run_to_completion()

    corpus_ids = {r[0] for r in docs.select("doc_id").collect()}
    novel_ids = {r[0] for r in novel.select("doc_id").collect()}
    shifted_ids = {r[0] for r in shifted.select("doc_id").collect()}
    got = {r[0] for r in nd.accepted.read().select("doc_id").collect()}

    assert corpus_ids <= got                      # bootstrap snapshot
    assert novel_ids <= got                       # novel all admitted
    assert not ({i + 500 for i in novel_ids} & got)   # b2 re-crawl rejected
    # most corpus near-dups rejected (LSH banding recall, not exact-100%)
    assert len(got & shifted_ids) <= 0.4 * len(shifted_ids)

    # restart with the same checkpoint: the drained source is a no-op
    before = len(got)
    nd2 = NearDupStream(spark, src, str(tmp_path / "store"),
                        str(tmp_path / "ckpt"), n_shards=16, num_buckets=4)
    nd2.run_to_completion()
    assert nd2.accepted.read().count() == before


def test_neardup_batch_replay_is_idempotent(spark, tmp_path):
    """Crash-replay contract: re-running the SAME micro-batch after the
    index append leaves the accepted corpus unchanged (survivors match
    themselves at jaccard 1.0 and are filtered)."""
    docs = _docs(spark)
    nd = NearDupStream(spark, str(tmp_path / "src"), str(tmp_path / "store"),
                       str(tmp_path / "ckpt"), n_shards=16, num_buckets=4)
    nd.bootstrap(docs)
    _, novel = _batches(spark, docs)

    nd._foreach_batch(novel, 0)
    first = sorted(r[0] for r in nd.accepted.read().select("doc_id").collect())
    nd._foreach_batch(novel, 0)          # replay of the same batch
    second = sorted(r[0] for r in nd.accepted.read().select("doc_id").collect())
    assert first == second
    novel_ids = {r[0] for r in novel.select("doc_id").collect()}
    assert novel_ids <= set(first)


def test_neardup_stream_cold_start_without_bootstrap(spark, tmp_path):
    """No bootstrap: the first batch initializes both stores; a second
    identical-text batch is then fully rejected."""
    docs = _docs(spark)
    _, novel = _batches(spark, docs)
    src = str(tmp_path / "incoming")
    novel.coalesce(1).write.parquet(f"{src}/b1.parquet")
    (novel.selectExpr("doc_id + 500 AS doc_id", "text")
     .coalesce(1).write.parquet(f"{src}/b2.parquet"))
    nd = NearDupStream(spark, src, str(tmp_path / "store"),
                       str(tmp_path / "ckpt"), n_shards=8, num_buckets=4)
    nd.run_to_completion()
    got = {r[0] for r in nd.accepted.read().select("doc_id").collect()}
    novel_ids = {r[0] for r in novel.select("doc_id").collect()}
    assert got == novel_ids


def test_neardup_gate_catches_intra_batch_dups(spark, tmp_path):
    """Two near-duplicates of each other arriving in the SAME file: the
    persisted index has seen neither, so only the batch-internal
    self_dedup can catch the pair — exactly one (the smaller id) must be
    admitted and indexed; a later re-crawl of the survivor's text is then
    rejected via the index."""
    docs = _docs(spark)
    _, novel = _batches(spark, docs)
    pair_a = novel                                       # ids 2_000_000+
    pair_b = novel.selectExpr("doc_id + 100 AS doc_id", "text")
    src = str(tmp_path / "incoming")
    pair_a.unionByName(pair_b).coalesce(1).write.parquet(f"{src}/b1.parquet")
    nd = NearDupStream(spark, src, str(tmp_path / "store"),
                       str(tmp_path / "ckpt"), n_shards=8, num_buckets=4)
    nd.run_to_completion()
    got = {r[0] for r in nd.accepted.read().select("doc_id").collect()}
    a_ids = {r[0] for r in pair_a.select("doc_id").collect()}
    assert got == a_ids                  # smaller id of each pair only
