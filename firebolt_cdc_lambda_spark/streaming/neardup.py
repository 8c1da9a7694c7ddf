"""Streaming near-duplicate ingestion gate: the LshIndex as a
Structured Streaming corpus filter.

The batch form (corpus/simops.dedup_incremental_filter) answers "which
of THIS batch's docs are new?" once.  At ingest scale the same question
arrives continuously — every crawl drop / CDC file of documents must be
admitted or rejected against everything already accepted — so this
wires LshIndex.filter_new into the same file-source + foreachBatch loop
CdcStream uses for CDC (streaming/cdc_stream.py):

    file lands -> micro-batch ->
      1. self_dedup: drop intra-batch near-dups (the same page fetched
         twice in one crawl drop — the persisted index can't see these);
      2. filter_new: probe the persisted LSH index (reads ONLY the
         band-collided shards; O(batch), never O(corpus));
      3. merge the survivors into the accepted corpus (KeyedTable
         keyed on the doc id -> idempotent upsert);
      4. add the survivors' fingerprints to the index.

Crash/replay contract (the checkpoint makes re-delivery a replay of the
same micro-batch, like CdcStream): every step is idempotent or
self-healing, in THIS order —

* replay before step 4 ran: self_dedup is a pure function of the batch
  (same survivors every run), filter_new passes them again (they are
  not indexed yet), the KeyedTable merge is an idempotent upsert on the
  doc id, and add completes the pair;
* replay after step 4 ran: each survivor now matches ITSELF in the
  index (same id, jaccard 1.0), so filter_new drops the whole batch and
  the replay is a no-op.

So the accepted corpus is exactly-once per doc id by construction; the
only replay residue is a duplicate fingerprint row in the index, which
probe() tolerates (candidates are distinct pairs) and the periodic
``build`` rebuild compacts away (PLANS §7e's maintenance cadence).

Reference parity note: the reference has no near-dup or streaming-text
surface (its dedup is exact-PK, lambda/handler.py:422-437); this is the
beyond-reference LLM-training-data ingest path the brief asks for,
reusing the reference-shaped streaming loop.

Scale: per-trigger cost is O(batch + collided shards).  The index and
the accepted KeyedTable are both hash-partitioned stores, so a
1000-executor cluster runs the probe and the merge as partition-pruned
reads + bounded broadcasts — nothing in the loop scans the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.lsh import LshIndex
from ..operators.merge import KeyedTable


class NearDupStream:
    """Continuous near-dup-gated ingestion of a documents directory."""

    def __init__(self, spark: SparkSession, source_dir: str, store_root: str,
                 checkpoint_dir: str, id_col: str = "doc_id",
                 text_col: str = "text", n_shards: int = 64,
                 num_buckets: int = 16,
                 threshold: float | None = None,
                 max_files_per_trigger: int | None = 1,
                 schema: T.StructType | None = None):
        self.spark = spark
        self.source_dir = source_dir
        self.checkpoint_dir = checkpoint_dir
        self.id_col = id_col
        self.text_col = text_col
        self.threshold = threshold
        self.max_files_per_trigger = max_files_per_trigger
        self.schema = schema
        root = store_root.rstrip("/")
        self.index = LshIndex(spark, f"{root}/lsh", n_shards=n_shards)
        self.accepted = KeyedTable(spark, f"{root}/accepted", [id_col],
                                   num_buckets=num_buckets)

    # -- bootstrap --------------------------------------------------------
    def bootstrap(self, corpus: DataFrame) -> None:
        """Seed the gate from an existing accepted corpus: one full
        fingerprint build + the corpus snapshot (same split as
        CdcPipeline's full-load bootstrap vs per-file CDC)."""
        self.index.build(corpus, self.id_col, self.text_col)
        self.accepted.init(corpus)

    # -- the per-batch gate ----------------------------------------------
    def _foreach_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return
        # ONE fingerprint pass feeds all three index interactions below
        # (intra-batch self-dedup, corpus probe, survivor append) —
        # running self_dedup + filter_new + add on raw docs would
        # shingle+minhash the same batch three times.
        fused = (self.index
                 .fingerprints(batch_df, self.id_col, self.text_col)
                 .localCheckpoint(eager=True))
        # Intra-batch gate first: the persisted index can't see two
        # near-dups arriving in the SAME file; keep the smallest-id doc
        # of each colliding pair (deterministic, so a checkpoint replay
        # admits the identical survivor set).
        intra = (self.index.self_dup_ids(fused, self.threshold)
                 .localCheckpoint(eager=True))
        pruned = fused.join(F.broadcast(intra), "doc_id", "left_anti")
        # Corpus probe of the intra-survivors; PIN the probe result
        # BEFORE mutating the index — both the merge's survivor set and
        # the add's input derive from it, and an unpinned lazy plan
        # re-executed after the add would see the batch's own
        # fingerprints (wrong: everything rejected / nothing appended).
        corpus_dups = (self.index.probe_fused(pruned, self.threshold)
                       .select(F.col("batch_doc_id").alias("doc_id"))
                       .distinct()
                       .localCheckpoint(eager=True))
        dropped = (intra.unionByName(corpus_dups).distinct()
                   .withColumnRenamed("doc_id", self.id_col))
        fresh = batch_df.join(F.broadcast(dropped), [self.id_col],
                              "left_anti")
        if not fresh.head(1):
            return
        if self.accepted.exists():
            self.accepted.merge_batch(fresh.withColumn("Op", F.lit("I")))
        else:
            self.accepted.init(fresh)
        # survivors' fingerprints are a projection of the pinned `fused`
        # (docs too short to fingerprint were never in it — they can't
        # near-dup match and are admitted without index entries)
        self.index.add_fused(
            pruned.join(F.broadcast(corpus_dups), "doc_id", "left_anti"))

    # -- stream plumbing (same shape as CdcStream.start) ------------------
    def _resolve_schema(self) -> T.StructType:
        if self.schema is not None:
            return self.schema
        return (self.spark.read
                .option("recursiveFileLookup", "true")
                .option("pathGlobFilter", "*.parquet")
                .parquet(self.source_dir).schema)

    def start(self, available_now: bool = True):
        reader = (self.spark.readStream
                  .schema(self._resolve_schema())
                  .option("recursiveFileLookup", "true")
                  .option("pathGlobFilter", "*.parquet"))
        if self.max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger",
                                   str(self.max_files_per_trigger))
        writer = (reader.parquet(self.source_dir)
                  .writeStream
                  .foreachBatch(self._foreach_batch)
                  .option("checkpointLocation", self.checkpoint_dir))
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def run_to_completion(self, timeout_sec: int = 600) -> None:
        q = self.start(available_now=True)
        q.awaitTermination(timeout_sec)
        if q.isActive:
            q.stop()
