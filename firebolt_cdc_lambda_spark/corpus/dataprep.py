"""Training-data preparation operators (beyond-reference surface,
SURVEY §7.2): RAG chunking, vocabulary statistics, per-domain frequency
capping, weighted corpus sampling.

These are the corpus-shaping steps between "raw documents" and "training
mixture" that every large-scale LLM pipeline runs: split documents into
model-window-sized overlapping chunks, cap over-represented domains,
sample by quality weight, and track vocabulary growth (Heaps'-law
curves) as acceptance criteria for a crawl snapshot.

Determinism (see corpus.base): all sampling/ranking decisions are pure
integer arithmetic (Knuth multiplicative hashing, integer division) or
total-order window ranks — never engine-native RNG or float rounding —
so the DuckDB oracle hashes identically.

Scale: chunking is a per-row explode (no shuffle; output partitions
inherit the scan).  Domain capping and weighted sampling are one window
/ one top-k over (source)- or globally-ranked rows — the same shapes the
dedup rank operator uses, WindowGroupLimit-optimized in Spark.  Vocab
growth is explode + two-level groupBy with map-side partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .base import Query, load_table

# -- RAG chunking: fixed-size overlapping character windows ---------------
# chunk i covers [1 + i*STRIDE, 1 + i*STRIDE + SIZE); the last chunk may be
# short.  Token-aware chunking just swaps substr for a token-slice; the
# plumbing (sequence + explode, one pass, no shuffle) is identical.
_CHUNK_SIZE = 120
_CHUNK_STRIDE = 80


def text_chunk_overlap(spark, sf):
    d = load_table(spark, sf, "documents")
    return (d.where("n_chars > 0")
            .selectExpr(
                "doc_id",
                f"explode(sequence(1, greatest(n_chars, 1), {_CHUNK_STRIDE}))"
                " AS chunk_start",
                "text")
            .selectExpr(
                "doc_id",
                f"CAST((chunk_start - 1) DIV {_CHUNK_STRIDE} AS BIGINT) AS chunk_idx",
                "CAST(chunk_start AS BIGINT) AS chunk_start",
                f"CAST(length(substr(text, chunk_start, {_CHUNK_SIZE})) AS BIGINT)"
                " AS chunk_len",
                f"md5(substr(text, chunk_start, {_CHUNK_SIZE})) AS chunk_hash"))


TEXT_CHUNK_SQL = f"""
SELECT doc_id,
       CAST((chunk_start - 1) // {_CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
       CAST(chunk_start AS BIGINT) AS chunk_start,
       CAST(length(substr(text, chunk_start, {_CHUNK_SIZE})) AS BIGINT) AS chunk_len,
       md5(substr(text, chunk_start, {_CHUNK_SIZE})) AS chunk_hash
FROM (SELECT doc_id, text,
             CAST(unnest(range(1, greatest(n_chars, 1) + 1, {_CHUNK_STRIDE}))
                  AS INTEGER) AS chunk_start
      FROM documents WHERE n_chars > 0)
"""


# -- vocabulary growth (Heaps' law acceptance stat) -----------------------
_TOKENS_SPARK = "regexp_extract_all(lower(text), '[a-z0-9]+', 0)"
_TOKENS_DUCK = "regexp_extract_all(lower(text), '[a-z0-9]+')"


def text_vocab_growth(spark, sf):
    d = load_table(spark, sf, "documents")
    toks = (d.selectExpr("source", f"explode({_TOKENS_SPARK}) AS token"))
    return (toks.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_tokens"),
                 F.count_distinct("token").alias("n_types"))
            .selectExpr("source", "n_tokens", "n_types",
                        "CAST(n_types AS DOUBLE) / n_tokens"
                        " AS type_token_ratio"))


TEXT_VOCAB_SQL = f"""
WITH t AS (SELECT source, unnest({_TOKENS_DUCK}) AS token FROM documents)
SELECT source, COUNT(*) AS n_tokens,
       CAST(COUNT(DISTINCT token) AS BIGINT) AS n_types,
       CAST(COUNT(DISTINCT token) AS DOUBLE) / COUNT(*) AS type_token_ratio
FROM t GROUP BY 1
"""


# -- per-domain frequency capping -----------------------------------------
# Over-crawled domains dominate web corpora; the standard fix keeps the
# top-K docs per domain under a quality order (here: longest first,
# doc_id tie-break = a total order, so the kept set is unique).
_DOMAIN_CAP = 15


def corpus_domain_cap(spark, sf):
    from pyspark.sql import Window
    d = load_table(spark, sf, "documents")
    w = (Window.partitionBy("source")
         .orderBy(F.col("n_chars").desc(), F.col("doc_id")))
    return (d.withColumn("rk", F.row_number().over(w).cast("long"))
            .where(F.col("rk") <= _DOMAIN_CAP)
            .select("source", "doc_id", "n_chars", "rk"))


CORPUS_DOMAIN_CAP_SQL = f"""
SELECT source, doc_id, n_chars, rk FROM (
  SELECT source, doc_id, n_chars,
         CAST(row_number() OVER (PARTITION BY source
                                 ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rk
  FROM documents)
WHERE rk <= {_DOMAIN_CAP}
"""


# -- weighted priority sampling (integer-deterministic A-ES analogue) -----
# Classic weighted reservoir sampling keys on u^(1/w) (Efraimidis-
# Spirakis); floats are not cross-engine-stable, so this uses the integer
# analogue: uniform u from a Knuth multiplicative hash of doc_id, priority
# = u DIV weight (bigger weight -> smaller priority -> more likely in the
# top-k), global rank with doc_id tie-break.  Same selection pressure,
# bit-identical on both engines.
_WS_K = 50
_U_EXPR = "((doc_id + 13) * 2654435761) % 1000000007"


def corpus_weighted_sample(spark, sf):
    d = load_table(spark, sf, "documents")
    return (d.selectExpr("doc_id", "source", "n_chars",
                         f"CAST(({_U_EXPR}) DIV greatest(n_chars, 1) AS BIGINT)"
                         " AS priority")
            .orderBy("priority", "doc_id")
            .limit(_WS_K))


CORPUS_WEIGHTED_SAMPLE_SQL = f"""
SELECT doc_id, source, n_chars,
       CAST(({_U_EXPR}) // greatest(n_chars, 1) AS BIGINT) AS priority
FROM documents
ORDER BY priority, doc_id
LIMIT {_WS_K}
"""


QUERIES = {
    "text_chunk_overlap": Query(
        text_chunk_overlap, TEXT_CHUNK_SQL,
        "RAG chunking: overlapping fixed-size character windows via "
        "sequence+explode; one pass, no shuffle", ("dataprep", "explode")),
    "text_vocab_growth": Query(
        text_vocab_growth, TEXT_VOCAB_SQL,
        "Heaps'-law vocabulary stats per source: tokens, types, TTR",
        ("dataprep", "agg")),
    "corpus_domain_cap": Query(
        corpus_domain_cap, CORPUS_DOMAIN_CAP_SQL,
        "per-domain frequency capping: keep top-K docs per source under a "
        "total quality order", ("dataprep", "window")),
    "corpus_weighted_sample": Query(
        corpus_weighted_sample, CORPUS_WEIGHTED_SAMPLE_SQL,
        "integer-deterministic weighted priority sample (Efraimidis-"
        "Spirakis analogue)", ("dataprep", "sampling")),
}
