"""Text-analysis operators for training-data pipelines (beyond-reference
surface, SURVEY §7.2 M6): quality scoring, language ID, token stats,
exact dedup, document fingerprinting.

All expressions are built from integer/exact arithmetic so the DuckDB
oracle hashes identically (see corpus.base).  The reference cannot
express any of this (its engine stores text as opaque TEXT,
mysql_firebolt_type_mapping.py:26-51).

Scale: every op here is a single scan + narrow shuffle (groupBy doc_id or
token); no driver-side loops; all string work stays in JVM codegen via
Spark SQL higher-order functions (no Python UDFs).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .base import Query, load_table

# token extraction: identical regex semantics on both engines
_TOKENS_SPARK = "regexp_extract_all(lower(text), '[a-z0-9]+', 0)"
_TOKENS_DUCK = "regexp_extract_all(lower(text), '[a-z0-9]+')"

_STOPWORDS = ("the", "and", "of", "to", "a", "in", "is", "for", "on", "with")

# language marker words (n-gram-heuristic language ID)
_MARKERS = {
    "en": ("the", "and", "of", "is", "with"),
    "de": ("der", "die", "und", "ist", "das"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "los", "las", "que", "una"),
}


# -- quality scoring ------------------------------------------------------
def text_quality_stats(spark, sf):
    d = load_table(spark, sf, "documents")
    stop_in = ", ".join(f"'{w}'" for w in _STOPWORDS)
    return d.selectExpr(
        "doc_id",
        "CAST(length(text) AS BIGINT) AS n_chars",
        f"CAST(size({_TOKENS_SPARK}) AS BIGINT) AS n_tokens",
        f"aggregate(transform({_TOKENS_SPARK}, x -> length(x)), 0, (acc, v) -> acc + v) AS n_token_chars",
        f"size(filter({_TOKENS_SPARK}, x -> x IN ({stop_in}))) AS n_stopwords",
    ).selectExpr(
        "doc_id", "n_chars", "n_tokens",
        "CASE WHEN n_tokens = 0 THEN CAST(0.0 AS DOUBLE) "
        "ELSE CAST(n_token_chars AS DOUBLE) / n_tokens END AS avg_token_len",
        "CASE WHEN n_tokens = 0 THEN CAST(0.0 AS DOUBLE) "
        "ELSE CAST(n_stopwords AS DOUBLE) / n_tokens END AS stopword_ratio",
        "CASE WHEN n_chars = 0 THEN CAST(0.0 AS DOUBLE) "
        "ELSE CAST(n_token_chars AS DOUBLE) / n_chars END AS alpha_ratio",
    )


_stop_in = ", ".join(f"'{w}'" for w in _STOPWORDS)
TEXT_QUALITY_STATS_SQL = f"""
WITH t AS (
  SELECT doc_id, length(text) AS n_chars,
         len({_TOKENS_DUCK}) AS n_tokens,
         CAST(list_sum(list_transform({_TOKENS_DUCK}, x -> length(x))) AS BIGINT) AS n_token_chars,
         len(list_filter({_TOKENS_DUCK}, x -> x IN ({_stop_in}))) AS n_stopwords
  FROM documents
)
SELECT doc_id, n_chars, n_tokens,
  CASE WHEN n_tokens = 0 THEN CAST(0.0 AS DOUBLE)
       ELSE CAST(n_token_chars AS DOUBLE) / n_tokens END AS avg_token_len,
  CASE WHEN n_tokens = 0 THEN CAST(0.0 AS DOUBLE)
       ELSE CAST(n_stopwords AS DOUBLE) / n_tokens END AS stopword_ratio,
  CASE WHEN n_chars = 0 THEN CAST(0.0 AS DOUBLE)
       ELSE CAST(n_token_chars AS DOUBLE) / n_chars END AS alpha_ratio
FROM t
"""


# -- language ID (marker-word scoring heuristic) -------------------------
def _score_expr(lang: str, contains_fn: str, toks: str) -> str:
    return " + ".join(
        f"CASE WHEN {contains_fn}({toks}, '{w}') THEN 1 ELSE 0 END"
        for w in _MARKERS[lang])


def text_lang_id(spark, sf):
    d = load_table(spark, sf, "documents")
    scores = [f"({_score_expr(lang, 'array_contains', _TOKENS_SPARK)}) AS s_{lang}"
              for lang in _MARKERS]
    scored = d.selectExpr("doc_id", "lang", *scores)
    return scored.selectExpr(
        "doc_id", "lang",
        "CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en' "
        "WHEN s_de >= s_fr AND s_de >= s_es THEN 'de' "
        "WHEN s_fr >= s_es THEN 'fr' ELSE 'es' END AS predicted_lang",
        "s_en + s_de + s_fr + s_es AS marker_hits",
    )


_duck_scores = ", ".join(
    f"({_score_expr(lang, 'list_contains', _TOKENS_DUCK)}) AS s_{lang}"
    for lang in _MARKERS)
TEXT_LANG_ID_SQL = f"""
WITH scored AS (SELECT doc_id, lang, {_duck_scores} FROM documents)
SELECT doc_id, lang,
  CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
       WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
       WHEN s_fr >= s_es THEN 'fr' ELSE 'es' END AS predicted_lang,
  s_en + s_de + s_fr + s_es AS marker_hits
FROM scored
"""


# -- token frequency top-k (explode/unnest shape) ------------------------
def text_token_topk(spark, sf):
    d = load_table(spark, sf, "documents")
    return (
        d.selectExpr(f"explode({_TOKENS_SPARK}) AS token")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("token_count"))
        .orderBy(F.desc("token_count"), F.asc("token"))
        .limit(20)
    )


TEXT_TOKEN_TOPK_SQL = f"""
SELECT token, COUNT(*) AS token_count
FROM (SELECT unnest({_TOKENS_DUCK}) AS token FROM documents)
GROUP BY token ORDER BY token_count DESC, token ASC LIMIT 20
"""


# -- exact dedup (hash-groupBy); corpus has injected re-crawl dups -------
# documents has no natural exact dups, so both engines deterministically
# inject copies of every 10th doc (a simulated re-crawl).
def _dup_corpus(spark, sf):
    d = load_table(spark, sf, "documents")
    dups = (d.where(F.col("doc_id") % 10 == 0)
            .select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text"))
    return d.select("doc_id", "text").unionByName(dups)


_DUP_CORPUS_SQL = """
SELECT doc_id, text FROM documents
UNION ALL
SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
"""


def dedup_exact(spark, sf):
    c = _dup_corpus(spark, sf)
    return (
        c.groupBy(F.md5("text").alias("text_hash"))
        .agg(F.count(F.lit(1)).alias("dup_count"),
             F.min("doc_id").alias("keep_doc_id"))
        .where(F.col("dup_count") > 1)
    )


DEDUP_EXACT_SQL = f"""
SELECT MD5(text) AS text_hash, COUNT(*) AS dup_count, MIN(doc_id) AS keep_doc_id
FROM ({_DUP_CORPUS_SQL})
GROUP BY 1 HAVING COUNT(*) > 1
"""


# -- document fingerprint: md5 + min-rolling-hash (winnowing-lite) -------
# rolling hash of char 5-grams over cleaned text: exact integer poly hash
# sum(ascii(c[i+j]) * 31^j), identical on both engines.
# canonical definitions live in functions/texthash.py (shared with the
# incremental LshIndex); aliased here to keep the corpus modules' names
from ..functions.texthash import CLEAN_DUCK as _CLEAN_DUCK
from ..functions.texthash import CLEAN_SPARK as _CLEAN_SPARK
from ..functions.texthash import h_expr as _h_expr


def doc_fingerprint(spark, sf):
    d = load_table(spark, sf, "documents")
    h = _h_expr("clean", "i")
    return (
        d.selectExpr("doc_id", "md5(text) AS md5_fingerprint",
                     f"{_CLEAN_SPARK} AS clean")
        .selectExpr(
            "doc_id", "md5_fingerprint",
            "CASE WHEN length(clean) >= 5 THEN "
            f"array_min(transform(sequence(1, length(clean) - 4), i -> {h})) "
            "ELSE CAST(NULL AS BIGINT) END AS min_shingle_hash")
    )


DOC_FINGERPRINT_SQL = f"""
WITH c AS (SELECT doc_id, md5(text) AS md5_fingerprint, {_CLEAN_DUCK} AS clean FROM documents)
SELECT doc_id, md5_fingerprint,
  CASE WHEN length(clean) >= 5 THEN
    CAST(list_min(list_transform(range(1, length(clean) - 3), i -> {_h_expr('clean', 'i')})) AS BIGINT)
  ELSE CAST(NULL AS BIGINT) END AS min_shingle_hash
FROM c
"""


# -- token counting: whitespace + BPE-ish regex --------------------------
# two tokenizations per doc: naive whitespace split vs a BPE-ish regex
# (letter runs | digit runs | single punctuation), the pre-tokenizer
# shape used by GPT-style BPE vocabularies.
_BPE_RE = "[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\\\\s]"


def text_token_count(spark, sf):
    d = load_table(spark, sf, "documents")
    return d.selectExpr(
        "doc_id",
        "CAST(size(filter(split(text, '\\\\s+'), x -> x != '')) AS BIGINT) AS ws_tokens",
        f"CAST(size(regexp_extract_all(text, '{_BPE_RE}', 0)) AS BIGINT) AS bpe_tokens",
    )


TEXT_TOKEN_COUNT_SQL = r"""
SELECT doc_id,
       CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x != '')) AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\s]')) AS BIGINT) AS bpe_tokens
FROM documents
"""


# -- deterministic train/val/test split (hash-based, engine-agnostic) ----
# sampling via RNG differs per engine; an md5-prefix threshold on the key
# is deterministic, stable under reprocessing, and identical everywhere —
# the correct way to split a 100 TB corpus.
_SPLIT_EXPR = (
    "CASE WHEN substr(md5(concat(CAST(doc_id AS STRING), '-split-v1')), 1, 2) < '0d' THEN 'test' "
    "WHEN substr(md5(concat(CAST(doc_id AS STRING), '-split-v1')), 1, 2) < '1a' THEN 'val' "
    "ELSE 'train' END"
)
_SPLIT_EXPR_DUCK = (
    "CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || '-split-v1'), 1, 2) < '0d' THEN 'test' "
    "WHEN substr(md5(CAST(doc_id AS VARCHAR) || '-split-v1'), 1, 2) < '1a' THEN 'val' "
    "ELSE 'train' END"
)


def dataset_split_assignment(spark, sf):
    d = load_table(spark, sf, "documents")
    return (d.selectExpr("doc_id", f"{_SPLIT_EXPR} AS split", "n_chars")
            .groupBy("split")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_chars").alias("total_chars"),
                 F.min("doc_id").alias("min_doc_id")))


DATASET_SPLIT_SQL = f"""
SELECT {_SPLIT_EXPR_DUCK} AS split,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       MIN(doc_id) AS min_doc_id
FROM documents GROUP BY 1
"""


# -- fuzzy string similarity: levenshtein (both engines exact) -----------
def text_fuzzy_event_types(spark, sf):
    e = load_table(spark, sf, "events")
    return (e.select("event_type",
                     F.levenshtein("event_type", F.lit("click")).cast("long")
                     .alias("dist_click"),
                     F.levenshtein("event_type", F.lit("view")).cast("long")
                     .alias("dist_view"))
            .groupBy("event_type", "dist_click", "dist_view")
            .agg(F.count(F.lit(1)).alias("n")))


TEXT_FUZZY_SQL = """
SELECT event_type,
       CAST(levenshtein(event_type, 'click') AS BIGINT) AS dist_click,
       CAST(levenshtein(event_type, 'view') AS BIGINT) AS dist_view,
       COUNT(*) AS n
FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)
GROUP BY 1, 2, 3
"""


# -- repetition filter (Gopher-style quality signal) ---------------------
# Fraction of duplicate word 3-grams per doc: highly repetitive documents
# (boilerplate, keyword stuffing) are a standard LLM-training-data drop
# rule.  Single scan, zero shuffle: the 3-gram construction and the
# distinct-count both stay inside one whole-stage-codegen projection.
def text_repetition_filter(spark, sf):
    d = load_table(spark, sf, "documents")
    return (d.selectExpr("doc_id", f"{_CLEAN_SPARK} AS clean")
            .selectExpr("doc_id",
                        "filter(split(clean, ' '), w -> w != '') AS ws")
            .where("size(ws) >= 3")
            # Spark arrays are 0-based: gram i covers ws[i-1..i+1], i=1..n-2
            .selectExpr(
                "doc_id",
                "transform(sequence(1, size(ws) - 2), "
                "i -> concat(ws[i-1], ' ', ws[i], ' ', ws[i+1])) AS gs")
            .selectExpr("doc_id",
                        "CAST(size(gs) AS INT) AS total_3grams",
                        "CAST(size(array_distinct(gs)) AS INT) AS distinct_3grams")
            .selectExpr(
                "doc_id", "total_3grams", "distinct_3grams",
                "CAST(1 AS DOUBLE) - CAST(distinct_3grams AS DOUBLE) / total_3grams"
                " AS rep_ratio"))


TEXT_REPETITION_SQL = f"""
WITH c AS (SELECT doc_id, {_CLEAN_DUCK} AS clean FROM documents),
w AS (SELECT doc_id, list_filter(string_split(clean, ' '), w -> w != '') AS ws
      FROM c),
g AS (SELECT doc_id,
             list_transform(range(1, len(ws) - 1),
                            i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) AS gs
      FROM w WHERE len(ws) >= 3)
SELECT doc_id, CAST(len(gs) AS INTEGER) AS total_3grams,
       CAST(len(list_distinct(gs)) AS INTEGER) AS distinct_3grams,
       CAST(1 AS DOUBLE) - CAST(len(list_distinct(gs)) AS DOUBLE) / len(gs)
         AS rep_ratio
FROM g
"""


# -- composed quality filter (C4/Gopher-style keep/drop verdict) ---------
# One scan emits the per-doc signals the standalone queries compute
# (token count, stopword ratio, avg token length, 3-gram repetition) and
# composes them into a keep/drop verdict with named reasons — the actual
# shape of a training-data filter stage.  Thresholds are tuned to the
# synthetic corpus so both classes are non-trivially populated.
_QF_RULES = (
    ("too_short", "n_tokens < 20"),
    ("low_stopword", "stopword_ratio < 0.03"),
    ("bad_token_len", "avg_token_len < 2.0 OR avg_token_len > 12.0"),
    ("repetitive", "rep_ratio > 0.05"),
)


def text_quality_filter(spark, sf):
    d = load_table(spark, sf, "documents")
    stop_in = ", ".join(f"'{w}'" for w in _STOPWORDS)
    sig = d.selectExpr(
        "doc_id",
        f"CAST(size({_TOKENS_SPARK}) AS BIGINT) AS n_tokens",
        f"aggregate(transform({_TOKENS_SPARK}, x -> length(x)), 0, (acc, v) -> acc + v) AS n_token_chars",
        f"size(filter({_TOKENS_SPARK}, x -> x IN ({stop_in}))) AS n_stopwords",
        f"filter(split({_CLEAN_SPARK}, ' '), w -> w != '') AS ws",
    ).selectExpr(
        "doc_id", "n_tokens",
        "CASE WHEN n_tokens = 0 THEN CAST(0.0 AS DOUBLE) "
        "ELSE CAST(n_stopwords AS DOUBLE) / n_tokens END AS stopword_ratio",
        "CASE WHEN n_tokens = 0 THEN CAST(0.0 AS DOUBLE) "
        "ELSE CAST(n_token_chars AS DOUBLE) / n_tokens END AS avg_token_len",
        "CASE WHEN size(ws) < 3 THEN CAST(0.0 AS DOUBLE) ELSE "
        "CAST(1 AS DOUBLE) - CAST(size(array_distinct(transform("
        "sequence(1, size(ws) - 2), i -> concat(ws[i-1], ' ', ws[i], ' ', ws[i+1])"
        "))) AS DOUBLE) / (size(ws) - 2) END AS rep_ratio",
    )
    reasons = ", ".join(
        f"CASE WHEN {cond} THEN '{name}' ELSE '' END" for name, cond in _QF_RULES)
    any_fired = " OR ".join(f"({cond})" for _, cond in _QF_RULES)
    return sig.selectExpr(
        "doc_id", "n_tokens", "stopword_ratio", "avg_token_len", "rep_ratio",
        f"NOT ({any_fired}) AS keep",
        f"array_join(filter(array({reasons}), x -> x != ''), ',') AS drop_reasons",
    )


_qf_reasons_duck = ", ".join(
    f"CASE WHEN {cond} THEN '{name}' ELSE '' END" for name, cond in _QF_RULES)
_qf_any_duck = " OR ".join(f"({cond})" for _, cond in _QF_RULES)
TEXT_QUALITY_FILTER_SQL = f"""
WITH t AS (
  SELECT doc_id,
         CAST(len({_TOKENS_DUCK}) AS BIGINT) AS n_tokens,
         CAST(list_sum(list_transform({_TOKENS_DUCK}, x -> length(x))) AS BIGINT) AS n_token_chars,
         len(list_filter({_TOKENS_DUCK}, x -> x IN ({_stop_in}))) AS n_stopwords,
         list_filter(string_split({_CLEAN_DUCK}, ' '), w -> w != '') AS ws
  FROM documents),
sig AS (
  SELECT doc_id, n_tokens,
    CASE WHEN n_tokens = 0 THEN CAST(0.0 AS DOUBLE)
         ELSE CAST(n_stopwords AS DOUBLE) / n_tokens END AS stopword_ratio,
    CASE WHEN n_tokens = 0 THEN CAST(0.0 AS DOUBLE)
         ELSE CAST(n_token_chars AS DOUBLE) / n_tokens END AS avg_token_len,
    CASE WHEN len(ws) < 3 THEN CAST(0.0 AS DOUBLE) ELSE
      CAST(1 AS DOUBLE) - CAST(len(list_distinct(list_transform(
        range(1, len(ws) - 1), i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
      ))) AS DOUBLE) / (len(ws) - 2) END AS rep_ratio
  FROM t)
SELECT doc_id, n_tokens, stopword_ratio, avg_token_len, rep_ratio,
       NOT ({_qf_any_duck}) AS keep,
       COALESCE(array_to_string(
         list_filter([{_qf_reasons_duck}], x -> x != ''), ','), '')
         AS drop_reasons
FROM sig
"""


# -- PII scrub ------------------------------------------------------------
# Detect + redact emails/phones.  The synthetic corpus contains no PII, so
# the query injects a deterministic email+phone into every 25th doc (same
# pattern as simops' injected near-dups) and then finds and scrubs them —
# the detection/redaction machinery is what's under test.  Patterns are
# written in the common Java-regex/RE2 subset so both engines match
# identically.
_PII_EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
_PII_PHONE_RE = "\\+[0-9]{2}-[0-9]{3}-[0-9]{4}"
_PII_SUFFIX = "@mail.example.com or call +12-345-6789 now"


def text_pii_scrub(spark, sf):
    d = load_table(spark, sf, "documents")
    injected = d.select(
        "doc_id",
        F.when(F.col("doc_id") % 25 == 0,
               F.concat(F.col("text"), F.lit(" reach user"),
                        F.col("doc_id").cast("string"), F.lit(_PII_SUFFIX)))
         .otherwise(F.col("text")).alias("t"))
    redacted = F.regexp_replace(
        F.regexp_replace(F.col("t"), F.lit(_PII_EMAIL_RE), F.lit("<EMAIL>")),
        F.lit(_PII_PHONE_RE), F.lit("<PHONE>"))
    return (injected
            .withColumn("n_emails",
                        F.size(F.regexp_extract_all(
                            F.col("t"), F.lit(_PII_EMAIL_RE), F.lit(0))).cast("int"))
            .withColumn("n_phones",
                        F.size(F.regexp_extract_all(
                            F.col("t"), F.lit(_PII_PHONE_RE), F.lit(0))).cast("int"))
            .withColumn("redacted", redacted)
            .select("doc_id", "n_emails", "n_phones",
                    F.length("redacted").cast("int").alias("redacted_len"),
                    F.expr("right(redacted, 32)").alias("redacted_tail")))


# DuckDB non-E string literals keep backslashes verbatim, so the same
# pattern strings drop straight into the SQL text.
TEXT_PII_SCRUB_SQL = f"""
WITH t AS (
  SELECT doc_id,
         CASE WHEN doc_id % 25 = 0
              THEN text || ' reach user' || CAST(doc_id AS VARCHAR) || '{_PII_SUFFIX}'
              ELSE text END AS t
  FROM documents),
r AS (
  SELECT doc_id, t,
         regexp_replace(regexp_replace(t, '{_PII_EMAIL_RE}', '<EMAIL>', 'g'),
                        '{_PII_PHONE_RE}', '<PHONE>', 'g') AS redacted
  FROM t)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '{_PII_EMAIL_RE}')) AS INTEGER) AS n_emails,
       CAST(len(regexp_extract_all(t, '{_PII_PHONE_RE}')) AS INTEGER) AS n_phones,
       CAST(length(redacted) AS INTEGER) AS redacted_len,
       right(redacted, 32) AS redacted_tail
FROM r
"""


# -- benchmark decontamination (n-gram overlap vs an eval set) -----------
# The standard LLM-training hygiene step (GPT-3 appendix C shape): flag
# training docs sharing long word n-grams with the evaluation set.  The
# testdata ships no benchmark table, so the eval set is synthesized
# deterministically from the corpus itself: the first 10 words of every
# 50th doc stand in for benchmark passages (exactly how real benchmarks
# end up contaminating a crawl — they quote web text).  Spark plan: one
# scan builds per-doc distinct 5-gram arrays; the eval grams collapse to
# a DISTINCT set that is BROADCAST (eval suites are KBs-to-MBs even when
# the corpus is 100 TB), so the corpus side never shuffles to find hits
# — explode + broadcast-hash-join + per-doc re-aggregate.  At real scale
# the gram strings would be xxhash64-ed to 8-byte keys before the join
# (narrower exchange/build side); kept raw here for oracle parity.
_DECON_N = 5        # word n-gram order
_DECON_HEAD = 10    # eval passage length (words)


def text_decontamination(spark, sf):
    d = load_table(spark, sf, "documents")
    gram = ("concat(ws[i-1], ' ', ws[i], ' ', ws[i+1], ' ', "
            "ws[i+2], ' ', ws[i+3])")
    to_grams = (f"array_distinct(transform(sequence(1, size(ws) - "
                f"{_DECON_N - 1}), i -> {gram}))")
    words = (d.selectExpr("doc_id", f"{_CLEAN_SPARK} AS clean")
             .selectExpr("doc_id",
                         "filter(split(clean, ' '), w -> w != '') AS ws")
             .where(f"size(ws) >= {_DECON_N}"))
    eval_grams = (words.where("doc_id % 50 = 0")
                  .selectExpr(f"slice(ws, 1, {_DECON_HEAD}) AS ws")
                  .where(f"size(ws) >= {_DECON_N}")
                  .selectExpr(f"explode({to_grams}) AS gram").distinct())
    corpus = words.selectExpr("doc_id", f"{to_grams} AS gs") \
        .selectExpr("doc_id", "size(gs) AS n_grams", "explode(gs) AS gram")
    return (corpus.join(F.broadcast(eval_grams), "gram")
            .groupBy("doc_id", "n_grams")
            .agg(F.count(F.lit(1)).alias("n_contaminated"))
            .selectExpr("doc_id", "CAST(n_grams AS INTEGER) AS n_grams",
                        "CAST(n_contaminated AS INTEGER) AS n_contaminated",
                        "CAST(n_contaminated AS DOUBLE) / n_grams"
                        " AS contamination_ratio"))


_DECON_GRAM_DUCK = ("ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || "
                    "ws[i+3] || ' ' || ws[i+4]")
TEXT_DECONTAMINATION_SQL = f"""
WITH c AS (SELECT doc_id, {_CLEAN_DUCK} AS clean FROM documents),
w AS (SELECT doc_id, list_filter(string_split(clean, ' '), w -> w != '') AS ws
      FROM c WHERE len(list_filter(string_split(clean, ' '), w -> w != ''))
                >= {_DECON_N}),
ev AS (SELECT DISTINCT unnest(
         list_distinct(list_transform(range(1, len(h) - {_DECON_N - 2}),
           i -> h[i] || ' ' || h[i+1] || ' ' || h[i+2] || ' ' || h[i+3]
                || ' ' || h[i+4]))) AS gram
       FROM (SELECT ws[1:{_DECON_HEAD}] AS h FROM w WHERE doc_id % 50 = 0)
       WHERE len(h) >= {_DECON_N}),
g AS (SELECT doc_id,
             list_distinct(list_transform(range(1, len(ws) - {_DECON_N - 2}),
               i -> {_DECON_GRAM_DUCK})) AS gs
      FROM w),
tr AS (SELECT doc_id, len(gs) AS n_grams, unnest(gs) AS gram FROM g)
SELECT tr.doc_id, CAST(n_grams AS INTEGER) AS n_grams,
       CAST(COUNT(*) AS INTEGER) AS n_contaminated,
       CAST(COUNT(*) AS DOUBLE) / n_grams AS contamination_ratio
FROM tr JOIN ev USING (gram)
GROUP BY tr.doc_id, n_grams
"""


# -- domain-mixture sampling (per-language keep rates) -------------------
# Training-data mixing: each language/domain gets a target keep rate,
# applied via a deterministic md5-prefix threshold per doc (same
# RNG-free pattern as dataset_split_assignment — reprocessing-stable and
# engine-identical, the only sane way to sample a 100 TB corpus).
# Single scan, one tiny groupBy(lang); the sampled char budget rides the
# same aggregation.
_MIX_RATES = (("en", "zzzz"), ("de", "c000"), ("es", "8000"),
              ("fr", "6000"), ("zh", "4000"))   # 'zzzz' > any hex = keep all


def corpus_mixture_sampling(spark, sf):
    d = load_table(spark, sf, "documents")
    thr = " ".join(f"WHEN '{lang}' THEN '{t}'" for lang, t in _MIX_RATES)
    return (d.selectExpr(
                "lang", "n_chars",
                "substr(md5(concat(CAST(doc_id AS STRING), '-mix-v1')), 1, 4)"
                f" < CASE lang {thr} ELSE '0000' END AS sampled")
            .groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_total"),
                 F.sum(F.col("sampled").cast("bigint")).alias("n_sampled"),
                 F.sum(F.when(F.col("sampled"), F.col("n_chars"))
                       .otherwise(F.lit(0))).alias("sampled_chars"))
            .selectExpr("lang", "n_total", "n_sampled", "sampled_chars",
                        "CAST(n_sampled AS DOUBLE) / n_total"
                        " AS realized_rate"))


_MIX_THR_DUCK = " ".join(f"WHEN '{lang}' THEN '{t}'" for lang, t in _MIX_RATES)
CORPUS_MIXTURE_SQL = f"""
WITH s AS (
  SELECT lang, n_chars,
         substr(md5(CAST(doc_id AS VARCHAR) || '-mix-v1'), 1, 4)
           < CASE lang {_MIX_THR_DUCK} ELSE '0000' END AS sampled
  FROM documents)
SELECT lang, COUNT(*) AS n_total,
       CAST(SUM(CAST(sampled AS BIGINT)) AS BIGINT) AS n_sampled,
       CAST(SUM(CASE WHEN sampled THEN n_chars ELSE 0 END) AS BIGINT)
         AS sampled_chars,
       CAST(SUM(CAST(sampled AS BIGINT)) AS DOUBLE) / COUNT(*)
         AS realized_rate
FROM s GROUP BY 1
"""


# -- bigram-LM fluency score (perplexity proxy) --------------------------
# Statistical-LM quality signal: score each doc by the average corpus
# conditional bigram probability avg(c(w1,w2)/c(w1)) — the
# log-free cousin of bigram perplexity (boilerplate and word salad both
# score low; log() is avoided deliberately: libm vs JVM log differ in
# the last ulp and would break the cross-engine hash).  Determinism:
# each per-bigram probability is one IEEE division, quantized to an
# integer (round(1e6*p)) BEFORE summing, so the per-doc aggregation is
# exact in any order.  Plan: one scan explodes bigrams; the model "join"
# is two groupBys (bigram counts, unigram counts) joined back on the
# bigram stream.  Join strategy is deliberately left to AQE: at test SF
# both count tables fit a broadcast and AQE picks it; at 100 TB the
# distinct-bigram table is itself billions of rows, so forcing
# F.broadcast here would OOM — AQE's sort-merge on (w1, w2) (and the
# partial-combined groupBys before it) is the correct plan at scale.
def text_bigram_fluency(spark, sf):
    d = load_table(spark, sf, "documents")
    bi = (d.selectExpr("doc_id", f"{_CLEAN_SPARK} AS clean")
          .selectExpr("doc_id",
                      "filter(split(clean, ' '), w -> w != '') AS ws")
          .where("size(ws) >= 2")
          .selectExpr("doc_id",
                      "explode(transform(sequence(1, size(ws) - 1), "
                      "i -> struct(ws[i-1] AS w1, ws[i] AS w2))) AS b")
          .selectExpr("doc_id", "b.w1", "b.w2"))
    c12 = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = bi.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    return (bi.join(c12, ["w1", "w2"])
            .join(c1, "w1")
            .selectExpr("doc_id",
                        "CAST(round(1000000 * CAST(c12 AS DOUBLE) / c1)"
                        " AS BIGINT) AS pq")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_bigrams"),
                 F.sum("pq").alias("sum_pq"))
            .selectExpr("doc_id", "CAST(n_bigrams AS INTEGER) AS n_bigrams",
                        "CAST(sum_pq AS DOUBLE) / n_bigrams / 1000000.0"
                        " AS fluency"))


TEXT_BIGRAM_FLUENCY_SQL = f"""
WITH c AS (SELECT doc_id, {_CLEAN_DUCK} AS clean FROM documents),
w AS (SELECT doc_id, list_filter(string_split(clean, ' '), x -> x != '') AS ws
      FROM c WHERE len(list_filter(string_split(clean, ' '), x -> x != '')) >= 2),
bi AS (SELECT doc_id, unnest(list_transform(range(1, len(ws)),
             i -> {{'w1': ws[i], 'w2': ws[i+1]}}), recursive := true)
       FROM w),
c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM bi GROUP BY 1, 2),
c1 AS (SELECT w1, COUNT(*) AS c1 FROM bi GROUP BY 1)
SELECT doc_id, CAST(COUNT(*) AS INTEGER) AS n_bigrams,
       CAST(SUM(CAST(round(1000000 * CAST(c12 AS DOUBLE) / c1) AS BIGINT))
            AS DOUBLE) / COUNT(*) / 1000000.0 AS fluency
FROM bi JOIN c12 USING (w1, w2) JOIN c1 USING (w1)
GROUP BY doc_id
"""


# -- stratified exact-quota sampling -------------------------------------
# Class-balanced subset selection: per (lang, source) stratum take
# exactly ceil(20% of the stratum) documents, chosen by md5 rank —
# deterministic, seed-free, and reprocessing-stable (a doc's rank only
# changes if its stratum's membership changes).  Unlike the Bernoulli
# mixture sampler (corpus_mixture_sampling), quotas here are EXACT —
# what a curriculum/mixture spec needs when strata are small.  Plan: one
# shuffle on the stratum key; the rank window and the stratum count ride
# the same partitioning (no second exchange); stratum cardinality at
# 100 TB is (langs x sources) — thousands of well-sized groups.
def corpus_stratified_sample(spark, sf):
    from pyspark.sql import Window
    d = load_table(spark, sf, "documents")
    w = Window.partitionBy("lang", "source").orderBy(
        F.expr("md5(concat(CAST(doc_id AS STRING), '-strat-v1'))"))
    wc = Window.partitionBy("lang", "source")
    return (d.select("doc_id", "lang", "source")
            .withColumn("rn", F.row_number().over(w))
            .withColumn("quota",
                        F.ceil(F.lit(0.2) * F.count(F.lit(1)).over(wc))
                        .cast("bigint"))
            .where("rn <= quota")
            .selectExpr("doc_id", "lang", "source",
                        "CAST(rn AS INTEGER) AS sample_rank",
                        "CAST(quota AS INTEGER) AS stratum_quota"))


CORPUS_STRATIFIED_SQL = """
WITH r AS (
  SELECT doc_id, lang, source,
         ROW_NUMBER() OVER (PARTITION BY lang, source
                            ORDER BY md5(CAST(doc_id AS VARCHAR) || '-strat-v1'))
           AS rn,
         CAST(ceil(0.2 * COUNT(*) OVER (PARTITION BY lang, source))
              AS BIGINT) AS quota
  FROM documents)
SELECT doc_id, lang, source, CAST(rn AS INTEGER) AS sample_rank,
       CAST(quota AS INTEGER) AS stratum_quota
FROM r WHERE rn <= quota
"""


# -- sequence packing (concat-and-chunk) ---------------------------------
# Pretraining batch prep: concatenate documents in doc_id order and
# chunk every PACK_BUDGET tokens; each doc is assigned the pack where it
# STARTS plus its offset inside that pack.  All arithmetic is BIGINT
# (token counts + prefix sums) — exact in any order.
#
# Scale note — the naive form is a global ordered window (SUM OVER
# (ORDER BY doc_id)), which collapses to ONE task at 100 TB.  The Spark
# side therefore computes the prefix sum in two passes, the standard
# distributed scan: (1) intra-block running sums windowed by a block key
# (doc_id DIV 1000 — thousands of parallel groups), (2) a global cumsum
# over per-block TOTALS (block count = n/1000 rows — metadata-scale for
# the single-partition window), broadcast-joined back.  The oracle keeps
# the naive global window — same result, hash-matched.
_PACK_BUDGET = 2048
_PACK_BLOCK = 1000


def corpus_sequence_packing(spark, sf):
    from pyspark.sql import Window
    d = load_table(spark, sf, "documents")
    t = d.selectExpr("doc_id",
                     f"CAST(size({_TOKENS_SPARK}) AS BIGINT) AS n_tokens",
                     f"doc_id DIV {_PACK_BLOCK} AS blk")
    wb = (Window.partitionBy("blk").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    intra = t.withColumn("cum_in_blk", F.sum("n_tokens").over(wb))
    totals = t.groupBy("blk").agg(F.sum("n_tokens").alias("blk_tot"))
    wt = (Window.orderBy("blk")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    offsets = (totals.withColumn(
        "blk_off", F.sum("blk_tot").over(wt) - F.col("blk_tot"))
        .select("blk", "blk_off"))
    return (intra.join(F.broadcast(offsets), "blk")
            .selectExpr("doc_id", "n_tokens",
                        "blk_off + cum_in_blk - n_tokens AS start_tok")
            .selectExpr("doc_id", "n_tokens",
                        f"start_tok DIV {_PACK_BUDGET} AS pack_id",
                        f"start_tok % {_PACK_BUDGET} AS pack_offset"))


CORPUS_SEQUENCE_PACKING_SQL = f"""
WITH t AS (SELECT doc_id, CAST(len({_TOKENS_DUCK}) AS BIGINT) AS n_tokens
           FROM documents),
c AS (SELECT doc_id, n_tokens,
             SUM(n_tokens) OVER (ORDER BY doc_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) - n_tokens AS start_tok
      FROM t)
SELECT doc_id, n_tokens,
       CAST(start_tok // {_PACK_BUDGET} AS BIGINT) AS pack_id,
       CAST(start_tok % {_PACK_BUDGET} AS BIGINT) AS pack_offset
FROM c
"""


# -- cross-document span dedup (substring-dedup-lite) --------------------
# Training-set substring dedup (Lee et al. 2022 dedups repeated ~50-token
# spans): chunk each doc into disjoint 20-token spans, hash each span,
# and flag spans that occur in MORE THAN ONE document.  Output is the
# per-doc contamination profile a span-removal pass would consume.
#
# Scale: span hashing is scan-local (higher-order fns, no explode until
# the hash — one row per span, not per token).  The duplicate-span set
# is tiny relative to the corpus (only cross-doc repeats), so the
# span->dup join broadcasts; the only full shuffle is the span-hash
# groupBy, map-side-combined.  No O(n^2) anywhere.
_SPAN = 20


def text_passage_dedup(spark, sf):
    c = _dup_corpus(spark, sf)
    spans = (c.selectExpr("doc_id", f"{_TOKENS_SPARK} AS ws")
             .where(f"size(ws) >= {_SPAN}")
             .selectExpr(
                 "doc_id",
                 f"explode(transform(sequence(0, size(ws) DIV {_SPAN} - 1), "
                 f"k -> md5(concat_ws(' ', slice(ws, k * {_SPAN} + 1, {_SPAN}"
                 "))))) AS span_hash"))
    dup = (spans.groupBy("span_hash")
           .agg(F.countDistinct("doc_id").alias("n_docs"))
           .where("n_docs > 1")
           .select("span_hash"))
    return (spans.join(F.broadcast(dup.withColumn("dup", F.lit(1))),
                       "span_hash", "left")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_spans"),
                 F.sum(F.coalesce("dup", F.lit(0))).alias("n_dup_spans"))
            .selectExpr("doc_id", "CAST(n_spans AS BIGINT) AS n_spans",
                        "CAST(n_dup_spans AS BIGINT) AS n_dup_spans",
                        "n_dup_spans * 2 >= n_spans AS mostly_duplicated"))


TEXT_PASSAGE_DEDUP_SQL = f"""
WITH c AS ({_DUP_CORPUS_SQL}),
w AS (SELECT doc_id, {_TOKENS_DUCK} AS ws FROM c),
s AS (SELECT doc_id,
             unnest(list_transform(range(0, len(ws) // {_SPAN}),
               k -> md5(array_to_string(
                      list_slice(ws, k * {_SPAN} + 1, k * {_SPAN} + {_SPAN}),
                      ' ')))) AS span_hash
      FROM w WHERE len(ws) >= {_SPAN}),
d AS (SELECT span_hash, 1 AS dup FROM s
      GROUP BY 1 HAVING COUNT(DISTINCT doc_id) > 1)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
       CAST(SUM(COALESCE(dup, 0)) AS BIGINT) AS n_dup_spans,
       SUM(COALESCE(dup, 0)) * 2 >= COUNT(*) AS mostly_duplicated
FROM s LEFT JOIN d USING (span_hash)
GROUP BY doc_id
"""


# -- TF-IDF keyword extraction -------------------------------------------
# Top-3 keywords per document by tf-idf.  The idf is the integer
# surrogate (N * 1000) DIV df — order-equivalent to ln(N/df) for fixed N
# (both strictly decreasing in df) and exact on both engines, so the
# ranking is engine-identical with zero float drift.  Ties break on
# token ASC (a token appears once per doc in the tf table, so
# (score, token) is a total order).
#
# Scale: tf = one map-side-combined groupBy over exploded tokens;
# df + N derive from tf (already token-partitioned); the doc-side
# window partitions by doc_id — millions of small groups, no skew.
def text_tfidf_keywords(spark, sf):
    from pyspark.sql import Window
    d = load_table(spark, sf, "documents")
    tf = (d.selectExpr("doc_id", f"explode({_TOKENS_SPARK}) AS token")
          .groupBy("doc_id", "token")
          .agg(F.count(F.lit(1)).alias("tf")))
    df_ = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n = tf.select(F.countDistinct("doc_id").alias("n_docs"))
    scored = (tf.join(df_, "token")
              .crossJoin(F.broadcast(n))
              .selectExpr("doc_id", "token", "tf", "df",
                          "tf * ((n_docs * 1000) DIV df) AS score_x1000"))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score_x1000").desc(), F.col("token"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where("rank <= 3")
            .selectExpr("doc_id", "token", "CAST(tf AS BIGINT) AS tf",
                        "CAST(df AS BIGINT) AS df",
                        "CAST(score_x1000 AS BIGINT) AS score_x1000",
                        "CAST(rank AS INTEGER) AS rank"))


TEXT_TFIDF_SQL = f"""
WITH tf AS (
  SELECT doc_id, unnest({_TOKENS_DUCK}) AS token FROM documents),
tfc AS (SELECT doc_id, token, COUNT(*) AS tf FROM tf GROUP BY 1, 2),
dfc AS (SELECT token, COUNT(*) AS df FROM tfc GROUP BY 1),
n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM tfc),
s AS (SELECT doc_id, token, tf, df,
             tf * ((n_docs * 1000) // df) AS score_x1000
      FROM tfc JOIN dfc USING (token) CROSS JOIN n),
r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                   ORDER BY score_x1000 DESC, token) AS rank
      FROM s)
SELECT doc_id, token, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
       CAST(score_x1000 AS BIGINT) AS score_x1000, CAST(rank AS INTEGER) AS rank
FROM r WHERE rank <= 3
"""


# -- BM25 retrieval (integer-quantized) ----------------------------------
# Top-10 documents for a fixed keyword query under BM25 with k1=1.2,
# b=0.75, fully quantized to integer arithmetic (x100/x1000 fixed
# point, truncating division — identical on both engines):
#   idf_x1000      = (N * 1000) DIV df              (monotone ln-surrogate)
#   len_x100       = (dl * 10000) DIV avgdl_x100    (dl/avgdl, x100)
#   norm_x100      = 25 + (75 * len_x100) DIV 100   ((1-b) + b*dl/avgdl)
#   denom_x100     = tf * 100 + (120 * norm_x100) DIV 100
#   term score     = (tf * 220 * idf_x1000) DIV denom_x100   (k1+1 = 2.2)
# Max magnitude at N=1e9 docs: tf*220*idf ~ 1e17 < BIGINT max.
#
# Scale: the tf table is term-filtered BEFORE its groupBy (predicate on
# the exploded token — only query-term rows survive the scan), globals
# (N, avgdl) broadcast, and the final top-10 is a global sort of an
# already term-matched set.
_BM25_TERMS = ("merge", "hash", "scan")


def text_bm25_search(spark, sf):
    d = load_table(spark, sf, "documents")
    terms_in = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    dl = d.selectExpr("doc_id",
                      f"CAST(size({_TOKENS_SPARK}) AS BIGINT) AS dl")
    g = dl.selectExpr("count(*) AS n_docs",
                      "sum(dl) AS tot_dl").selectExpr(
        "n_docs", "(tot_dl * 100) DIV n_docs AS avgdl_x100")
    tf = (d.selectExpr("doc_id", f"explode({_TOKENS_SPARK}) AS token")
          .where(f"token IN ({terms_in})")
          .groupBy("doc_id", "token")
          .agg(F.count(F.lit(1)).alias("tf")))
    df_ = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    return (tf.join(F.broadcast(df_), "token")
            .join(dl, "doc_id")
            .crossJoin(F.broadcast(g))
            .selectExpr(
                "doc_id", "token", "tf",
                "(n_docs * 1000) DIV df AS idf_x1000",
                "25 + (75 * ((dl * 10000) DIV avgdl_x100)) DIV 100"
                " AS norm_x100")
            .selectExpr(
                "doc_id", "token",
                "(tf * 220 * idf_x1000) DIV "
                "(tf * 100 + (120 * norm_x100) DIV 100) AS term_score_x1000")
            .groupBy("doc_id")
            .agg(F.sum("term_score_x1000").alias("score_x1000"),
                 F.count(F.lit(1)).alias("n_terms_matched"))
            .selectExpr("doc_id", "CAST(score_x1000 AS BIGINT) AS score_x1000",
                        "CAST(n_terms_matched AS BIGINT) AS n_terms_matched")
            .orderBy(F.col("score_x1000").desc(), F.col("doc_id"))
            .limit(10))


_BM25_TERMS_SQL = ", ".join(f"'{t}'" for t in _BM25_TERMS)
TEXT_BM25_SQL = f"""
WITH dl AS (SELECT doc_id, CAST(len({_TOKENS_DUCK}) AS BIGINT) AS dl
            FROM documents),
g AS (SELECT COUNT(*) AS n_docs,
             (SUM(dl) * 100) // COUNT(*) AS avgdl_x100 FROM dl),
tf AS (SELECT doc_id, token, COUNT(*) AS tf
       FROM (SELECT doc_id, unnest({_TOKENS_DUCK}) AS token FROM documents)
       WHERE token IN ({_BM25_TERMS_SQL}) GROUP BY 1, 2),
dfc AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
s AS (SELECT doc_id, token,
             (tf * 220 * ((n_docs * 1000) // df)) //
             (tf * 100 + (120 * (25 + (75 * ((dl * 10000) // avgdl_x100))
                                 // 100)) // 100) AS term_score_x1000
      FROM tf JOIN dfc USING (token) JOIN dl USING (doc_id) CROSS JOIN g)
SELECT doc_id, CAST(SUM(term_score_x1000) AS BIGINT) AS score_x1000,
       CAST(COUNT(*) AS BIGINT) AS n_terms_matched
FROM s GROUP BY doc_id
ORDER BY score_x1000 DESC, doc_id LIMIT 10
"""


# -- character-distribution quality signal -------------------------------
# Per-doc character histogram stats: distinct-char count and the modal
# character with its frequency ratio (gibberish and boilerplate both
# show up as a skewed char distribution; C4/Gopher-style filters cut on
# exactly these).  Modal tie breaks on char ASC via (count DESC, char)
# rank.  The ratio is one IEEE division of exact integers — hash-stable.
#
# Scale: the char explode is O(corpus bytes) map-side work (a scan
# reads those bytes anyway) but the groupBy(doc_id, ch) is map-side
# combined, so shuffle volume is O(docs x alphabet), not O(bytes); the
# per-doc window then repartitions that already-tiny set.
def text_char_diversity(spark, sf):
    from pyspark.sql import Window
    d = load_table(spark, sf, "documents")
    counts = (d.where("length(text) > 0")
              .selectExpr(
                  "doc_id", "length(text) AS n",
                  "explode(transform(sequence(1, length(text)), "
                  "i -> substring(text, i, 1))) AS ch")
              .groupBy("doc_id", "n", "ch")
              .agg(F.count(F.lit(1)).alias("cnt")))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("cnt").desc(), F.col("ch"))
    wc = Window.partitionBy("doc_id")
    return (counts
            .withColumn("rn", F.row_number().over(w))
            .withColumn("n_distinct_chars", F.count(F.lit(1)).over(wc))
            .where("rn = 1")
            .selectExpr("doc_id",
                        "CAST(n_distinct_chars AS BIGINT) AS n_distinct_chars",
                        "ch AS top_char",
                        "CAST(cnt AS BIGINT) AS top_char_count",
                        "CAST(cnt AS DOUBLE) / n AS top_char_ratio"))


TEXT_CHAR_DIVERSITY_SQL = """
WITH ch AS (
  SELECT doc_id, length(text) AS n,
         unnest(list_transform(range(1, length(text) + 1),
                               i -> substr(text, i, 1))) AS ch
  FROM documents WHERE length(text) > 0),
c AS (SELECT doc_id, n, ch, COUNT(*) AS cnt FROM ch GROUP BY 1, 2, 3),
r AS (SELECT *,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY cnt DESC, ch) AS rn,
             COUNT(*) OVER (PARTITION BY doc_id) AS n_distinct_chars
      FROM c)
SELECT doc_id, CAST(n_distinct_chars AS BIGINT) AS n_distinct_chars,
       ch AS top_char, CAST(cnt AS BIGINT) AS top_char_count,
       CAST(cnt AS DOUBLE) / n AS top_char_ratio
FROM r WHERE rn = 1
"""


# -- BPE trainer step: weighted adjacent char-pair counting ---------------
# The first merge step of byte-pair-encoding tokenizer training: count
# adjacent symbol pairs across the corpus, weighted by word frequency.
# Classic BPE trains on the WORD-FREQUENCY DICTIONARY, not raw text —
# the scale story: the pair explode runs over |vocab| distinct words
# (bounded, Heaps' law), never over the corpus; the corpus-sized work is
# one map-side-combined word count.  Repeated pairs inside a word ("aaa"
# -> "aa" twice) count per position, as the BPE algorithm requires.
def text_bpe_pair_merge(spark, sf):
    d = load_table(spark, sf, "documents")
    words = (d.selectExpr(f"explode({_TOKENS_SPARK}) AS w")
             .groupBy("w").agg(F.count(F.lit(1)).alias("wc"))
             .where("length(w) >= 2"))
    return (words.selectExpr(
                "wc",
                "explode(transform(sequence(1, length(w) - 1), "
                "i -> substr(w, i, 2))) AS pair")
            .groupBy("pair")
            .agg(F.sum("wc").cast("long").alias("pair_count"))
            .orderBy(F.desc("pair_count"), F.asc("pair"))
            .limit(20))


TEXT_BPE_PAIR_SQL = f"""
WITH w AS (SELECT token AS w, COUNT(*) AS wc
           FROM (SELECT unnest({_TOKENS_DUCK}) AS token FROM documents)
           GROUP BY 1 HAVING length(w) >= 2),
p AS (SELECT wc, unnest(list_transform(range(1, length(w)),
                                       i -> substr(w, CAST(i AS INTEGER), 2))) AS pair
      FROM w)
SELECT pair, CAST(SUM(wc) AS BIGINT) AS pair_count
FROM p GROUP BY 1 ORDER BY pair_count DESC, pair LIMIT 20
"""


# -- cross-snapshot n-gram novelty ----------------------------------------
# "How much of the new crawl is text we have never seen?" — the
# memorization/novelty acceptance stat next to corpus_drift_tv's
# distribution shift.  Word-3-gram vocabularies of the two snapshot
# halves are compared with ONE conditional-sum groupBy (same one-shuffle
# shape as drift_tv: no join of two aggregates, no distinct-then-anti-join).
def text_ngram_novelty(spark, sf):
    d = load_table(spark, sf, "documents")
    # Docs with <3 tokens have no 3-grams.  The guard is load-bearing:
    # Spark's sequence(1, 0) is the DESCENDING [1, 0], so without it a
    # 2-token doc hits element_at(toks, 0) -> INVALID_INDEX_OF_ZERO,
    # while DuckDB's range(1, 1) is already empty.
    grams = (d.selectExpr("doc_id % 2 AS half", f"{_TOKENS_SPARK} AS toks")
             .where("size(toks) >= 3")
             .selectExpr(
                 "half",
                 "explode(transform(sequence(1, size(toks) - 2), "
                 "i -> concat_ws(' ', element_at(toks, i), "
                 "element_at(toks, i + 1), element_at(toks, i + 2)))) AS g"))
    per = grams.groupBy("g").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("a"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("b"))
    return (per.agg(
        F.count(F.lit(1)).alias("n_grams_total"),
        F.sum((F.col("a") > 0).cast("long")).alias("n_grams_old"),
        F.sum((F.col("b") > 0).cast("long")).alias("n_grams_new"),
        F.sum(((F.col("b") > 0) & (F.col("a") == 0)).cast("long"))
        .alias("n_novel"))
        .selectExpr("n_grams_total", "n_grams_old", "n_grams_new", "n_novel",
                    "CAST(n_novel AS DOUBLE) / n_grams_new AS novelty_ratio"))


# -- count-min sketch: fixed-memory frequency estimation ------------------
# The sublinear heavy-hitter primitive for 100 TB token streams: d x w
# counter cells, each token incrementing one cell per row via an
# explicit (a*h + b) % p % w hash — estimate(t) = min over rows of its
# cells, guaranteed >= the true count.  Everything is exact integer
# arithmetic (the repo's no-engine-native-hash rule), so the sketch
# cells AND the estimates match DuckDB bit-for-bit.  The audit reports,
# for the top-20 exact heavy hitters, the exact count, the CMS estimate,
# and the overestimate — the operational question ("how wrong is the
# sketch on the tokens we care about?") answered with zero tolerance.
#
# Scale: the cells table is d*w rows built by ONE map-side-combined
# groupBy (CMS is linear, so building from aggregated token counts is
# identical to per-occurrence increments); estimates probe d rows per
# token.  At 100 TB the sketch is the only state that ever leaves the
# executors — fixed memory regardless of vocabulary size.
_CMS_W = 64
_CMS_PERMS = ((123457, 886731), (594521, 193939))
_CMS_P = 1_000_003
# 31-polynomial hash of a token's first 8 chars (powers as BIGINT
# literals — pow() returns inexact doubles past 2^53; max value
# 122 * sum(31^0..31^7) ~ 3.5e12, and a*h ~ 3.5e18 < 2^63).
_POW31_8 = (1, 31, 961, 29791, 923521, 28629151, 887503681, 27512614111)
_TOKHASH_SPARK = (
    "aggregate(transform(sequence(1, least(length(tok), 8)), "
    f"j -> element_at(array({', '.join(f'{p}L' for p in _POW31_8)}), j)"
    " * ascii(substr(tok, j, 1))), CAST(0 AS BIGINT), (a, x) -> a + x)")
_TOKHASH_DUCK = (
    "CAST(list_sum(list_transform(range(1, least(length(tok), 8) + 1), "
    f"j -> [{', '.join(str(p) for p in _POW31_8)}][CAST(j AS INTEGER)]"
    " * ascii(substr(tok, CAST(j AS INTEGER), 1)))) AS BIGINT)")


def text_cms_heavy_hitters(spark, sf):
    d = load_table(spark, sf, "documents")
    toks = d.selectExpr(f"explode({_TOKENS_SPARK}) AS tok")
    exact = (toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
             .selectExpr("tok", "cnt", f"{_TOKHASH_SPARK} AS th"))
    def bucketed(df, r, a, b):
        return df.selectExpr(
            "tok", "cnt",
            f"{r} AS row",
            f"(({a} * th + {b}) % {_CMS_P}) % {_CMS_W} AS bucket")
    rows = [bucketed(exact, r, a, b) for r, (a, b) in enumerate(_CMS_PERMS)]
    probes = rows[0]
    for extra in rows[1:]:
        probes = probes.unionByName(extra)
    cms = probes.groupBy("row", "bucket").agg(F.sum("cnt").alias("cell"))
    topk = (exact.orderBy(F.desc("cnt"), F.asc("tok")).limit(20)
            .select("tok", "cnt"))
    top_probes = probes.join(F.broadcast(topk.select("tok")), "tok")
    return (top_probes.join(F.broadcast(cms), ["row", "bucket"])
            .groupBy("tok", "cnt")
            .agg(F.min("cell").alias("cms_estimate"))
            .selectExpr("tok AS token", "cnt AS exact_count",
                        "cms_estimate",
                        "cms_estimate - cnt AS overestimate")
            .orderBy(F.desc("exact_count"), F.asc("token")))


_CMS_BUCKETS_DUCK = "\nUNION ALL\n".join(
    f"SELECT tok, cnt, {r} AS row, "
    f"(({a} * th + {b}) % {_CMS_P}) % {_CMS_W} AS bucket FROM exact"
    for r, (a, b) in enumerate(_CMS_PERMS))
TEXT_CMS_SQL = f"""
WITH toks AS (SELECT unnest({_TOKENS_DUCK}) AS tok FROM documents),
exact AS (SELECT tok, COUNT(*) AS cnt, {_TOKHASH_DUCK} AS th
          FROM toks GROUP BY tok),
probes AS ({_CMS_BUCKETS_DUCK}),
cms AS (SELECT row, bucket, CAST(SUM(cnt) AS BIGINT) AS cell
        FROM probes GROUP BY 1, 2),
topk AS (SELECT tok FROM exact ORDER BY cnt DESC, tok LIMIT 20)
SELECT p.tok AS token, p.cnt AS exact_count,
       CAST(MIN(c.cell) AS BIGINT) AS cms_estimate,
       CAST(MIN(c.cell) - p.cnt AS BIGINT) AS overestimate
FROM probes p JOIN topk t ON p.tok = t.tok
JOIN cms c ON c.row = p.row AND c.bucket = p.bucket
GROUP BY p.tok, p.cnt
ORDER BY exact_count DESC, token
"""


TEXT_NGRAM_NOVELTY_SQL = f"""
WITH t AS (SELECT doc_id % 2 AS half, {_TOKENS_DUCK} AS toks FROM documents),
g AS (SELECT half,
             unnest(list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
                    i -> toks[CAST(i AS INTEGER)] || ' ' ||
                         toks[CAST(i AS INTEGER) + 1] || ' ' ||
                         toks[CAST(i AS INTEGER) + 2])) AS g
      FROM t),
p AS (SELECT g,
             SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS a,
             SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS b
      FROM g GROUP BY 1)
SELECT CAST(COUNT(*) AS BIGINT) AS n_grams_total,
       CAST(SUM(CASE WHEN a > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_grams_old,
       CAST(SUM(CASE WHEN b > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_grams_new,
       CAST(SUM(CASE WHEN b > 0 AND a = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
       CAST(SUM(CASE WHEN b > 0 AND a = 0 THEN 1 ELSE 0 END) AS DOUBLE)
         / SUM(CASE WHEN b > 0 THEN 1 ELSE 0 END) AS novelty_ratio
FROM p
"""


# -- the composed prep pipeline: dedup -> quality -> sample, one funnel ----
# The end-to-end shape a training-data run actually executes, as ONE
# declarative plan: exact dedup (keep min-id per content hash) ->
# C4/Gopher-style quality gate (the _QF_RULES verdict) -> deterministic
# per-language cap (md5-ordered rank) -> a per-language FUNNEL REPORT
# (input / after-dedup / after-quality / sampled / sampled tokens).
# Every stage is a flag on the same scan, so the funnel is one window
# pair + one groupBy — no per-stage materialization, and Catalyst sees
# the whole pipeline (at 100 TB: two window shuffles + one map-side-
# combined aggregation; the dedup window's partition key is the content
# hash, which is uniform by construction).
_PREP_CAP = 40


def corpus_prep_pipeline(spark, sf):
    from pyspark.sql import Window
    d = load_table(spark, sf, "documents")
    c = (d.select("doc_id", "text", "lang")
         .unionByName(d.where("doc_id % 10 = 0")
                      .selectExpr("doc_id + 1000000 AS doc_id", "text",
                                  "lang")))
    stop_in = ", ".join(f"'{w}'" for w in _STOPWORDS)
    sig = c.selectExpr(
        "doc_id", "text", "lang",
        f"CAST(size({_TOKENS_SPARK}) AS BIGINT) AS n_tokens",
        f"aggregate(transform({_TOKENS_SPARK}, x -> length(x)), 0, "
        "(acc, v) -> acc + v) AS n_token_chars",
        f"size(filter({_TOKENS_SPARK}, x -> x IN ({stop_in}))) AS n_stopwords",
        f"filter(split({_CLEAN_SPARK}, ' '), w -> w != '') AS ws",
    ).selectExpr(
        "doc_id", "text", "lang", "n_tokens",
        "CASE WHEN n_tokens = 0 THEN CAST(0.0 AS DOUBLE) "
        "ELSE CAST(n_stopwords AS DOUBLE) / n_tokens END AS stopword_ratio",
        "CASE WHEN n_tokens = 0 THEN CAST(0.0 AS DOUBLE) "
        "ELSE CAST(n_token_chars AS DOUBLE) / n_tokens END AS avg_token_len",
        "CASE WHEN size(ws) < 3 THEN CAST(0.0 AS DOUBLE) ELSE "
        "CAST(1 AS DOUBLE) - CAST(size(array_distinct(transform("
        "sequence(1, size(ws) - 2), i -> concat(ws[i-1], ' ', ws[i], ' ', ws[i+1])"
        "))) AS DOUBLE) / (size(ws) - 2) END AS rep_ratio",
    )
    any_fired = " OR ".join(f"({cond})" for _, cond in _QF_RULES)
    flagged = (sig
               .withColumn("keep_dedup",
                           F.col("doc_id") == F.min("doc_id").over(
                               Window.partitionBy(F.md5("text"))))
               .withColumn("keep_quality", F.expr(f"NOT ({any_fired})"))
               .withColumn("elig", F.col("keep_dedup") & F.col("keep_quality")))
    w_rank = (Window.partitionBy("lang", "elig")
              .orderBy(F.md5(F.col("doc_id").cast("string")), F.col("doc_id")))
    ranked = flagged.withColumn(
        "sampled",
        F.col("elig") & (F.row_number().over(w_rank) <= _PREP_CAP))
    return (ranked.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_input"),
                 F.sum(F.col("keep_dedup").cast("long")).alias("n_after_dedup"),
                 F.sum(F.col("elig").cast("long")).alias("n_after_quality"),
                 F.sum(F.col("sampled").cast("long")).alias("n_sampled"),
                 F.sum(F.when(F.col("sampled"), F.col("n_tokens"))
                       .otherwise(0)).alias("tokens_sampled"))
            .orderBy("lang"))


CORPUS_PREP_PIPELINE_SQL = f"""
WITH c AS (
  SELECT doc_id, text, lang FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text, lang FROM documents
  WHERE doc_id % 10 = 0),
t AS (
  SELECT doc_id, text, lang,
         CAST(len({_TOKENS_DUCK}) AS BIGINT) AS n_tokens,
         CAST(list_sum(list_transform({_TOKENS_DUCK}, x -> length(x))) AS BIGINT) AS n_token_chars,
         len(list_filter({_TOKENS_DUCK}, x -> x IN ({_stop_in}))) AS n_stopwords,
         list_filter(string_split({_CLEAN_DUCK}, ' '), w -> w != '') AS ws
  FROM c),
sig AS (
  SELECT doc_id, text, lang, n_tokens,
    CASE WHEN n_tokens = 0 THEN CAST(0.0 AS DOUBLE)
         ELSE CAST(n_stopwords AS DOUBLE) / n_tokens END AS stopword_ratio,
    CASE WHEN n_tokens = 0 THEN CAST(0.0 AS DOUBLE)
         ELSE CAST(n_token_chars AS DOUBLE) / n_tokens END AS avg_token_len,
    CASE WHEN len(ws) < 3 THEN CAST(0.0 AS DOUBLE) ELSE
      CAST(1 AS DOUBLE) - CAST(len(list_distinct(list_transform(
        range(1, len(ws) - 1), i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
      ))) AS DOUBLE) / (len(ws) - 2) END AS rep_ratio
  FROM t),
flagged AS (
  SELECT *,
         doc_id = MIN(doc_id) OVER (PARTITION BY md5(text)) AS keep_dedup,
         NOT ({_qf_any_duck}) AS keep_quality
  FROM sig),
ranked AS (
  SELECT *, keep_dedup AND keep_quality AS elig,
         ROW_NUMBER() OVER (PARTITION BY lang, keep_dedup AND keep_quality
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
           AS rk
  FROM flagged)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_input,
       CAST(SUM(CASE WHEN keep_dedup THEN 1 ELSE 0 END) AS BIGINT) AS n_after_dedup,
       CAST(SUM(CASE WHEN elig THEN 1 ELSE 0 END) AS BIGINT) AS n_after_quality,
       CAST(SUM(CASE WHEN elig AND rk <= {_PREP_CAP} THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
       CAST(SUM(CASE WHEN elig AND rk <= {_PREP_CAP} THEN n_tokens ELSE 0 END) AS BIGINT) AS tokens_sampled
FROM ranked GROUP BY lang ORDER BY lang
"""


# -- collocation mining: PMI-style lift in exact integer form --------------
# Which token pairs co-occur in the same document more than independence
# predicts?  lift(t1,t2) = P(t1,t2)/(P(t1)P(t2)) = n12*N / (c1*c2) — the
# exponential of PMI, which keeps the statistic DIVISION-ONLY (log-based
# PMI is not correctly-rounded cross-engine; the same dodge as the
# chi-square drift row).  The significance gate is evaluated in exact
# integer cross-multiplied form (10*n12*N >= 12*c1*c2, i.e. lift >= 1.2,
# support >= 5) so no float comparison decides membership; the reported
# lift itself is one IEEE division of two exact BIGINTs.
# Scale shape: per-doc distinct-token pair explosion is O(L²) map-side
# (L <= 64-char prefix tokens), then ONE pair groupBy; the token-count
# side is a broadcast (vocabulary-sized).
_PMI_MIN_SUP = 5
_PMI_LIFT_NUM, _PMI_LIFT_DEN = 12, 10           # lift >= 1.2


def text_pmi_collocations(spark, sf):
    d = load_table(spark, sf, "documents")
    w = (d.selectExpr("doc_id", f"{_CLEAN_SPARK} AS clean")
         .selectExpr("doc_id",
                     "array_sort(array_distinct(filter(split(clean, ' '), "
                     "x -> x != ''))) AS ws")
         .where("size(ws) > 0"))
    tok = w.selectExpr("doc_id", "explode(ws) AS t")
    ct = tok.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    nd = tok.agg(F.count_distinct("doc_id").alias("nd"))
    pairs = (w.selectExpr(
        "explode(flatten(transform(ws, (x, i) -> "
        "transform(slice(ws, i + 2, size(ws)), y -> struct(x AS t1, y AS t2)"
        ")))) AS pr")
        .select("pr.t1", "pr.t2"))
    p = pairs.groupBy("t1", "t2").agg(F.count(F.lit(1)).alias("n12"))
    out = (p.join(F.broadcast(ct.selectExpr("t AS t1", "c AS c1")), "t1")
           .join(F.broadcast(ct.selectExpr("t AS t2", "c AS c2")), "t2")
           .crossJoin(F.broadcast(nd)))
    keep = ((F.col("n12") >= _PMI_MIN_SUP)
            & (_PMI_LIFT_DEN * F.col("n12") * F.col("nd")
               >= _PMI_LIFT_NUM * F.col("c1") * F.col("c2")))
    return (out.where(keep)
            .select("t1", "t2", "n12", "c1", "c2",
                    ((F.col("n12") * F.col("nd")).cast("double")
                     / (F.col("c1") * F.col("c2"))).alias("lift")))


TEXT_PMI_COLLOCATIONS_SQL = f"""
WITH c AS (SELECT doc_id, {_CLEAN_DUCK} AS clean FROM documents),
w AS (SELECT doc_id,
             unnest(list_distinct(list_filter(string_split(clean, ' '),
                                              x -> x <> ''))) AS t
      FROM c),
ct AS (SELECT t, COUNT(*) AS c FROM w GROUP BY t),
n AS (SELECT COUNT(DISTINCT doc_id) AS nd FROM w),
p AS (SELECT a.t AS t1, b.t AS t2, COUNT(*) AS n12
      FROM w a JOIN w b ON a.doc_id = b.doc_id AND a.t < b.t
      GROUP BY a.t, b.t)
SELECT p.t1, p.t2, p.n12, c1.c AS c1, c2.c AS c2,
       CAST(p.n12 * n.nd AS DOUBLE) / (c1.c * c2.c) AS lift
FROM p
JOIN ct c1 ON c1.t = p.t1
JOIN ct c2 ON c2.t = p.t2
CROSS JOIN n
WHERE p.n12 >= {_PMI_MIN_SUP}
  AND {_PMI_LIFT_DEN} * p.n12 * n.nd >= {_PMI_LIFT_NUM} * c1.c * c2.c
"""


# -- BPE TRAINING LOOP (round-9 judge order #4) ----------------------------
# The driver-iterated merges-to-vocab loop completing text_bpe_pair_merge
# (one decision) into the actual tokenizer-training shape: N successive
# argmax-pair merges via operators/bpe.BpeTrainer — state is the word-
# TYPE table (bounded by the type vocabulary, never the corpus; the one
# corpus-sized job is the initial word count), each merge is a pure
# Catalyst fold, each decision a 1-row TakeOrdered.
#
# The oracle re-derives the SAME training run fully independently in
# DuckDB: words are carried as chr(31)-delimited symbol strings
# ("\x1f\x1f" between symbols, wrapped both ends) so the greedy
# left-to-right non-overlapping merge is EXACTLY one REPLACE of
# "\x1f a \x1f\x1f b \x1f" with "\x1f ab \x1f" (left-to-right REPLACE
# semantics == the fold's), and each step's argmax is re-counted from
# the re-split strings.  Tokens are [a-z0-9]+ so the delimiter can
# never occur inside a symbol; ties break (count DESC, a, b) — byte
# order on ASCII, identical cross-engine.  Output: the N merge
# decisions (with winning counts) + the final top-20 subword
# vocabulary, union-tagged.
_BPE_N_MERGES = 6


def text_bpe_train_loop(spark, sf):
    from ..operators.bpe import BpeTrainer

    d = load_table(spark, sf, "documents")
    words = (d.selectExpr(f"explode({_TOKENS_SPARK}) AS w")
             .groupBy("w").agg(F.count(F.lit(1)).alias("wc")))
    tr = BpeTrainer()
    merges = tr.train(words, _BPE_N_MERGES)
    # the loop must reach the vocab target (no early stop) for the
    # merge table below to be the full training run
    assert len(merges) == _BPE_N_MERGES, \
        f"early stop after {len(merges)} merges"
    merge_rows = spark.createDataFrame(
        [("merge", i + 1, a + b, n)
         for i, (a, b, n) in enumerate(tr.merge_stats)],
        "part string, step int, symbol string, n long")
    vocab = (tr.vocab()
             .orderBy(F.desc("n"), F.asc("symbol")).limit(20)
             .select(F.lit("vocab").alias("part"), F.lit(0).alias("step"),
                     "symbol", "n"))
    return merge_rows.unionByName(vocab)


def _bpe_train_loop_sql(n_merges: int) -> str:
    dd = "(chr(31) || chr(31))"          # inter-symbol delimiter
    syms = ("list_filter(string_split(rep, chr(31) || chr(31)), "
            "s -> s <> '')")
    pair_cte = (
        "SELECT p.a AS a, p.b AS b, CAST(SUM(wc) AS BIGINT) AS n "
        "FROM (SELECT {syms} AS sy, wc FROM {src}), "
        "unnest(list_transform(range(1, len(sy)), "
        "j -> struct_pack(a := sy[CAST(j AS INTEGER)], "
        "b := sy[CAST(j AS INTEGER) + 1]))) AS t(p) "
        "GROUP BY 1, 2")
    parts = [
        f"w0 AS (SELECT {dd} || array_to_string("
        "list_transform(range(1, length(w) + 1), "
        f"j -> substr(w, CAST(j AS INTEGER), 1)), {dd}) || {dd} AS rep, "
        "wc FROM (SELECT token AS w, COUNT(*) AS wc FROM "
        f"(SELECT unnest({_TOKENS_DUCK}) AS token FROM documents) "
        "GROUP BY 1))"]
    for i in range(1, n_merges + 1):
        parts.append(
            f"p{i} AS ({pair_cte.format(syms=syms, src=f'w{i - 1}')})")
        parts.append(
            f"m{i} AS (SELECT a, b, n FROM p{i} "
            "ORDER BY n DESC, a, b LIMIT 1)")
        parts.append(
            f"w{i} AS (SELECT replace(rep, "
            f"chr(31) || m.a || {dd} || m.b || chr(31), "
            "chr(31) || m.a || m.b || chr(31)) AS rep, wc "
            f"FROM w{i - 1}, m{i} AS m)")
    merge_rows = " UNION ALL ".join(
        f"SELECT 'merge' AS part, {i} AS step, a || b AS symbol, n "
        f"FROM m{i}" for i in range(1, n_merges + 1))
    return (
        "WITH " + ",\n".join(parts) + ",\n"
        f"vocab AS (SELECT s AS symbol, CAST(SUM(wc) AS BIGINT) AS n "
        f"FROM (SELECT unnest({syms}) AS s, wc FROM w{n_merges}) "
        "GROUP BY 1 ORDER BY n DESC, symbol LIMIT 20)\n"
        f"SELECT part, CAST(step AS INTEGER) AS step, symbol, n FROM "
        f"({merge_rows}) \n"
        "UNION ALL\n"
        "SELECT 'vocab' AS part, 0 AS step, symbol, n FROM vocab")


TEXT_BPE_TRAIN_LOOP_SQL = _bpe_train_loop_sql(_BPE_N_MERGES)


QUERIES = {
    "text_passage_dedup": Query(text_passage_dedup, TEXT_PASSAGE_DEDUP_SQL,
                                "cross-doc 20-token span dedup profile"),
    "text_tfidf_keywords": Query(text_tfidf_keywords, TEXT_TFIDF_SQL,
                                 "top-3 tf-idf keywords per document"),
    "text_bm25_search": Query(text_bm25_search, TEXT_BM25_SQL,
                              "BM25 top-10 retrieval (integer-quantized)"),
    "text_char_diversity": Query(
        text_char_diversity, TEXT_CHAR_DIVERSITY_SQL,
        "char-histogram quality signal: distinct + modal char"),
    "corpus_stratified_sample": Query(
        corpus_stratified_sample, CORPUS_STRATIFIED_SQL,
        "per-stratum exact-quota deterministic sampling"),
    "corpus_sequence_packing": Query(
        corpus_sequence_packing, CORPUS_SEQUENCE_PACKING_SQL,
        "sequence packing: concat-and-chunk pack assignment"),
    "text_bigram_fluency": Query(text_bigram_fluency, TEXT_BIGRAM_FLUENCY_SQL,
                                 "bigram-LM fluency score (perplexity proxy)"),
    "text_decontamination": Query(text_decontamination, TEXT_DECONTAMINATION_SQL,
                                  "eval-set n-gram overlap (benchmark decontamination)"),
    "corpus_mixture_sampling": Query(corpus_mixture_sampling, CORPUS_MIXTURE_SQL,
                                     "per-language deterministic mixture sampling"),
    "text_repetition_filter": Query(text_repetition_filter, TEXT_REPETITION_SQL,
                                    "word-3-gram repetition ratio (quality drop rule)"),
    "text_pii_scrub": Query(text_pii_scrub, TEXT_PII_SCRUB_SQL,
                            "email/phone detection + redaction"),
    "text_quality_filter": Query(text_quality_filter, TEXT_QUALITY_FILTER_SQL,
                                 "composed keep/drop verdict with named reasons"),
    "text_fuzzy_event_types": Query(text_fuzzy_event_types, TEXT_FUZZY_SQL,
                                    "levenshtein fuzzy similarity"),
    "dataset_split_assignment": Query(dataset_split_assignment, DATASET_SPLIT_SQL,
                                      "deterministic hash-based train/val/test split"),
    "text_token_count": Query(text_token_count, TEXT_TOKEN_COUNT_SQL,
                              "token counting: whitespace vs BPE-ish regex"),
    "text_quality_stats": Query(text_quality_stats, TEXT_QUALITY_STATS_SQL,
                                "quality scoring: token/stopword/alpha ratios"),
    "text_lang_id": Query(text_lang_id, TEXT_LANG_ID_SQL,
                          "marker-word language ID heuristic"),
    "text_token_topk": Query(text_token_topk, TEXT_TOKEN_TOPK_SQL,
                             "global token frequency top-k (explode)"),
    "dedup_exact": Query(dedup_exact, DEDUP_EXACT_SQL,
                         "exact dedup via md5 hash-groupBy"),
    "doc_fingerprint": Query(doc_fingerprint, DOC_FINGERPRINT_SQL,
                             "md5 + min-rolling-hash fingerprint"),
    # appended at the END of the module dict (gate-composition rule,
    # corpus/__init__.py): new queries must not shift the pinned first 50
    "text_bpe_pair_merge": Query(
        text_bpe_pair_merge, TEXT_BPE_PAIR_SQL,
        "BPE trainer step: word-frequency-weighted adjacent char-pair "
        "counts over the distinct-word dictionary"),
    "text_ngram_novelty": Query(
        text_ngram_novelty, TEXT_NGRAM_NOVELTY_SQL,
        "cross-snapshot novelty: word-3-gram vocabulary of the new half "
        "never seen in the old half"),
    "text_cms_heavy_hitters": Query(
        text_cms_heavy_hitters, TEXT_CMS_SQL,
        "count-min sketch audit: exact vs fixed-memory sketch estimate "
        "for the top-20 heavy hitters, zero float tolerance"),
    "corpus_prep_pipeline": Query(
        corpus_prep_pipeline, CORPUS_PREP_PIPELINE_SQL,
        "the composed prep funnel: exact dedup -> quality gate -> "
        "per-language cap, reported as a per-language funnel"),
    "text_pmi_collocations": Query(
        text_pmi_collocations, TEXT_PMI_COLLOCATIONS_SQL,
        "collocation mining: document-level co-occurrence lift "
        "(exp-PMI) with an exact-integer significance gate — "
        "division-only, no logs, no float membership decisions"),
    "text_bpe_train_loop": Query(
        text_bpe_train_loop, TEXT_BPE_TRAIN_LOOP_SQL,
        "the BPE TRAINING loop: six driver-iterated argmax-pair merges "
        "over the word-type table (BpeTrainer) — merge decisions with "
        "winning counts + the final top-20 subword vocabulary, against "
        "an independent DuckDB replay (delimited-string REPLACE folds)"),
}
