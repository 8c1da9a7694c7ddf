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


# -- corpus drift: total-variation distance between snapshots -------------
# "Did the token distribution shift between crawl snapshots?" — the
# acceptance gate before swapping a training mixture.  TV distance
# 0.5 * sum_t |p_t - q_t| over the token vocabularies of two halves.
# Exactness: with p_t = a_t/A and q_t = b_t/B, the summand is
# |a_t*B - b_t*A| / (A*B) — an exact BIGINT numerator (token counts are
# ~1e5 at sf0.1, products ~1e10, sums bounded well under 2^63), so the
# whole statistic is one integer sum and a single final division.
# Plan: one scan explodes tokens with the half tag; ONE map-side-
# combined groupBy(token) builds both count columns via conditional
# sums (no join of two aggregates); the final reduce is a scalar.
def corpus_drift_tv(spark, sf):
    d = load_table(spark, sf, "documents")
    toks = d.selectExpr("doc_id % 2 AS half",
                        f"explode({_TOKENS_SPARK}) AS token")
    per_tok = (toks.groupBy("token")
               .agg(F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("a"),
                    F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("b")))
    totals = per_tok.agg(F.sum("a").alias("tot_a"), F.sum("b").alias("tot_b"))
    return (per_tok.crossJoin(F.broadcast(totals))
            .agg(F.max("tot_a").alias("n_tokens_a"),
                 F.max("tot_b").alias("n_tokens_b"),
                 F.count(F.lit(1)).alias("n_vocab"),
                 F.sum(F.abs(F.col("a") * F.col("tot_b")
                             - F.col("b") * F.col("tot_a")))
                 .alias("tv_numerator"))
            .selectExpr("n_tokens_a", "n_tokens_b", "n_vocab", "tv_numerator",
                        "CAST(tv_numerator AS DOUBLE)"
                        " / (2.0 * n_tokens_a * n_tokens_b) AS tv_distance"))


CORPUS_DRIFT_TV_SQL = f"""
WITH t AS (SELECT doc_id % 2 AS half, unnest({_TOKENS_DUCK}) AS token
           FROM documents),
p AS (SELECT token,
             SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS a,
             SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS b
      FROM t GROUP BY 1),
g AS (SELECT CAST(SUM(a) AS BIGINT) AS A, CAST(SUM(b) AS BIGINT) AS B
      FROM p)
SELECT g.A AS n_tokens_a, g.B AS n_tokens_b,
       CAST(COUNT(*) AS BIGINT) AS n_vocab,
       CAST(SUM(abs(p.a * g.B - p.b * g.A)) AS BIGINT) AS tv_numerator,
       CAST(SUM(abs(p.a * g.B - p.b * g.A)) AS DOUBLE)
         / (2.0 * g.A * g.B) AS tv_distance
FROM p, g GROUP BY g.A, g.B
"""


# -- corpus drift: chi-square distance, transcendental-free ---------------
# The divergence-family companion to corpus_drift_tv: chi-square
# distance 0.5 * sum_t (p_t - q_t)^2 / (p_t + q_t) weights shifts by
# rarity (a doubled rare token counts; TV treats all mass equally).
# KL/JS need logs — NOT cross-engine-deterministic (ln is not correctly
# rounded) — but chi-square is division-only, and every per-token step
# here is an exactly-rounded IEEE op on identical inputs, hence
# bit-identical on both engines: p = a/A and q = b/B (one division
# each), (p-q)^2/(p+q) (sub/mul/add/div), * 1e15 (exact power of ten).
# The ONE remaining hazard is summing doubles (order-dependent), dodged
# with a FLOOR grid: floor(contrib * 1e15) is BIGINT-exact and floor —
# unlike round() or a DECIMAL cast — has no tie-break semantics to
# diverge on.  The scaled sum is bounded (sum of contribs <= 2, so
# <= 2e15) and associative; truncation error < |vocab| * 1e-15.
def corpus_drift_chisq(spark, sf):
    d = load_table(spark, sf, "documents")
    toks = d.selectExpr("doc_id % 2 AS half",
                        f"explode({_TOKENS_SPARK}) AS token")
    per_tok = (toks.groupBy("token")
               .agg(F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("a"),
                    F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("b")))
    totals = per_tok.agg(F.sum("a").alias("tot_a"), F.sum("b").alias("tot_b"))
    contrib = ("(CAST(a AS DOUBLE) / tot_a - CAST(b AS DOUBLE) / tot_b)"
               " * (CAST(a AS DOUBLE) / tot_a - CAST(b AS DOUBLE) / tot_b)"
               " / (CAST(a AS DOUBLE) / tot_a + CAST(b AS DOUBLE) / tot_b)")
    return (per_tok.crossJoin(F.broadcast(totals))
            .agg(F.max("tot_a").alias("n_tokens_a"),
                 F.max("tot_b").alias("n_tokens_b"),
                 F.count(F.lit(1)).alias("n_vocab"),
                 F.sum(F.expr(
                     f"CAST(floor(({contrib}) * 1e15) AS BIGINT)"))
                 .alias("chisq_scaled"))
            .selectExpr("n_tokens_a", "n_tokens_b", "n_vocab",
                        "chisq_scaled",
                        "0.5 * CAST(chisq_scaled AS DOUBLE) / 1e15"
                        " AS chisq_distance"))


_CHISQ_CONTRIB_DUCK = (
    "(p.a::DOUBLE / g.A - p.b::DOUBLE / g.B)"
    " * (p.a::DOUBLE / g.A - p.b::DOUBLE / g.B)"
    " / (p.a::DOUBLE / g.A + p.b::DOUBLE / g.B)")
CORPUS_DRIFT_CHISQ_SQL = f"""
WITH t AS (SELECT doc_id % 2 AS half, unnest({_TOKENS_DUCK}) AS token
           FROM documents),
p AS (SELECT token,
             SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS a,
             SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS b
      FROM t GROUP BY 1),
g AS (SELECT CAST(SUM(a) AS BIGINT) AS A, CAST(SUM(b) AS BIGINT) AS B
      FROM p)
SELECT g.A AS n_tokens_a, g.B AS n_tokens_b,
       CAST(COUNT(*) AS BIGINT) AS n_vocab,
       CAST(SUM(CAST(floor(({_CHISQ_CONTRIB_DUCK}) * 1e15) AS BIGINT)) AS BIGINT)
         AS chisq_scaled,
       0.5 * CAST(SUM(CAST(floor(({_CHISQ_CONTRIB_DUCK}) * 1e15) AS BIGINT)) AS DOUBLE)
         / 1e15 AS chisq_distance
FROM p, g GROUP BY g.A, g.B
"""


# -- mixture balance: Gini concentration in exact integers -----------------
# The acceptance report for a training mixture: how concentrated are
# documents across languages and tokens across sources?  Gini via the
# order-statistic identity G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x))
# with x ascending (ties broken by group name — the tie order changes
# sum(i*x_i), so the tie-break must be part of the definition to stay
# cross-engine deterministic).  Numerators stay BIGINT; the ONLY float
# op is the final division.  One groupBy + one tiny (n-groups) window
# per dimension — scan-bound at any scale.
def corpus_gini_balance(spark, sf):
    from pyspark.sql import Window
    from .textops import _CLEAN_SPARK
    d = (load_table(spark, sf, "documents")
         .selectExpr("lang", "source",
                     f"size(filter(split({_CLEAN_SPARK}, ' '), "
                     "x -> x != '')) AS ntok"))

    def gini_row(grouped, prefix):
        w = Window.orderBy(F.col("x").asc(), F.col("g").asc())
        ranked = grouped.select("g", "x", F.row_number().over(w).alias("i"))
        return (ranked.agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("x").cast("bigint").alias("tot"),
            F.sum(F.col("i") * F.col("x")).cast("bigint").alias("iwx"))
            .selectExpr(
                f"n AS {prefix}_groups",
                f"tot AS {prefix}_total",
                f"2 * iwx - (n + 1) * tot AS {prefix}_gini_num",
                f"CAST(2 * iwx - (n + 1) * tot AS DOUBLE) / (n * tot)"
                f" AS {prefix}_gini"))

    lang = gini_row(d.groupBy(F.col("lang").alias("g"))
                    .agg(F.count(F.lit(1)).alias("x")), "lang_docs")
    src = gini_row(d.groupBy(F.col("source").alias("g"))
                   .agg(F.sum("ntok").alias("x")), "src_tokens")
    return lang.crossJoin(F.broadcast(src))   # both sides are 1 row


def _gini_sql(src_cte: str, prefix: str) -> str:
    return f"""
SELECT CAST(COUNT(*) AS BIGINT) AS {prefix}_groups,
       CAST(SUM(x) AS BIGINT) AS {prefix}_total,
       CAST(2 * SUM(i * x) - (COUNT(*) + 1) * SUM(x) AS BIGINT)
         AS {prefix}_gini_num,
       CAST(2 * SUM(i * x) - (COUNT(*) + 1) * SUM(x) AS DOUBLE)
         / (COUNT(*) * SUM(x)) AS {prefix}_gini
FROM (SELECT g, x, ROW_NUMBER() OVER (ORDER BY x ASC, g ASC) AS i
      FROM ({src_cte}))
"""


from .textops import _CLEAN_DUCK as _GINI_CLEAN  # noqa: E402

CORPUS_GINI_BALANCE_SQL = f"""
WITH d AS (SELECT lang, source,
                  len(list_filter(string_split({_GINI_CLEAN}, ' '),
                                  x -> x <> '')) AS ntok
           FROM documents),
lang_gini AS ({_gini_sql(
    "SELECT lang AS g, COUNT(*) AS x FROM d GROUP BY lang", "lang_docs")}),
src_gini AS ({_gini_sql(
    "SELECT source AS g, SUM(ntok) AS x FROM d GROUP BY source",
    "src_tokens")})
SELECT * FROM lang_gini CROSS JOIN src_gini
"""


# -- corpus drift: Hellinger distance, transcendental-free ----------------
# Third member of the divergence family (TV = mass-shift, chi-square =
# rarity-weighted, Hellinger = geometry of sqrt-space — bounded [0,1]
# and symmetric, the standard choice when p and q have disjoint
# support regions that make chi-square blow up).  H^2(p, q) =
# 0.5 * sum_t (sqrt(p_t) - sqrt(q_t))^2.  Exactness: IEEE 754 REQUIRES
# sqrt to be correctly rounded (like +-*/), so sqrt(a/A) is
# bit-identical cross-engine; the per-token (s_p - s_q)^2 is two more
# exactly-rounded ops on identical inputs.  The order-dependent double
# SUM is dodged with the same FLOOR grid as corpus_drift_chisq:
# floor(contrib * 1e15) is BIGINT-exact (sum of contribs <= 2, so the
# scaled sum <= 2e15) and floor has no tie-break semantics to diverge
# on; truncation error < |vocab| * 1e-15.
def corpus_drift_hellinger(spark, sf):
    d = load_table(spark, sf, "documents")
    toks = d.selectExpr("doc_id % 2 AS half",
                        f"explode({_TOKENS_SPARK}) AS token")
    per_tok = (toks.groupBy("token")
               .agg(F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("a"),
                    F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("b")))
    totals = per_tok.agg(F.sum("a").alias("tot_a"), F.sum("b").alias("tot_b"))
    contrib = ("(sqrt(CAST(a AS DOUBLE) / tot_a) - sqrt(CAST(b AS DOUBLE) / tot_b))"
               " * (sqrt(CAST(a AS DOUBLE) / tot_a) - sqrt(CAST(b AS DOUBLE) / tot_b))")
    return (per_tok.crossJoin(F.broadcast(totals))
            .agg(F.max("tot_a").alias("n_tokens_a"),
                 F.max("tot_b").alias("n_tokens_b"),
                 F.count(F.lit(1)).alias("n_vocab"),
                 F.sum(F.expr(
                     f"CAST(floor(({contrib}) * 1e15) AS BIGINT)"))
                 .alias("hellinger_scaled"))
            .selectExpr("n_tokens_a", "n_tokens_b", "n_vocab",
                        "hellinger_scaled",
                        "0.5 * CAST(hellinger_scaled AS DOUBLE) / 1e15"
                        " AS hellinger_sq"))


_HELLINGER_CONTRIB_DUCK = (
    "(sqrt(p.a::DOUBLE / g.A) - sqrt(p.b::DOUBLE / g.B))"
    " * (sqrt(p.a::DOUBLE / g.A) - sqrt(p.b::DOUBLE / g.B))")
CORPUS_DRIFT_HELLINGER_SQL = f"""
WITH t AS (SELECT doc_id % 2 AS half, unnest({_TOKENS_DUCK}) AS token
           FROM documents),
p AS (SELECT token,
             SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS a,
             SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS b
      FROM t GROUP BY 1),
g AS (SELECT CAST(SUM(a) AS BIGINT) AS A, CAST(SUM(b) AS BIGINT) AS B
      FROM p)
SELECT g.A AS n_tokens_a, g.B AS n_tokens_b,
       CAST(COUNT(*) AS BIGINT) AS n_vocab,
       CAST(SUM(CAST(floor(({_HELLINGER_CONTRIB_DUCK}) * 1e15) AS BIGINT)) AS BIGINT)
         AS hellinger_scaled,
       0.5 * CAST(SUM(CAST(floor(({_HELLINGER_CONTRIB_DUCK}) * 1e15) AS BIGINT)) AS DOUBLE)
         / 1e15 AS hellinger_sq
FROM p, g GROUP BY g.A, g.B
"""


# -- corpus drift: Jensen-Shannon divergence, transcendental-free ---------
# Fourth member of the divergence family (TV = mass-shift, chi-square =
# rarity-weighted, Hellinger = sqrt-space geometry, JS = the
# information-theoretic standard: symmetric, bounded [0,1] in bits,
# finite on disjoint support).  JSD(p,q) = 0.5 * sum_t [ p*log2(p/m) +
# q*log2(q/m) ], m = (p+q)/2.  log2 is NOT IEEE-correctly-rounded, so
# calling the engine's log2 would break the bit-exact oracle — instead
# the chi-square dodge EXTENDS to logs in two steps, both exact:
#   1. exact dyadic range reduction in INTEGER space: every log2
#      argument here is a ratio of integer count products — p/m =
#      2aB/(aB+bA) — so log2(u) for BIGINT u splits as k + log2(u/2^k)
#      with k = length(bin(u)) - 1 (bin() prints no leading zeros in
#      both engines, so k is an EXACT integer) and u/2^k in [1,2)
#      computed as one exact cast (u < 2^53) and one exact
#      power-of-two division;
#   2. a PINNED truncated series on [1,2): log2(m) = (2/ln2)*atanh(z),
#      z = (m-1)/(m+1) in [0,1/3), evaluated as a fixed Horner tree of
#      14 odd terms through z^27.  Every op is an exactly-rounded IEEE
#      +-*/ on bit-identical inputs, and (2/ln2) plus the 1/(2j+1)
#      coefficients are decimal literals both engines parse to the
#      same doubles — so the value is BIT-IDENTICAL cross-engine by
#      construction (verified over 1..2^53-1 spot grid).  Truncation
#      error: remainder <= z^29/(29*(1-z^2)) < 6e-16, so the statistic
#      is true JSD to ~1e-14 — below the 1e15 floor grid that (as in
#      chi-square) dodges the order-dependent double SUM.
# Integer-exactness bound: aB + bA must stay under 2^53 (max per-token
# count x other half's total).  Holds through sf10 with room; beyond
# that, pre-divide both halves' counts by a common power of two (exact)
# before the ratio.
_JSD_GRID = "1e15"


def _pinned_log2(u: str, dialect: str) -> str:
    """Deterministic log2 for a BIGINT SQL expression ``u`` >= 1: exact
    bit-length range reduction + pinned 14-term atanh series (see
    corpus_drift_jsd header).  Bit-identical across Spark and DuckDB."""
    k = f"(length(bin({u})) - 1)"
    two_k = (f"shiftleft(CAST(1 AS BIGINT), {k})" if dialect == "spark"
             else f"(CAST(1 AS BIGINT) << {k})")
    m = f"(CAST({u} AS DOUBLE) / CAST({two_k} AS DOUBLE))"
    z = f"(({m} - 1.0e0) / ({m} + 1.0e0))"
    horner = "(1.0e0 / 27.0e0)"
    for j in range(25, 0, -2):
        horner = f"((1.0e0 / {j}.0e0) + (__Z2 * {horner}))"
    return (f"(CAST({k} AS DOUBLE)"
            f" + (2.8853900817779268e0 * (__Z * {horner})))"
            .replace("__Z2", f"(__Z * __Z)").replace("__Z", z))


def _jsd_contrib(a, b, ta, tb, dialect: str) -> str:
    """Per-token JSD contribution p*log2(p/m) + q*log2(q/m) with
    p = a/A, q = b/B, m = (p+q)/2, hence p/m = 2aB/(aB+bA): every log2
    argument an exact integer product (the a=0 / b=0 terms are zero by
    the p*log(p) convention)."""
    u, v = f"({a} * {tb})", f"({b} * {ta})"
    w = f"({u} + {v})"
    lw = _pinned_log2(w, dialect)
    term_p = (f"(CAST({a} AS DOUBLE) / {ta})"
              f" * ((1.0e0 + {_pinned_log2(u, dialect)}) - {lw})")
    term_q = (f"(CAST({b} AS DOUBLE) / {tb})"
              f" * ((1.0e0 + {_pinned_log2(v, dialect)}) - {lw})")
    return (f"((CASE WHEN {a} = 0 THEN 0.0e0 ELSE {term_p} END)"
            f" + (CASE WHEN {b} = 0 THEN 0.0e0 ELSE {term_q} END))")


def corpus_drift_jsd(spark, sf):
    d = load_table(spark, sf, "documents")
    toks = d.selectExpr("doc_id % 2 AS half",
                        f"explode({_TOKENS_SPARK}) AS token")
    per_tok = (toks.groupBy("token")
               .agg(F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("a"),
                    F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("b")))
    totals = per_tok.agg(F.sum("a").alias("tot_a"), F.sum("b").alias("tot_b"))
    # each pinned-log2 tree is its OWN projected column: a single SQL
    # expression codegens to one Java method, and the full contribution
    # (five inlined log trees, L(w) twice) overflows Janino's 64 KB
    # method limit (interpreted fallback, ~10x slower).  Splitting by
    # column keeps every method small AND evaluates L(w) once; the
    # VALUE is identical to the oracle's inlined form — same ops, named
    # intermediates.
    lu = _pinned_log2("(a * tot_b)", "spark")
    lv = _pinned_log2("(b * tot_a)", "spark")
    lw = _pinned_log2("((a * tot_b) + (b * tot_a))", "spark")
    contrib = ("((CASE WHEN a = 0 THEN 0.0e0 ELSE"
               " (CAST(a AS DOUBLE) / tot_a) * ((1.0e0 + lu) - lw) END)"
               " + (CASE WHEN b = 0 THEN 0.0e0 ELSE"
               " (CAST(b AS DOUBLE) / tot_b) * ((1.0e0 + lv) - lw) END))")
    return (per_tok.crossJoin(F.broadcast(totals))
            .select("a", "b", "tot_a", "tot_b",
                    F.expr(lu).alias("lu"), F.expr(lv).alias("lv"),
                    F.expr(lw).alias("lw"))
            .select("tot_a", "tot_b",
                    F.expr(f"CAST(floor(({contrib}) * {_JSD_GRID})"
                           " AS BIGINT)").alias("contrib_scaled"))
            .agg(F.max("tot_a").alias("n_tokens_a"),
                 F.max("tot_b").alias("n_tokens_b"),
                 F.count(F.lit(1)).alias("n_vocab"),
                 F.sum("contrib_scaled").alias("jsd_scaled"))
            .selectExpr("n_tokens_a", "n_tokens_b", "n_vocab",
                        "jsd_scaled",
                        f"0.5 * CAST(jsd_scaled AS DOUBLE) / {_JSD_GRID}"
                        " AS jsd_bits"))


_JSD_CONTRIB_DUCK = _jsd_contrib("p.a", "p.b", "g.A", "g.B", "duck")
CORPUS_DRIFT_JSD_SQL = f"""
WITH t AS (SELECT doc_id % 2 AS half, unnest({_TOKENS_DUCK}) AS token
           FROM documents),
p AS (SELECT token,
             CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS a,
             CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS b
      FROM t GROUP BY 1),
g AS (SELECT CAST(SUM(a) AS BIGINT) AS A, CAST(SUM(b) AS BIGINT) AS B
      FROM p)
SELECT g.A AS n_tokens_a, g.B AS n_tokens_b,
       CAST(COUNT(*) AS BIGINT) AS n_vocab,
       CAST(SUM(CAST(floor(({_JSD_CONTRIB_DUCK}) * {_JSD_GRID}) AS BIGINT)) AS BIGINT)
         AS jsd_scaled,
       0.5 * CAST(SUM(CAST(floor(({_JSD_CONTRIB_DUCK}) * {_JSD_GRID}) AS BIGINT)) AS DOUBLE)
         / {_JSD_GRID} AS jsd_bits
FROM p, g GROUP BY g.A, g.B
"""


# -- temperature-smoothed mixture weights ---------------------------------
# The standard multilingual/multi-source rebalancing step (alpha-
# smoothing, alpha = 0.5): sampling weight w_i proportional to
# p_i^alpha, which upsamples low-resource languages without discarding
# high-resource mass.  alpha = 0.5 makes p^alpha = sqrt(p) — and IEEE
# sqrt is correctly rounded, so every per-group value is bit-identical
# cross-engine.  The cross-group normalizing SUM of sqrt-doubles would
# be order-dependent; dodge: s_i = floor(sqrt(n_docs) * 1e9) is an
# exact BIGINT (sqrt(n) <= ~1e4 at any plausible doc count, so
# s_i <= ~1e13, sums far under 2^63), the total is an exact integer
# sum, and each weight/boost is a fixed expression tree of exactly-
# rounded ops on identical inputs.  Plan: one map-side-combined
# groupBy(lang) (a handful of groups) + a broadcast 1-row total —
# scan-bound at any scale.
def corpus_temperature_mixture(spark, sf):
    d = load_table(spark, sf, "documents")
    per_lang = (d.groupBy("lang")
                .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
                .selectExpr("lang", "n_docs",
                            "CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * 1e9)"
                            " AS BIGINT) AS sqrt_scaled"))
    totals = per_lang.agg(F.sum("n_docs").cast("bigint").alias("tot_docs"),
                          F.sum("sqrt_scaled").cast("bigint").alias("tot_sqrt"))
    return (per_lang.crossJoin(F.broadcast(totals))
            .selectExpr(
                "lang", "n_docs", "sqrt_scaled",
                "CAST(n_docs AS DOUBLE) / tot_docs AS raw_share",
                "CAST(sqrt_scaled AS DOUBLE) / tot_sqrt AS temp_weight",
                "(CAST(sqrt_scaled AS DOUBLE) / tot_sqrt)"
                " / (CAST(n_docs AS DOUBLE) / tot_docs) AS boost"))


CORPUS_TEMPERATURE_MIXTURE_SQL = """
WITH p AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
                  CAST(floor(sqrt(CAST(COUNT(*) AS DOUBLE)) * 1e9) AS BIGINT)
                    AS sqrt_scaled
           FROM documents GROUP BY lang),
g AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS tot_docs,
             CAST(SUM(sqrt_scaled) AS BIGINT) AS tot_sqrt FROM p)
SELECT p.lang, p.n_docs, p.sqrt_scaled,
       CAST(p.n_docs AS DOUBLE) / g.tot_docs AS raw_share,
       CAST(p.sqrt_scaled AS DOUBLE) / g.tot_sqrt AS temp_weight,
       (CAST(p.sqrt_scaled AS DOUBLE) / g.tot_sqrt)
         / (CAST(p.n_docs AS DOUBLE) / g.tot_docs) AS boost
FROM p, g
"""


# -- DSIR importance weights (data selection for LM pretraining) ----------
# The published data-selection shape (DSIR — Data Selection with
# Importance Resampling, Xie et al. 2023, arXiv:2302.03169): estimate
# per-document importance weights w(x) = p_target(x)/p_raw(x) under
# hashed bag-of-ngrams language models, then resample by weight.  This
# query is the weight-estimation stage over the documents fixture:
# target = the English slice, raw = the full corpus, features = token
# unigrams hashed into B buckets (the paper's hashed feature space,
# via the corpus's explicit 31-polynomial token hash + pinned affine
# perm — never an engine-native hash), add-1-smoothed counts,
#   log2 w(x) = sum_tokens [ log2((c_t(f)+1)/(T+B))
#                          - log2((c_r(f)+1)/(R+B)) ].
# Determinism: every log2 argument is a BIGINT, evaluated with the
# corpus's transcendental-free _pinned_log2 (exact bit-length range
# reduction + pinned atanh series — bit-identical cross-engine); each
# per-token contribution is floored onto a 1e12 grid as BIGINT so the
# per-document SUM is exact-integer (the JSD floor-grid dodge, dodging
# the shuffle-order-dependent double sum).  |contrib| < ~2.6e13 and
# docs are < 10k tokens, so the per-doc sum stays far under 2^63.
# Plan shape: one explode (map-only projection), ONE exchange to build
# the B-row lambda table (conditional sums fuse target+raw counts into
# a single aggregation), lambda broadcast back onto the token stream,
# ONE exchange for the per-doc sum, left join to keep token-less docs
# at weight 0.  At 100 TB the lambda table is B rows regardless of
# corpus size — the only state that crosses the wire twice.
_DSIR_B = 1024
_DSIR_A, _DSIR_C, _DSIR_P = 123457, 886731, 1_000_003
_DSIR_GRID = "1e12"


def _dsir_bucket(dialect: str) -> str:
    from .textops import _TOKHASH_DUCK, _TOKHASH_SPARK
    th = _TOKHASH_SPARK if dialect == "spark" else _TOKHASH_DUCK
    return f"(({_DSIR_A} * ({th}) + {_DSIR_C}) % {_DSIR_P}) % {_DSIR_B}"


def corpus_dsir_importance(spark, sf):
    d = load_table(spark, sf, "documents")
    toks = (d.selectExpr("doc_id", "lang",
                         f"explode({_TOKENS_SPARK}) AS tok")
            .selectExpr("doc_id", "lang",
                        f"{_dsir_bucket('spark')} AS f"))
    counts = (toks.groupBy("f")
              .agg(F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
                   .alias("ct"),
                   F.count(F.lit(1)).alias("cr")))
    totals = counts.agg(F.sum("ct").alias("tt"), F.sum("cr").alias("tr"))
    l_ct = _pinned_log2("(ct + 1)", "spark")
    l_cr = _pinned_log2("(cr + 1)", "spark")
    l_tt = _pinned_log2(f"(tt + {_DSIR_B})", "spark")
    l_tr = _pinned_log2(f"(tr + {_DSIR_B})", "spark")
    lam = (counts.crossJoin(F.broadcast(totals))
           .selectExpr("f",
                       f"CAST(floor(((({l_ct}) - ({l_cr}))"
                       f" + (({l_tr}) - ({l_tt}))) * {_DSIR_GRID})"
                       " AS BIGINT) AS lam_g"))
    per_doc = (toks.join(F.broadcast(lam), "f")
               .groupBy("doc_id")
               .agg(F.count(F.lit(1)).alias("n_tokens"),
                    F.sum("lam_g").alias("logw_g")))
    return (d.select("doc_id", "lang").join(per_doc, "doc_id", "left_outer")
            .selectExpr("doc_id", "lang",
                        "CAST(coalesce(n_tokens, 0) AS BIGINT) AS n_tokens",
                        "CAST(coalesce(logw_g, 0) AS BIGINT) AS logw_grid",
                        f"CAST(coalesce(logw_g, 0) AS DOUBLE) / {_DSIR_GRID}"
                        " AS log2_weight"))


def _dsir_sql() -> str:
    l_ct = _pinned_log2("(ct + 1)", "duckdb")
    l_cr = _pinned_log2("(cr + 1)", "duckdb")
    l_tt = _pinned_log2(f"(tt + {_DSIR_B})", "duckdb")
    l_tr = _pinned_log2(f"(tr + {_DSIR_B})", "duckdb")
    return f"""
WITH toks AS (
  SELECT doc_id, lang, {_dsir_bucket('duckdb')} AS f
  FROM (SELECT doc_id, lang, unnest({_TOKENS_DUCK}) AS tok
        FROM documents)
),
counts AS (
  SELECT f, SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ct,
         COUNT(*) AS cr
  FROM toks GROUP BY f
),
totals AS (SELECT SUM(ct) AS tt, SUM(cr) AS tr FROM counts),
lam AS (
  SELECT f, CAST(floor(((({l_ct}) - ({l_cr})) + (({l_tr}) - ({l_tt})))
                 * {_DSIR_GRID}) AS BIGINT) AS lam_g
  FROM counts, totals
),
per_doc AS (
  SELECT doc_id, COUNT(*) AS n_tokens, SUM(lam_g) AS logw_g
  FROM toks JOIN lam USING (f) GROUP BY doc_id
)
SELECT d.doc_id, d.lang,
       CAST(coalesce(p.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(coalesce(p.logw_g, 0) AS BIGINT) AS logw_grid,
       CAST(coalesce(p.logw_g, 0) AS DOUBLE) / {_DSIR_GRID}
       AS log2_weight
FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
"""


CORPUS_DSIR_IMPORTANCE_SQL = _dsir_sql()


QUERIES = {
    "corpus_drift_tv": Query(
        corpus_drift_tv, CORPUS_DRIFT_TV_SQL,
        "snapshot drift: integer-exact total-variation distance between "
        "token distributions", ("dataprep", "drift")),
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
    # appended at the END of the module dict (gate-composition rule,
    # corpus/__init__.py): new queries must not shift the pinned first 50
    "corpus_drift_chisq": Query(
        corpus_drift_chisq, CORPUS_DRIFT_CHISQ_SQL,
        "snapshot drift: chi-square distance (rarity-weighted companion "
        "to TV), floor-grid-summed for cross-engine determinism",
        ("dataprep", "drift")),
    "corpus_gini_balance": Query(
        corpus_gini_balance, CORPUS_GINI_BALANCE_SQL,
        "mixture-balance report: Gini concentration of docs-per-language "
        "and tokens-per-source, exact BIGINT numerators + one final "
        "division", ("dataprep", "balance")),
    "corpus_drift_hellinger": Query(
        corpus_drift_hellinger, CORPUS_DRIFT_HELLINGER_SQL,
        "snapshot drift: Hellinger distance (bounded, symmetric third "
        "member of the divergence family) — IEEE-correctly-rounded "
        "sqrt per token, floor-grid-summed", ("dataprep", "drift")),
    "corpus_temperature_mixture": Query(
        corpus_temperature_mixture, CORPUS_TEMPERATURE_MIXTURE_SQL,
        "temperature-smoothed (alpha=0.5) mixture reweighting: "
        "sqrt-share sampling weights + low-resource boost factors in "
        "exact scaled BIGINTs", ("dataprep", "balance")),
    "corpus_drift_jsd": Query(
        corpus_drift_jsd, CORPUS_DRIFT_JSD_SQL,
        "snapshot drift: Jensen-Shannon divergence in bits — log2 via "
        "exact bit-length range reduction + pinned atanh series "
        "(bit-identical cross-engine), floor-grid-summed",
        ("dataprep", "drift")),
    "corpus_dsir_importance": Query(
        corpus_dsir_importance, CORPUS_DSIR_IMPORTANCE_SQL,
        "DSIR data selection: per-document log2 importance weights "
        "under hashed-unigram target/raw LMs (explicit poly hash, "
        "add-1 smoothing, pinned transcendental-free log2, floor-grid "
        "exact per-doc sums) — the B-row lambda table is the only "
        "broadcast state", ("dataprep", "selection")),
}
