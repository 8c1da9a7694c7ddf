"""Near-duplicate detection + similarity search at training-data scale
(beyond-reference surface, SURVEY §7.2 M6).

Operators:
  * dedup_ngram_jaccard — baseline: candidate pairs by shared character
    5-gram shingle, verified by exact Jaccard.  O(pairs-sharing-a-shingle);
    fine for a micro-batch, quadratic at corpus scale.
  * dedup_minhash_lsh — the scale path: 8 minhash permutations, 4 bands
    of 2 rows; candidates only where a band collides, then exact-Jaccard
    verify.  Shuffle cost O(docs·k) + O(collisions), never O(n²).
  * dedup_simhash — 16-bit simhash signatures; pairs within Hamming
    distance 3, pre-bucketed on the high byte.
  * ann_cosine_topk — brute-force cosine top-k (the exact baseline).
  * ann_lsh_bucket_topk — sign-bit-bucketed ANN (the approximate scale
    path: each query only scans its bucket).

Cross-engine determinism: all hashing is explicit integer arithmetic
(polynomial rolling hash, modular minhash) — no engine-native hash
functions, which differ between Spark and DuckDB.  Cosine is computed on
integer-quantized vectors (round(x*1000)) so dot products are exact and
the single final IEEE division/sqrt is bit-identical.

The corpora inject deterministic near-duplicates (a shifted copy of
every 20th document) so the queries have non-trivial output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .base import Query, load_table
from .textops import _CLEAN_DUCK, _CLEAN_SPARK, _h_expr

# -- shared shingle machinery --------------------------------------------

_NEARDUP_OFFSET = 1_000_000

# canonical definitions live in functions/texthash.py (shared with the
# incremental LshIndex); aliased here to keep the corpus modules' names
from ..functions.texthash import JACCARD_THRESHOLD as _JACCARD_THRESHOLD
from ..functions.texthash import LSH_BANDS as _BANDS
from ..functions.texthash import MINHASH_P as _MINHASH_P
from ..functions.texthash import MINHASH_PERMS as _MINHASH_PERMS


def _neardup_corpus(spark, sf) -> DataFrame:
    d = load_table(spark, sf, "documents")
    base = d.selectExpr("doc_id", f"{_CLEAN_SPARK} AS clean")
    shifted = (d.where(F.col("doc_id") % 20 == 0)
               .selectExpr(f"doc_id + {_NEARDUP_OFFSET} AS doc_id",
                           f"substr({_CLEAN_SPARK}, 4) AS clean"))
    return base.unionByName(shifted)


_NEARDUP_CORPUS_SQL = f"""
SELECT doc_id, {_CLEAN_DUCK} AS clean FROM documents
UNION ALL
SELECT doc_id + {_NEARDUP_OFFSET} AS doc_id, substr({_CLEAN_DUCK}, 4) AS clean
FROM documents WHERE doc_id % 20 = 0
"""


def _shingles(corpus: DataFrame) -> DataFrame:
    """Distinct (doc_id, h): h = 31-polynomial hash of each char 5-gram.

    Cached: the shingle relation is re-read by candidate generation, the
    intersection join, and the set-size aggregate — without a cache Spark
    recomputes the explode+distinct shuffle for each consumer."""
    h = _h_expr("clean", "i")
    return (corpus.where("length(clean) >= 5")
            .selectExpr("doc_id",
                        f"explode(transform(sequence(1, length(clean) - 4), i -> {h})) AS h")
            .distinct()
            .cache())


_SHINGLES_SQL = f"""
SELECT DISTINCT doc_id, {_h_expr('clean', 'i')} AS h
FROM (
  SELECT doc_id, clean, unnest(range(1, length(clean) - 3)) AS i
  FROM corpus WHERE length(clean) >= 5
)
"""

_JACCARD_VERIFY_SQL = f"""
sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.d1, c.d2, COUNT(*) AS i
  FROM cand c
  JOIN sh s1 ON s1.doc_id = c.d1
  JOIN sh s2 ON s2.doc_id = c.d2 AND s2.h = s1.h
  GROUP BY c.d1, c.d2
)
SELECT i.d1 AS doc_id_1, i.d2 AS doc_id_2,
       CAST(i.i AS DOUBLE) / (z1.n + z2.n - i.i) AS jaccard
FROM inter i
JOIN sz z1 ON z1.doc_id = i.d1
JOIN sz z2 ON z2.doc_id = i.d2
WHERE CAST(i.i AS DOUBLE) / (z1.n + z2.n - i.i) >= {_JACCARD_THRESHOLD}
"""


# (_JACCARD_VERIFY_SQL above stays the ORACLES' formulation — the naive
# two-pass candidate+recount plan — precisely so the fused Spark form
# below is checked against an independently-derived computation.)


# -- n-gram Jaccard (baseline: all pairs sharing a shingle) --------------
def dedup_ngram_jaccard(spark, sf):
    """Exact baseline, FUSED form: ``sh`` is distinct (doc_id, shingle),
    so the shingle-equality self-join yields exactly one row per SHARED
    shingle per pair — grouping that join counts |A∩B| directly.
    Candidate generation and verification are ONE join + ONE
    aggregation; the previous form ran distinct() over the full pair
    expansion and then re-joined the shingle relation TWICE more to
    recount what the first join had already produced (measured 309 s ->
    230 s at sf0.1 — the residual cost is the shared-shingle pair
    expansion itself, irreducible for an EXACT baseline; output
    bit-identical, and the DuckDB oracle keeps the naive two-pass
    formulation as an independent check).  Deliberately quadratic in
    shared-shingle pairs: MinHash+LSH below is the scale path."""
    sh = _shingles(_neardup_corpus(spark, sf))
    sz = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.selectExpr("doc_id AS d1", "h")
    b = sh.selectExpr("doc_id AS d2", "h AS hb")
    inter = (a.join(b, (F.col("h") == F.col("hb")) & (F.col("d1") < F.col("d2")))
             .groupBy("d1", "d2").agg(F.count(F.lit(1)).alias("i")))
    z1 = sz.selectExpr("doc_id AS z1_doc", "n AS n1")
    z2 = sz.selectExpr("doc_id AS z2_doc", "n AS n2")
    jac = F.col("i").cast("double") / (F.col("n1") + F.col("n2") - F.col("i"))
    return (inter
            .join(F.broadcast(z1), F.col("d1") == F.col("z1_doc"))
            .join(F.broadcast(z2), F.col("d2") == F.col("z2_doc"))
            .where(jac >= _JACCARD_THRESHOLD)
            .select(F.col("d1").alias("doc_id_1"), F.col("d2").alias("doc_id_2"),
                    jac.alias("jaccard")))


DEDUP_NGRAM_JACCARD_SQL = f"""
WITH corpus AS ({_NEARDUP_CORPUS_SQL}),
sh AS ({_SHINGLES_SQL}),
cand AS (
  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
  FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
),
{_JACCARD_VERIFY_SQL}
"""


# -- MinHash + LSH (the scale path) --------------------------------------
# Shuffle-free signatures: the distinct shingle SET is a per-row ARRAY
# (array_distinct over the 5-gram transform) and each minhash is an
# array_min over it — all inside one projection, whole-stage codegen,
# ZERO shuffles until the band self-join.  Jaccard verification then
# rides on the arrays carried into the candidate join (array_intersect),
# replacing the explode + 3-way intersection join of the naive plan.
def _shingle_sets(corpus: DataFrame) -> DataFrame:
    h = _h_expr("clean", "i")
    return (corpus.where("length(clean) >= 5")
            .selectExpr("doc_id",
                        f"array_distinct(transform(sequence(1, length(clean) - 4), i -> {h})) AS hs"))


def _lsh_band_candidates(corpus: DataFrame, carry_sets: bool) -> DataFrame:
    """The SHARED banded-LSH candidate generator: minhash signatures as
    one codegen projection, one self-join per band, distinct (d1, d2)
    pairs with d1 < d2.  ``carry_sets`` rides the shingle-set arrays
    along (hs1/hs2) for exact verification; candidate-only consumers
    (substring runs) skip the array payload.  Single source of truth so
    'same candidates as dedup_minhash_lsh' stays structural, not a
    docstring promise."""
    docs = _shingle_sets(corpus)
    mins = [
        F.expr(f"array_min(transform(hs, h -> ({a} * h + {b}) % {_MINHASH_P}))").alias(f"mh{k}")
        for k, (a, b) in enumerate(_MINHASH_PERMS)
    ]
    carry = ["hs"] if carry_sets else []
    sig = docs.select("doc_id", *carry, *mins)
    bands = [
        F.concat_ws("-", *[F.col(f"mh{i}").cast("string") for i in idxs]).alias(f"band{bi}")
        for bi, idxs in enumerate(_BANDS)
    ]
    sig = sig.select("doc_id", *carry, *bands).cache()  # one read per band join
    a_carry = ["hs AS hs1"] if carry_sets else []
    b_carry = ["hs AS hs2"] if carry_sets else []
    out_cols = ["d1", "d2", *(["hs1", "hs2"] if carry_sets else [])]
    cands = None
    for bi in range(len(_BANDS)):
        a = sig.selectExpr("doc_id AS d1", *a_carry, f"band{bi} AS bk")
        b = sig.selectExpr("doc_id AS d2", *b_carry, f"band{bi} AS bk2")
        c = (a.join(b, (F.col("bk") == F.col("bk2")) & (F.col("d1") < F.col("d2")))
             .select(*out_cols))
        cands = c if cands is None else cands.unionByName(c)
    return cands.dropDuplicates(["d1", "d2"])


def dedup_minhash_lsh(spark, sf):
    cand = _lsh_band_candidates(_neardup_corpus(spark, sf), carry_sets=True)
    jac = (F.expr("size(array_intersect(hs1, hs2))").cast("double")
           / F.expr("size(hs1) + size(hs2) - size(array_intersect(hs1, hs2))"))
    return (cand.where(jac >= _JACCARD_THRESHOLD)
            .select(F.col("d1").alias("doc_id_1"), F.col("d2").alias("doc_id_2"),
                    jac.alias("jaccard")))


_mh_cols = ",\n       ".join(
    f"MIN(CAST(({a} * h + {b}) % {_MINHASH_P} AS BIGINT)) AS mh{k}"
    for k, (a, b) in enumerate(_MINHASH_PERMS))
_band_cols = ", ".join(
    "CONCAT_WS('-', " + ", ".join(f"mh{i}" for i in idxs) + f") AS band{bi}"
    for bi, idxs in enumerate(_BANDS))
_band_joins = "\nUNION ALL\n".join(
    f"SELECT a.doc_id AS d1, b.doc_id AS d2 FROM bands a "
    f"JOIN bands b ON a.band{bi} = b.band{bi} AND a.doc_id < b.doc_id"
    for bi in range(len(_BANDS)))
DEDUP_MINHASH_LSH_SQL = f"""
WITH corpus AS ({_NEARDUP_CORPUS_SQL}),
sh AS ({_SHINGLES_SQL}),
sig AS (
  SELECT doc_id,
       {_mh_cols}
  FROM sh GROUP BY doc_id
),
bands AS (SELECT doc_id, {_band_cols} FROM sig),
cand AS (SELECT DISTINCT d1, d2 FROM ({_band_joins})),
{_JACCARD_VERIFY_SQL}
"""


# -- MinHash containment: asymmetric near-dup (subset documents) ----------
# Jaccard misses the quote-inclusion case: a document fully CONTAINED in
# a longer one scores |A|/|B|, arbitrarily low as B grows.  Containment
# c(A in B) = |A∩B| / |A| is the right statistic (Broder's original
# resemblance/containment pair) — the near-dup corpus' shifted copies
# are strict shingle-subsets of their originals, so their containment is
# EXACTLY 1.0 while their Jaccard is ~0.95 and shrinking with the shift.
# Candidates come from the same band self-join as dedup_minhash_lsh;
# both directions are reported per pair.
_CONTAINMENT_THRESHOLD = 0.9


def dedup_minhash_containment(spark, sf):
    cand = _lsh_band_candidates(_neardup_corpus(spark, sf), carry_sets=True)
    inter = F.expr("size(array_intersect(hs1, hs2))")
    c12 = inter.cast("double") / F.expr("size(hs1)")
    c21 = inter.cast("double") / F.expr("size(hs2)")
    return (cand
            .select(F.col("d1").alias("doc_id_1"),
                    F.col("d2").alias("doc_id_2"),
                    c12.alias("containment_1_in_2"),
                    c21.alias("containment_2_in_1"))
            .where(F.greatest("containment_1_in_2", "containment_2_in_1")
                   >= _CONTAINMENT_THRESHOLD))


DEDUP_MINHASH_CONTAINMENT_SQL = f"""
WITH corpus AS ({_NEARDUP_CORPUS_SQL}),
sh AS ({_SHINGLES_SQL}),
sig AS (
  SELECT doc_id,
       {_mh_cols}
  FROM sh GROUP BY doc_id
),
bands AS (SELECT doc_id, {_band_cols} FROM sig),
cand AS (SELECT DISTINCT d1, d2 FROM ({_band_joins})),
sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.d1, c.d2, COUNT(*) AS i
  FROM cand c
  JOIN sh s1 ON s1.doc_id = c.d1
  JOIN sh s2 ON s2.doc_id = c.d2 AND s2.h = s1.h
  GROUP BY c.d1, c.d2
)
SELECT i.d1 AS doc_id_1, i.d2 AS doc_id_2,
       CAST(i.i AS DOUBLE) / z1.n AS containment_1_in_2,
       CAST(i.i AS DOUBLE) / z2.n AS containment_2_in_1
FROM inter i
JOIN sz z1 ON z1.doc_id = i.d1
JOIN sz z2 ON z2.doc_id = i.d2
WHERE greatest(CAST(i.i AS DOUBLE) / z1.n, CAST(i.i AS DOUBLE) / z2.n)
      >= {_CONTAINMENT_THRESHOLD}
"""


# -- exact-substring run detection over candidate pairs -------------------
# The near-dup statistics above (Jaccard / containment) measure SET
# overlap; training-data curation also wants the SEQUENCE fact: the
# longest VERBATIM shared token run between two documents (the
# "deduplicating training data" exact-substring criterion — a 50-token
# quote matters even when the documents' overall Jaccard is low).
# Method: diagonal islands over token-3-gram positions.  A common token
# run of length L appears as L-2 consecutive 3-gram matches on one
# diagonal (i - j constant), so: match positions on 3-gram text, group
# by (pair, diagonal), detect consecutive-i islands with the classic
# i - row_number() trick, take the per-pair max island.  Candidates are
# the SAME banded-LSH pairs as dedup_minhash_lsh — never all pairs —
# so the matching join's left side is the candidate pairs' token grams
# only.  All arithmetic is integer; threshold = runs of >= 10 tokens.
_MIN_RUN_TOKENS = 10


def dedup_substring_runs(spark, sf):
    corpus = _neardup_corpus(spark, sf)
    cand = _lsh_band_candidates(corpus, carry_sets=False)

    tg = (corpus
          .selectExpr("doc_id",
                      "filter(split(clean, ' '), x -> x <> '') AS t")
          .where("size(t) >= 3")
          .selectExpr(
              "doc_id",
              "explode(transform(sequence(1, size(t) - 2), i -> "
              "struct(i AS pos, concat_ws(' ', element_at(t, i), "
              "element_at(t, i + 1), element_at(t, i + 2)) AS g))) AS e")
          .select("doc_id", "e.pos", "e.g"))
    m = (tg.selectExpr("doc_id AS d1", "pos AS i", "g")
         .join(F.broadcast(cand), "d1")
         .join(tg.selectExpr("doc_id AS jd", "pos AS j", "g AS g2"),
               (F.col("jd") == F.col("d2")) & (F.col("g2") == F.col("g")))
         .select("d1", "d2", "i", "j"))
    from pyspark.sql import Window
    wd = (Window.partitionBy("d1", "d2", (F.col("i") - F.col("j")))
          .orderBy("i"))
    runs = (m.withColumn("grp", F.col("i") - F.row_number().over(wd))
            .groupBy("d1", "d2", (F.col("i") - F.col("j")).alias("diag"),
                     "grp")
            .agg(F.count(F.lit(1)).alias("run")))
    return (runs.groupBy("d1", "d2")
            .agg((F.max("run") + 2).cast("bigint").alias("max_run_tokens"))
            .where(F.col("max_run_tokens") >= _MIN_RUN_TOKENS)
            .select(F.col("d1").alias("doc_id_1"),
                    F.col("d2").alias("doc_id_2"), "max_run_tokens"))


DEDUP_SUBSTRING_RUNS_SQL = f"""
WITH corpus AS ({_NEARDUP_CORPUS_SQL}),
sh AS ({_SHINGLES_SQL}),
sig AS (
  SELECT doc_id,
       {_mh_cols}
  FROM sh GROUP BY doc_id
),
bands AS (SELECT doc_id, {_band_cols} FROM sig),
cand AS (SELECT DISTINCT d1, d2 FROM ({_band_joins})),
tok AS (SELECT doc_id, list_filter(str_split(clean, ' '), x -> x <> '') AS t
        FROM corpus),
tg AS (SELECT doc_id, i AS pos,
              t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] AS g
       FROM (SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i
             FROM tok WHERE len(t) >= 3)),
m AS (SELECT c.d1, c.d2, a.pos AS i, b.pos AS j
      FROM cand c
      JOIN tg a ON a.doc_id = c.d1
      JOIN tg b ON b.doc_id = c.d2 AND b.g = a.g),
r AS (SELECT d1, d2, i - j AS diag, i,
             i - ROW_NUMBER() OVER (PARTITION BY d1, d2, i - j ORDER BY i)
             AS grp
      FROM m),
isl AS (SELECT d1, d2, diag, grp, COUNT(*) AS run
        FROM r GROUP BY d1, d2, diag, grp)
SELECT d1 AS doc_id_1, d2 AS doc_id_2,
       CAST(MAX(run) + 2 AS BIGINT) AS max_run_tokens
FROM isl GROUP BY d1, d2
HAVING CAST(MAX(run) + 2 AS BIGINT) >= {_MIN_RUN_TOKENS}
"""


# -- SimHash (16-bit) ----------------------------------------------------
_SIMHASH_BITS = 16
_HAMMING_MAX = 3


def dedup_simhash(spark, sf):
    # Weights in ONE pass over the exploded distinct shingle relation:
    # 16 conditional SUMs whose partials combine map-side inside
    # whole-stage codegen.  The previous shuffle-free form folded each
    # doc's shingle array with 16 separate higher-order `aggregate`
    # lambdas (16 array traversals per row) and was 1.6x slower at
    # sf0.1 — here the one exchange (~2M narrow rows) costs less than
    # the repeated lambda evaluation it avoids.
    h = _h_expr("clean", "i")
    # array_distinct BEFORE the explode: the per-doc shingle-set dedup is
    # row-local, so doing it inside the projection removes the (doc_id, h)
    # distinct's full shuffle of the ~2M-row exploded relation — the
    # groupBy below is then the pipeline's only exchange.
    sh = (_neardup_corpus(spark, sf).where("length(clean) >= 5")
          .selectExpr(
              "doc_id",
              "explode(array_distinct("
              f"transform(sequence(1, length(clean) - 4), i -> {h}))) AS h"))
    weights = [
        F.expr(f"sum(CASE WHEN (((h % 65536) >> {j}) & 1) = 1 "
               f"THEN 1 ELSE -1 END)").alias(f"w{j}")
        for j in range(_SIMHASH_BITS)
    ]
    w = sh.groupBy("doc_id").agg(*weights)
    sig_expr = " + ".join(
        f"(CASE WHEN w{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(_SIMHASH_BITS))
    sig = w.selectExpr("doc_id", f"CAST({sig_expr} AS BIGINT) AS sig")
    a = sig.selectExpr("doc_id AS doc_id_1", "sig AS sig1")
    b = sig.selectExpr("doc_id AS doc_id_2", "sig AS sig2")
    pairs = a.join(b, (F.expr("sig1 >> 8") == F.expr("sig2 >> 8"))
                   & (F.col("doc_id_1") < F.col("doc_id_2")))
    return (pairs.withColumn("hamming", F.expr("bit_count(sig1 ^ sig2)"))
            .where(F.col("hamming") <= _HAMMING_MAX)
            .select("doc_id_1", "doc_id_2", F.col("hamming").cast("int").alias("hamming")))


_w_cols = ",\n       ".join(
    f"SUM(CASE WHEN (((h % 65536) >> {j}) & 1) = 1 THEN 1 ELSE -1 END) AS w{j}"
    for j in range(_SIMHASH_BITS))
_sig_expr = " + ".join(
    f"(CASE WHEN w{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(_SIMHASH_BITS))
DEDUP_SIMHASH_SQL = f"""
WITH corpus AS ({_NEARDUP_CORPUS_SQL}),
sh AS ({_SHINGLES_SQL}),
w AS (SELECT doc_id, {_w_cols} FROM sh GROUP BY doc_id),
sig AS (SELECT doc_id, CAST({_sig_expr} AS BIGINT) AS sig FROM w)
SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2,
       CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
FROM sig a JOIN sig b ON (a.sig >> 8) = (b.sig >> 8) AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.sig, b.sig)) <= {_HAMMING_MAX}
"""


# -- ANN: cosine top-k over embeddings -----------------------------------
_N_QUERIES = 5
_TOP_K = 10
# quantize: round(x*1000) as BIGINT -> exact integer dot products
_QUANT_SPARK = "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))"
_QUANT_DUCK = "list_transform(embedding::DOUBLE[], x -> CAST(round(x * 1000) AS BIGINT))"
_DOT_SPARK = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), CAST(0 AS BIGINT), (acc, v) -> acc + v)"


def _quantized(spark, sf):
    e = load_table(spark, sf, "embeddings")
    q = e.selectExpr("vec_id", f"{_QUANT_SPARK} AS qv")
    dot_self = _DOT_SPARK.format(a="qv", b="qv")
    return q.selectExpr("vec_id", "qv", f"{dot_self} AS norm2")


def ann_cosine_topk(spark, sf):
    from pyspark.sql import Window
    qv = _quantized(spark, sf)
    queries = qv.where(F.col("vec_id") < _N_QUERIES) \
        .selectExpr("vec_id AS query_id", "qv AS qq", "norm2 AS qn")
    dot = _DOT_SPARK.format(a="qq", b="qv")
    scored = (F.broadcast(queries).crossJoin(qv)
              .where(F.col("vec_id") != F.col("query_id"))
              .selectExpr("query_id", "vec_id",
                          f"CAST({dot} AS DOUBLE) / sqrt(CAST(qn AS DOUBLE) * CAST(norm2 AS DOUBLE)) AS cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= _TOP_K)
            .select("query_id", "vec_id", "cosine", F.col("rank").cast("int").alias("rank")))


ANN_COSINE_TOPK_SQL = f"""
WITH q AS (SELECT vec_id, {_QUANT_DUCK} AS qv FROM embeddings),
n AS (SELECT vec_id, qv, CAST(list_dot_product(qv::DOUBLE[], qv::DOUBLE[]) AS BIGINT) AS norm2 FROM q),
scored AS (
  SELECT a.vec_id AS query_id, b.vec_id,
         list_dot_product(a.qv::DOUBLE[], b.qv::DOUBLE[]) / sqrt(CAST(a.norm2 AS DOUBLE) * CAST(b.norm2 AS DOUBLE)) AS cosine
  FROM n a, n b
  WHERE a.vec_id < {_N_QUERIES} AND b.vec_id <> a.vec_id
)
SELECT query_id, vec_id, cosine, CAST(rank AS INTEGER) AS rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM scored
) WHERE rank <= {_TOP_K}
"""


# -- ANN scale path: sign-bit LSH buckets --------------------------------
_BUCKET_SPARK = ("(CASE WHEN element_at(embedding, 1) > 0 THEN 8 ELSE 0 END + "
                 "CASE WHEN element_at(embedding, 2) > 0 THEN 4 ELSE 0 END + "
                 "CASE WHEN element_at(embedding, 3) > 0 THEN 2 ELSE 0 END + "
                 "CASE WHEN element_at(embedding, 4) > 0 THEN 1 ELSE 0 END)")
_BUCKET_DUCK = ("(CASE WHEN embedding[1] > 0 THEN 8 ELSE 0 END + "
                "CASE WHEN embedding[2] > 0 THEN 4 ELSE 0 END + "
                "CASE WHEN embedding[3] > 0 THEN 2 ELSE 0 END + "
                "CASE WHEN embedding[4] > 0 THEN 1 ELSE 0 END)")
_TOP_K_LSH = 5


def ann_lsh_bucket_topk(spark, sf):
    from pyspark.sql import Window
    e = load_table(spark, sf, "embeddings")
    qv = e.selectExpr("vec_id", f"{_QUANT_SPARK} AS qv",
                      f"{_BUCKET_SPARK} AS bucket")
    dot_self = _DOT_SPARK.format(a="qv", b="qv")
    qv = qv.selectExpr("vec_id", "qv", "bucket", f"{dot_self} AS norm2")
    queries = qv.where(F.col("vec_id") < _N_QUERIES) \
        .selectExpr("vec_id AS query_id", "qv AS qq", "bucket AS qb", "norm2 AS qn")
    dot = _DOT_SPARK.format(a="qq", b="qv")
    scored = (F.broadcast(queries)
              .join(qv, F.col("qb") == F.col("bucket"))   # bucket-pruned scan
              .where(F.col("vec_id") != F.col("query_id"))
              .selectExpr("query_id", "vec_id",
                          f"CAST({dot} AS DOUBLE) / sqrt(CAST(qn AS DOUBLE) * CAST(norm2 AS DOUBLE)) AS cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= _TOP_K_LSH)
            .select("query_id", "vec_id", "cosine", F.col("rank").cast("int").alias("rank")))


ANN_LSH_BUCKET_TOPK_SQL = f"""
WITH q AS (SELECT vec_id, {_QUANT_DUCK} AS qv, {_BUCKET_DUCK} AS bucket FROM embeddings),
n AS (SELECT vec_id, qv, bucket,
             CAST(list_dot_product(qv::DOUBLE[], qv::DOUBLE[]) AS BIGINT) AS norm2 FROM q),
scored AS (
  SELECT a.vec_id AS query_id, b.vec_id,
         list_dot_product(a.qv::DOUBLE[], b.qv::DOUBLE[]) / sqrt(CAST(a.norm2 AS DOUBLE) * CAST(b.norm2 AS DOUBLE)) AS cosine
  FROM n a JOIN n b ON a.bucket = b.bucket
  WHERE a.vec_id < {_N_QUERIES} AND b.vec_id <> a.vec_id
)
SELECT query_id, vec_id, cosine, CAST(rank AS INTEGER) AS rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM scored
) WHERE rank <= {_TOP_K_LSH}
"""


# -- ANN scale path 2: IVF (inverted-file) coarse quantizer ---------------
# Seed centroids are the vectors with ids [N_QUERIES, N_QUERIES+K) — a
# deterministic stand-in for sampled k-means (at scale the centroids come
# from a k-means job; either way they are a tiny broadcast table).  Every
# vector is assigned to its max-cosine cell with a min_by aggregation:
# after the broadcast nested-loop expansion each vec_id lives in exactly
# one input partition, so map-side partial aggregation collapses the Kx
# inflation back to one row per vector BEFORE the shuffle.  A query
# probes its nprobe nearest cells and scans only those — at 100 TB with
# the corpus written partitionBy(cell), the probe is a partition-pruned
# scan of nprobe/K of the data.
_N_CENTROIDS = 8
_NPROBE = 2


def ann_ivf_topk(spark, sf):
    from pyspark.sql import Window
    qv = _quantized(spark, sf)
    cents = (qv.where((F.col("vec_id") >= _N_QUERIES)
                      & (F.col("vec_id") < _N_QUERIES + _N_CENTROIDS))
             .selectExpr("vec_id AS cent_id", "qv AS cv", "norm2 AS cn"))
    cdot = _DOT_SPARK.format(a="qv", b="cv")
    aff = (qv.crossJoin(F.broadcast(cents))
           .selectExpr("vec_id", "qv", "norm2", "cent_id",
                       f"CAST({cdot} AS DOUBLE) / sqrt(CAST(norm2 AS DOUBLE) * CAST(cn AS DOUBLE)) AS ccos"))
    # argmax cell per vector; (-ccos, cent_id) gives a total order, so the
    # result is deterministic and the aggregation partial-combines.
    cells = (aff.groupBy("vec_id")
             .agg(F.min_by(
                 F.struct(F.col("cent_id").alias("cell"), "qv", "norm2"),
                 F.struct((-F.col("ccos")).alias("nc"),
                          F.col("cent_id").alias("cid"))).alias("m"))
             .select("vec_id", "m.cell", "m.qv", "m.norm2"))
    probes = (aff.where(F.col("vec_id") < _N_QUERIES)
              .withColumn("crank", F.row_number().over(
                  Window.partitionBy("vec_id")
                  .orderBy(F.desc("ccos"), F.asc("cent_id"))))
              .where(F.col("crank") <= _NPROBE)
              .selectExpr("vec_id AS query_id", "qv AS qq", "norm2 AS qn",
                          "cent_id AS probe_cell"))
    dot = _DOT_SPARK.format(a="qq", b="qv")
    scored = (F.broadcast(probes)
              .join(cells, F.col("probe_cell") == F.col("cell"))
              .where(F.col("vec_id") != F.col("query_id"))
              .selectExpr("query_id", "vec_id",
                          f"CAST({dot} AS DOUBLE) / sqrt(CAST(qn AS DOUBLE) * CAST(norm2 AS DOUBLE)) AS cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= _TOP_K_LSH)
            .select("query_id", "vec_id", "cosine",
                    F.col("rank").cast("int").alias("rank")))


ANN_IVF_TOPK_SQL = f"""
WITH q AS (SELECT vec_id, {_QUANT_DUCK} AS qv FROM embeddings),
n AS (SELECT vec_id, qv, CAST(list_dot_product(qv::DOUBLE[], qv::DOUBLE[]) AS BIGINT) AS norm2 FROM q),
cents AS (SELECT vec_id AS cent_id, qv AS cv, norm2 AS cn FROM n
          WHERE vec_id >= {_N_QUERIES} AND vec_id < {_N_QUERIES + _N_CENTROIDS}),
aff AS (
  SELECT n.vec_id, n.qv, n.norm2, c.cent_id,
         list_dot_product(n.qv::DOUBLE[], c.cv::DOUBLE[]) / sqrt(CAST(n.norm2 AS DOUBLE) * CAST(c.cn AS DOUBLE)) AS ccos
  FROM n, cents c
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                               ORDER BY ccos DESC, cent_id ASC) AS crank
  FROM aff
),
cells AS (SELECT vec_id, qv, norm2, cent_id AS cell FROM ranked WHERE crank = 1),
probes AS (SELECT vec_id AS query_id, qv AS qq, norm2 AS qn, cent_id AS probe_cell
           FROM ranked WHERE vec_id < {_N_QUERIES} AND crank <= {_NPROBE}),
scored AS (
  SELECT p.query_id, b.vec_id,
         list_dot_product(p.qq::DOUBLE[], b.qv::DOUBLE[]) / sqrt(CAST(p.qn AS DOUBLE) * CAST(b.norm2 AS DOUBLE)) AS cosine
  FROM probes p JOIN cells b ON p.probe_cell = b.cell
  WHERE b.vec_id <> p.query_id
)
SELECT query_id, vec_id, cosine, CAST(rank AS INTEGER) AS rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM scored
) WHERE rank <= {_TOP_K_LSH}
"""


# -- ANN compression path: product quantization + ADC ---------------------
# Same arithmetic as operators/pq.PqIndex (first-Ks codebooks, integer-L2
# encode, ADC lookup-sum) in the corpus' self-contained join form: the
# output is ALL-INTEGER (approx_dist sums exact integer L2s), so the
# oracle match is exact with no float tolerance at all.
_PQ_M = 8          # subspaces (64-dim embeddings -> 8 dims each)
_PQ_KS = 16        # codes per subspace


def ann_pq_topk(spark, sf):
    """PQ-compressed ANN: encode the corpus as 8 small ints per vector
    (32x smaller than the float embedding), score every (query, vector)
    pair by ADC table lookups, top-10 by approximate distance.  The
    compression tier of the ANN ladder (brute -> LSH buckets -> IVF
    cells -> PQ codes); operators/pq.PqIndex is the persisted
    build-once form with exact rerank and IVF-PQ cell pruning."""
    from pyspark.sql import Window
    e = load_table(spark, sf, "embeddings")
    qv = e.selectExpr("vec_id", f"{_QUANT_SPARK} AS qv")
    sub = (qv.selectExpr("vec_id", f"explode(sequence(0, {_PQ_M - 1})) AS m",
                         "qv")
           .selectExpr("vec_id", "m",
                       f"slice(qv, m * (size(qv) div {_PQ_M}) + 1, "
                       f"size(qv) div {_PQ_M}) AS sv"))
    w_cb = Window.partitionBy("m").orderBy("vec_id")
    cb = (sub.where(F.col("vec_id") < _PQ_KS)
          .withColumn("code", F.row_number().over(w_cb) - 1)
          .selectExpr("m", "code", "sv AS cb_sv"))
    dot = _DOT_SPARK
    l2 = (f"{dot.format(a='sv', b='sv')} - 2 * {dot.format(a='sv', b='cb_sv')}"
          f" + {dot.format(a='cb_sv', b='cb_sv')}")
    w_enc = Window.partitionBy("vec_id", "m").orderBy("dist", "code")
    dists = (sub.join(F.broadcast(cb), "m")
             .selectExpr("vec_id", "m", "code", f"{l2} AS dist"))
    enc = (dists.withColumn("rn", F.row_number().over(w_enc))
           .where("rn = 1").select("vec_id", "m", "code"))
    lut = (dists.where(F.col("vec_id") < _N_QUERIES)
           .selectExpr("vec_id AS query_id", "m", "code", "dist"))
    scored = (enc.join(F.broadcast(lut), ["m", "code"])
              .where("vec_id <> query_id")
              .groupBy("query_id", "vec_id")
              .agg(F.sum("dist").alias("approx_dist")))
    w = Window.partitionBy("query_id").orderBy(
        F.asc("approx_dist"), F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= _TOP_K)
            .select("query_id", "vec_id", "approx_dist",
                    F.col("rank").cast("int").alias("rank")))


ANN_PQ_TOPK_SQL = f"""
WITH q AS (SELECT vec_id, {_QUANT_DUCK} AS qv FROM embeddings),
sub AS (SELECT vec_id, m, qv[m*(len(qv)//{_PQ_M})+1 : (m+1)*(len(qv)//{_PQ_M})] AS sv
        FROM q, range({_PQ_M}) t(m)),
cb AS (SELECT m, ROW_NUMBER() OVER (PARTITION BY m ORDER BY vec_id) - 1 AS code,
              sv AS cb_sv
       FROM sub WHERE vec_id < {_PQ_KS}),
dists AS (SELECT s.vec_id, s.m, c.code,
       CAST(list_dot_product(s.sv::DOUBLE[], s.sv::DOUBLE[])
          - 2 * list_dot_product(s.sv::DOUBLE[], c.cb_sv::DOUBLE[])
          + list_dot_product(c.cb_sv::DOUBLE[], c.cb_sv::DOUBLE[]) AS BIGINT) AS dist
       FROM sub s JOIN cb c ON s.m = c.m),
enc AS (SELECT vec_id, m, code FROM (
         SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY dist, code) rn
         FROM dists) WHERE rn = 1),
lut AS (SELECT vec_id AS query_id, m, code, dist FROM dists WHERE vec_id < {_N_QUERIES}),
scored AS (SELECT l.query_id, e.vec_id,
                  CAST(SUM(l.dist) AS BIGINT) AS approx_dist
           FROM enc e JOIN lut l ON e.m = l.m AND e.code = l.code
           WHERE e.vec_id <> l.query_id GROUP BY 1, 2)
SELECT query_id, vec_id, approx_dist, CAST(rank AS INTEGER) AS rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY approx_dist ASC, vec_id ASC) AS rank
  FROM scored) WHERE rank <= {_TOP_K}
"""


# -- IVF-PQ + exact rerank: the composed ANN scale path --------------------
# operators/pq.PqIndex.probe(rerank_factor=R, cell_filter=...) over an
# IvfIndex cell assignment, in the corpus' self-contained join form:
# candidates come ONLY from the query's nprobe nearest cells (IVF
# pruning), are scored by PQ-ADC lookups, and the top R*k shortlist is
# re-scored with EXACT integer L2 — so `dist` is an exact integer and
# the oracle hash match needs no float tolerance.
_PQ_RERANK = 3     # rerank_factor: exact-rescore the top R*k ADC candidates


def ann_ivfpq_rerank_topk(spark, sf):
    """IVF cell pruning -> PQ-ADC shortlist -> exact integer-L2 rerank.

    Scale shape (mirrors the PqIndex/IvfIndex operators, which persist
    these stages): the candidate join touches only vectors in probed
    cells (partition-pruned reads in the operator form), ADC is lookup
    arithmetic over 8-int codes, and the exact math runs on R*k rows per
    query, never the corpus."""
    from pyspark.sql import Window
    qv = _quantized(spark, sf)
    # IVF: argmax-cosine cell per vector; top-nprobe probe cells per query
    cents = (qv.where((F.col("vec_id") >= _N_QUERIES)
                      & (F.col("vec_id") < _N_QUERIES + _N_CENTROIDS))
             .selectExpr("vec_id AS cent_id", "qv AS cv", "norm2 AS cn"))
    cdot = _DOT_SPARK.format(a="qv", b="cv")
    aff = (qv.crossJoin(F.broadcast(cents))
           .selectExpr("vec_id", "cent_id",
                       f"CAST({cdot} AS DOUBLE) / sqrt(CAST(norm2 AS DOUBLE)"
                       " * CAST(cn AS DOUBLE)) AS ccos"))
    w_cell = Window.partitionBy("vec_id").orderBy(F.desc("ccos"),
                                                  F.asc("cent_id"))
    ranked = aff.withColumn("crank", F.row_number().over(w_cell))
    cells = ranked.where("crank = 1").selectExpr("vec_id", "cent_id AS cell")
    probes = (ranked.where((F.col("vec_id") < _N_QUERIES)
                           & (F.col("crank") <= _NPROBE))
              .selectExpr("vec_id AS query_id", "cent_id AS probe_cell"))
    # IVF pruning: candidates live in a probed cell
    cand = (F.broadcast(probes)
            .join(cells, F.col("probe_cell") == F.col("cell"))
            .where(F.col("vec_id") != F.col("query_id"))
            .select("query_id", "vec_id"))
    # PQ: first-Ks codebooks, integer-L2 encode, per-query LUT
    sub = (qv.selectExpr("vec_id", f"explode(sequence(0, {_PQ_M - 1})) AS m",
                         "qv")
           .selectExpr("vec_id", "m",
                       f"slice(qv, m * (size(qv) div {_PQ_M}) + 1, "
                       f"size(qv) div {_PQ_M}) AS sv"))
    w_cb = Window.partitionBy("m").orderBy("vec_id")
    cb = (sub.where(F.col("vec_id") < _PQ_KS)
          .withColumn("code", F.row_number().over(w_cb) - 1)
          .selectExpr("m", "code", "sv AS cb_sv"))
    l2 = (f"{_DOT_SPARK.format(a='sv', b='sv')}"
          f" - 2 * {_DOT_SPARK.format(a='sv', b='cb_sv')}"
          f" + {_DOT_SPARK.format(a='cb_sv', b='cb_sv')}")
    dists = (sub.join(F.broadcast(cb), "m")
             .selectExpr("vec_id", "m", "code", f"{l2} AS dist"))
    w_enc = Window.partitionBy("vec_id", "m").orderBy("dist", "code")
    enc = (dists.withColumn("rn", F.row_number().over(w_enc))
           .where("rn = 1").select("vec_id", "m", "code"))
    lut = (dists.where(F.col("vec_id") < _N_QUERIES)
           .selectExpr("vec_id AS query_id", "m", "code", "dist"))
    # ADC over the PRUNED candidate set only
    adc = (enc.join(cand, "vec_id")
           .join(F.broadcast(lut), ["query_id", "m", "code"])
           .groupBy("query_id", "vec_id")
           .agg(F.sum("dist").alias("approx_dist")))
    w_short = Window.partitionBy("query_id").orderBy(
        F.asc("approx_dist"), F.asc("vec_id"))
    shortlist = (adc.withColumn("srank", F.row_number().over(w_short))
                 .where(F.col("srank") <= _TOP_K * _PQ_RERANK)
                 .select("query_id", "vec_id"))
    # exact integer-L2 rerank of the shortlist against true vectors
    full = qv.selectExpr("vec_id", "qv AS fv", "norm2 AS fn")
    ql = (qv.where(F.col("vec_id") < _N_QUERIES)
          .selectExpr("vec_id AS query_id", "qv AS qq", "norm2 AS qn"))
    xdot = _DOT_SPARK.format(a="qq", b="fv")
    rer = (shortlist.join(full, "vec_id").join(F.broadcast(ql), "query_id")
           .selectExpr("query_id", "vec_id",
                       f"qn - 2 * {xdot} + fn AS dist"))
    w_final = Window.partitionBy("query_id").orderBy(F.asc("dist"),
                                                     F.asc("vec_id"))
    return (rer.withColumn("rank", F.row_number().over(w_final))
            .where(F.col("rank") <= _TOP_K)
            .select("query_id", "vec_id", "dist",
                    F.col("rank").cast("int").alias("rank")))


ANN_IVFPQ_RERANK_SQL = f"""
WITH q AS (SELECT vec_id, {_QUANT_DUCK} AS qv FROM embeddings),
n AS (SELECT vec_id, qv, CAST(list_dot_product(qv::DOUBLE[], qv::DOUBLE[]) AS BIGINT) AS norm2 FROM q),
cents AS (SELECT vec_id AS cent_id, qv AS cv, norm2 AS cn FROM n
          WHERE vec_id >= {_N_QUERIES} AND vec_id < {_N_QUERIES + _N_CENTROIDS}),
aff AS (SELECT n.vec_id, c.cent_id,
               list_dot_product(n.qv::DOUBLE[], c.cv::DOUBLE[]) / sqrt(CAST(n.norm2 AS DOUBLE) * CAST(c.cn AS DOUBLE)) AS ccos
        FROM n, cents c),
ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id ASC) AS crank FROM aff),
cells AS (SELECT vec_id, cent_id AS cell FROM ranked WHERE crank = 1),
probes AS (SELECT vec_id AS query_id, cent_id AS probe_cell FROM ranked
           WHERE vec_id < {_N_QUERIES} AND crank <= {_NPROBE}),
cand AS (SELECT p.query_id, c.vec_id FROM probes p JOIN cells c ON p.probe_cell = c.cell
         WHERE c.vec_id <> p.query_id),
sub AS (SELECT vec_id, m, qv[m*(len(qv)//{_PQ_M})+1 : (m+1)*(len(qv)//{_PQ_M})] AS sv
        FROM q, range({_PQ_M}) t(m)),
cb AS (SELECT m, ROW_NUMBER() OVER (PARTITION BY m ORDER BY vec_id) - 1 AS code, sv AS cb_sv
       FROM sub WHERE vec_id < {_PQ_KS}),
dists AS (SELECT s.vec_id, s.m, c.code,
       CAST(list_dot_product(s.sv::DOUBLE[], s.sv::DOUBLE[])
          - 2 * list_dot_product(s.sv::DOUBLE[], c.cb_sv::DOUBLE[])
          + list_dot_product(c.cb_sv::DOUBLE[], c.cb_sv::DOUBLE[]) AS BIGINT) AS dist
       FROM sub s JOIN cb c ON s.m = c.m),
enc AS (SELECT vec_id, m, code FROM (
         SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY dist, code) rn
         FROM dists) WHERE rn = 1),
lut AS (SELECT vec_id AS query_id, m, code, dist FROM dists WHERE vec_id < {_N_QUERIES}),
adc AS (SELECT ca.query_id, e.vec_id, CAST(SUM(l.dist) AS BIGINT) AS approx_dist
        FROM enc e JOIN cand ca ON e.vec_id = ca.vec_id
        JOIN lut l ON l.query_id = ca.query_id AND l.m = e.m AND l.code = e.code
        GROUP BY 1, 2),
shortlist AS (SELECT query_id, vec_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY approx_dist ASC, vec_id ASC) AS srank
    FROM adc) WHERE srank <= {_TOP_K * _PQ_RERANK}),
rer AS (SELECT s.query_id, s.vec_id,
               qn.norm2 - 2 * CAST(list_dot_product(qn.qv::DOUBLE[], fn.qv::DOUBLE[]) AS BIGINT) + fn.norm2 AS dist
        FROM shortlist s JOIN n fn ON s.vec_id = fn.vec_id
        JOIN n qn ON s.query_id = qn.vec_id)
SELECT query_id, vec_id, dist, CAST(rank AS INTEGER) AS rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dist ASC, vec_id ASC) AS rank
  FROM rer) WHERE rank <= {_TOP_K}
"""


# -- embedding-cosine near-duplicate detection ---------------------------
# the "semantic dedup" variant: two vectors are near-dups if cosine >=
# threshold; candidates restricted to the same sign-bit bucket (scale
# path: per-bucket quadratic, never global quadratic).  The testdata
# embeddings are random (max pairwise cosine ~0.51), so both engines
# deterministically inject a perturbed copy of every 20th vector
# (element 1 shifted by +0.05) as the near-dup population.
_COS_DUP_THRESHOLD = 0.98

_PERTURB_SPARK = ("concat(array(CAST(element_at(embedding, 1) AS DOUBLE) + 0.05D), "
                  "transform(slice(embedding, 2, size(embedding) - 1), x -> CAST(x AS DOUBLE)))")
_PERTURB_DUCK = ("list_concat([embedding[1]::DOUBLE + 0.05], "
                 "(embedding::DOUBLE[])[2:])")


def _cos_corpus(spark, sf):
    e = load_table(spark, sf, "embeddings")
    base = e.selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding")
    shifted = (e.where(F.col("vec_id") % 20 == 0)
               .selectExpr(f"vec_id + {_NEARDUP_OFFSET} AS vec_id",
                           f"{_PERTURB_SPARK} AS embedding"))
    return base.unionByName(shifted)


_COS_CORPUS_SQL = f"""
SELECT vec_id, embedding::DOUBLE[] AS embedding FROM embeddings
UNION ALL
SELECT vec_id + {_NEARDUP_OFFSET} AS vec_id, {_PERTURB_DUCK} AS embedding
FROM embeddings WHERE vec_id % 20 = 0
"""


def dedup_embedding_cosine(spark, sf):
    qv = (_cos_corpus(spark, sf)
          .selectExpr("vec_id", f"{_QUANT_SPARK} AS qv", f"{_BUCKET_SPARK} AS bucket"))
    dot_self = _DOT_SPARK.format(a="qv", b="qv")
    qv = qv.selectExpr("vec_id", "qv", "bucket", f"{dot_self} AS norm2").cache()
    a = qv.selectExpr("vec_id AS id1", "qv AS qa", "bucket AS ba", "norm2 AS na")
    b = qv.selectExpr("vec_id AS id2", "qv AS qb", "bucket AS bb", "norm2 AS nb")
    dot = _DOT_SPARK.format(a="qa", b="qb")
    pairs = (a.join(b, (F.col("ba") == F.col("bb")) & (F.col("id1") < F.col("id2")))
             .selectExpr("id1", "id2",
                         f"CAST({dot} AS DOUBLE) / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS cosine"))
    return (pairs.where(F.col("cosine") >= _COS_DUP_THRESHOLD)
            .select(F.col("id1").alias("vec_id_1"), F.col("id2").alias("vec_id_2"),
                    "cosine"))


DEDUP_EMBEDDING_COSINE_SQL = f"""
WITH embeddings_nd AS ({_COS_CORPUS_SQL}),
q AS (SELECT vec_id, {_QUANT_DUCK} AS qv, {_BUCKET_DUCK} AS bucket FROM embeddings_nd),
n AS (SELECT vec_id, qv, bucket,
             CAST(list_dot_product(qv::DOUBLE[], qv::DOUBLE[]) AS BIGINT) AS norm2 FROM q)
SELECT a.vec_id AS vec_id_1, b.vec_id AS vec_id_2,
       list_dot_product(a.qv::DOUBLE[], b.qv::DOUBLE[]) / sqrt(CAST(a.norm2 AS DOUBLE) * CAST(b.norm2 AS DOUBLE)) AS cosine
FROM n a JOIN n b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE list_dot_product(a.qv::DOUBLE[], b.qv::DOUBLE[]) / sqrt(CAST(a.norm2 AS DOUBLE) * CAST(b.norm2 AS DOUBLE)) >= {_COS_DUP_THRESHOLD}
"""


# -- per-label centroids (embedding pooling / cluster summary) -----------
# The mean-embedding-per-group primitive behind IVF training, topic
# summaries, and class prototypes.  Determinism: quantized integer
# components sum exactly in any order (the float mean is one IEEE
# division at the end).  Plan: posexplode is a zero-shuffle projection;
# the single shuffle is groupBy(label, dim) — (10 labels x 64 dims)
# cells, each a pure map-side-combined integer sum, so reducer input is
# ~cells x map-tasks rows regardless of corpus size.
def embedding_label_centroids(spark, sf):
    e = load_table(spark, sf, "embeddings")
    q = (e.selectExpr("label", f"{_QUANT_SPARK} AS qv")
         .select("label", F.posexplode("qv").alias("dim", "q")))
    return (q.groupBy("label", "dim")
            .agg(F.count(F.lit(1)).alias("n_vecs"),
                 F.sum("q").alias("sum_q"))
            .selectExpr("label", "CAST(dim AS INTEGER) AS dim",
                        "n_vecs", "CAST(sum_q AS BIGINT) AS sum_q",
                        "CAST(sum_q AS DOUBLE) / n_vecs / 1000.0"
                        " AS centroid"))


EMBEDDING_LABEL_CENTROIDS_SQL = f"""
WITH q AS (SELECT label, {_QUANT_DUCK} AS qv FROM embeddings),
x AS (SELECT label,
             unnest(range(0, len(qv))) AS dim,
             unnest(qv) AS qval
      FROM q)
SELECT label, CAST(dim AS INTEGER) AS dim, COUNT(*) AS n_vecs,
       CAST(SUM(qval) AS BIGINT) AS sum_q,
       CAST(SUM(qval) AS DOUBLE) / COUNT(*) / 1000.0 AS centroid
FROM x GROUP BY 1, 2
"""


# -- nearest-centroid pseudo-labeling ------------------------------------
# Auto-labeling: assign every vector to its nearest per-label centroid
# (the weak-supervision / dataset-bootstrapping primitive).  Exactness:
# with centroid = sum_q/n, cosine(v, c) reduces to
#   dot_int / (sqrt(vnorm2_int) * sqrt(cnorm2_int))
# because the 1/n factors cancel — so BOTH the dot product and both
# norms are exact BIGINT sums (q ~ 300, sums bounded ~3e10, no
# overflow), and the only float ops are one sqrt+division per
# (vector, label).  Plan: the centroid side is labels x dims rows —
# tiny, broadcast; one shuffle for the (vec_id, label) partial-combined
# re-aggregation; argmax via rank-1 window (WindowGroupLimit).  At
# 100 TB the centroid table would be collected into a literal array and
# the K scores computed per-row in one codegen stage (zero shuffle);
# the relational form here keeps the oracle 1:1.
def embedding_pseudo_label(spark, sf):
    from pyspark.sql import Window
    e = load_table(spark, sf, "embeddings")
    q = (e.selectExpr("vec_id", "label", f"{_QUANT_SPARK} AS qv")
         .select("vec_id", "label", F.posexplode("qv").alias("dim", "q")))
    cent = (q.groupBy(F.col("label").alias("c_label"), "dim")
            .agg(F.sum("q").alias("sq")))
    cnorm = cent.groupBy("c_label").agg(F.sum(F.expr("sq * sq")).alias("cnorm2"))
    scored = (q.join(F.broadcast(cent), "dim")
              .groupBy("vec_id", "label", "c_label")
              .agg(F.sum(F.expr("q * sq")).alias("dot"),
                   F.sum(F.expr("q * q")).alias("vnorm2"))
              .join(F.broadcast(cnorm), "c_label")
              .selectExpr("vec_id", "label", "c_label",
                          "CAST(dot AS DOUBLE) / "
                          "(sqrt(CAST(vnorm2 AS DOUBLE)) * "
                          "sqrt(CAST(cnorm2 AS DOUBLE))) AS score"))
    w = Window.partitionBy("vec_id").orderBy(F.desc("score"), F.asc("c_label"))
    return (scored.withColumn("rn", F.row_number().over(w))
            .where("rn = 1")
            .selectExpr("vec_id", "label",
                        "CAST(c_label AS INT) AS pred_label", "score",
                        "label = c_label AS correct"))


EMBEDDING_PSEUDO_LABEL_SQL = f"""
WITH qv AS (SELECT vec_id, label, {_QUANT_DUCK} AS qv FROM embeddings),
q AS (SELECT vec_id, label,
             unnest(range(0, len(qv))) AS dim, unnest(qv) AS q
      FROM qv),
cent AS (SELECT label AS c_label, dim, CAST(SUM(q) AS BIGINT) AS sq
         FROM q GROUP BY 1, 2),
cn AS (SELECT c_label, CAST(SUM(sq * sq) AS BIGINT) AS cnorm2
       FROM cent GROUP BY 1),
scored AS (
  SELECT q.vec_id, q.label, cent.c_label,
         CAST(SUM(q.q * cent.sq) AS BIGINT) AS dot,
         CAST(SUM(q.q * q.q) AS BIGINT) AS vnorm2
  FROM q JOIN cent USING (dim)
  GROUP BY 1, 2, 3),
ranked AS (
  SELECT vec_id, label, c_label,
         CAST(dot AS DOUBLE) / (sqrt(CAST(vnorm2 AS DOUBLE)) *
                                sqrt(CAST(cnorm2 AS DOUBLE))) AS score,
         ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY CAST(dot AS DOUBLE) /
                              (sqrt(CAST(vnorm2 AS DOUBLE)) *
                               sqrt(CAST(cnorm2 AS DOUBLE))) DESC,
                              c_label ASC) AS rn
  FROM scored JOIN cn USING (c_label))
SELECT vec_id, label, CAST(c_label AS INTEGER) AS pred_label, score,
       label = c_label AS correct
FROM ranked WHERE rn = 1
"""


# -- near-dup clustering: pairs -> components -> representatives ---------
# The step after pair detection that an actual dedup pipeline needs:
# near-duplication is transitive (A~B, B~C => one cluster), so the
# LSH candidate pairs are grouped into connected components and exactly
# one representative (the min doc_id) survives per cluster.  Spark side
# runs operators/graph.py's alternating large-star/small-star — O(log n)
# rounds regardless of chain length, each round one co-partitioned
# groupBy+join shuffle of the (shrinking) edge list; the component table
# is a fraction of the corpus, so the assignment join back to the full
# corpus is left to AQE (broadcast at test SF, sort-merge at 100 TB).
# The oracle is the same closure as a DuckDB recursive CTE — exact,
# hash-matchable parity for an iterative, "non-SQL" algorithm.
def dedup_cluster_assign(spark, sf):
    from ..operators.graph import connected_components
    pairs = dedup_minhash_lsh(spark, sf).select("doc_id_1", "doc_id_2")
    comp = connected_components(pairs, src="doc_id_1", dst="doc_id_2")
    corpus = _neardup_corpus(spark, sf).select("doc_id")
    assigned = (corpus.join(comp, corpus.doc_id == comp.node, "left")
                .selectExpr("doc_id",
                            "coalesce(component, doc_id) AS cluster_id"))
    sizes = assigned.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("int").alias("cluster_size"))
    return (assigned.join(sizes, "cluster_id")
            .selectExpr("doc_id", "cluster_id", "cluster_size",
                        "doc_id = cluster_id AS is_representative"))


DEDUP_CLUSTER_ASSIGN_SQL = f"""
WITH RECURSIVE pairs AS (
  SELECT doc_id_1 AS a, doc_id_2 AS b FROM ({DEDUP_MINHASH_LSH_SQL})
),
corpus2 AS ({_NEARDUP_CORPUS_SQL}),
sym AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
reach AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.a, s.b FROM reach r JOIN sym s ON s.a = r.b
),
comp AS (SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id
         FROM reach GROUP BY a),
assigned AS (
  SELECT c.doc_id, COALESCE(k.cluster_id, c.doc_id) AS cluster_id
  FROM corpus2 c LEFT JOIN comp k USING (doc_id)),
sz AS (SELECT cluster_id, CAST(COUNT(*) AS INTEGER) AS cluster_size
       FROM assigned GROUP BY 1)
SELECT a.doc_id, a.cluster_id, sz.cluster_size,
       a.doc_id = a.cluster_id AS is_representative
FROM assigned a JOIN sz USING (cluster_id)
"""


# -- leakage-safe train/val/test split (cluster-aware) --------------------
# Splitting by hashing DOC ids leaks: two near-duplicate documents land
# in different splits and the eval set contains (a shifted copy of) the
# training data.  The decontamination-by-construction split hashes the
# dedup CLUSTER id instead, so every near-dup cluster lands wholly in
# one split.  The hash is explicit LCG arithmetic (no engine-native
# hash): h = ((cluster_id mod 2^31) * 1103515245 + 12345) mod 2^31,
# split by h mod 10 -> 8/1/1.  The id is reduced mod 2^31 BEFORE the
# multiply so the product never exceeds BIGINT — without it, ids above
# ~8.4e9 overflow, which Spark (ansi off) silently wraps negative while
# DuckDB errors, breaking both the 8/1/1 split and the cross-engine
# determinism claim.  Composes the connected-components assignment
# (same recursive-CTE oracle); the split projection is map-only on top.
def corpus_leakage_safe_split(spark, sf):
    assigned = dedup_cluster_assign(spark, sf)
    h = ("(((cluster_id % 2147483648) * 1103515245 + 12345)"
         " % 2147483648) % 10")
    return assigned.selectExpr(
        "doc_id", "cluster_id", "cluster_size",
        f"CASE WHEN {h} < 8 THEN 'train' WHEN {h} = 8 THEN 'val' "
        "ELSE 'test' END AS split")


CORPUS_LEAKAGE_SAFE_SPLIT_SQL = f"""
WITH assigned_full AS ({DEDUP_CLUSTER_ASSIGN_SQL}),
h AS (SELECT *,
             (((cluster_id % 2147483648) * 1103515245 + 12345)
              % 2147483648) % 10 AS hv
      FROM assigned_full)
SELECT doc_id, cluster_id, cluster_size,
       CASE WHEN hv < 8 THEN 'train'
            WHEN hv = 8 THEN 'val'
            ELSE 'test' END AS split
FROM h
"""


# -- survivorship: the canonical document per near-dup cluster ------------
# The pipeline step BETWEEN clustering and training: every near-dup
# cluster keeps exactly one canonical document (the longest — shifted
# copies are strict-substring truncations, so "longest wins" recovers
# the original; ties break on doc_id as part of the definition) and
# every member maps to it, so downstream joins can rewrite references
# instead of just dropping rows.  Composes the CC assignment under its
# recursive-CTE oracle; the selection itself is ONE window (FIRST_VALUE
# over a total order) on the cluster exchange — no join beyond the
# length lookup, no second pass.
def corpus_dedup_canonical(spark, sf):
    from pyspark.sql import Window
    assigned = dedup_cluster_assign(spark, sf).select(
        "doc_id", "cluster_id", "cluster_size")
    c = _neardup_corpus(spark, sf).selectExpr(
        "doc_id", "length(clean) AS n_chars")
    j = assigned.join(c, "doc_id")
    w = (Window.partitionBy("cluster_id")
         .orderBy(F.desc("n_chars"), F.asc("doc_id"))
         .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
    return (j.withColumn("canonical_doc_id", F.first("doc_id").over(w))
            .selectExpr("doc_id", "cluster_id", "cluster_size",
                        "CAST(n_chars AS BIGINT) AS n_chars",
                        "canonical_doc_id",
                        "doc_id = canonical_doc_id AS is_canonical"))


CORPUS_DEDUP_CANONICAL_SQL = f"""
WITH assigned_full AS ({DEDUP_CLUSTER_ASSIGN_SQL}),
c2 AS ({_NEARDUP_CORPUS_SQL})
SELECT a.doc_id, a.cluster_id, a.cluster_size,
       CAST(length(c2.clean) AS BIGINT) AS n_chars,
       FIRST_VALUE(a.doc_id) OVER (
         PARTITION BY a.cluster_id
         ORDER BY length(c2.clean) DESC, a.doc_id ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         AS canonical_doc_id,
       a.doc_id = FIRST_VALUE(a.doc_id) OVER (
         PARTITION BY a.cluster_id
         ORDER BY length(c2.clean) DESC, a.doc_id ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         AS is_canonical
FROM assigned_full a JOIN c2 ON c2.doc_id = a.doc_id
"""


# -- incremental dedup: new batch filtered against the existing corpus ---
# The ingestion-time shape of near-dup dedup (what operators/lsh.LshIndex
# does operationally, here as a pure oracle-checked query): a NEW batch
# of documents is admitted only if no member is a near-duplicate of the
# EXISTING corpus.  Candidates come from minhash band collisions between
# batch and base signatures — cost O(batch + collisions), never
# O(batch x base): the base side is band-bucketed exactly like an index
# probe.  The synthetic batch has 25 shifted near-dups (must drop) and
# 25 reversed novel docs (must keep).
def _incdedup_base(spark, sf):
    d = load_table(spark, sf, "documents")
    return d.selectExpr("doc_id", f"{_CLEAN_SPARK} AS clean")


def _incdedup_batch(spark, sf):
    d = load_table(spark, sf, "documents")
    shifted = (d.where(F.col("doc_id") % 20 == 0)
               .selectExpr(f"doc_id + {_NEARDUP_OFFSET} AS doc_id",
                           f"substr({_CLEAN_SPARK}, 4) AS clean"))
    novel = (d.where(F.col("doc_id") % 20 == 10)
             .selectExpr(f"doc_id + {2 * _NEARDUP_OFFSET} AS doc_id",
                         f"reverse({_CLEAN_SPARK}) AS clean"))
    return shifted.unionByName(novel)


def _band_sig(corpus: DataFrame) -> DataFrame:
    docs = _shingle_sets(corpus)
    mins = [
        F.expr(f"array_min(transform(hs, h -> ({a} * h + {b}) % {_MINHASH_P}))").alias(f"mh{k}")
        for k, (a, b) in enumerate(_MINHASH_PERMS)
    ]
    sig = docs.select("doc_id", "hs", *mins)
    bands = [
        F.concat_ws("-", *[F.col(f"mh{i}").cast("string") for i in idxs]).alias(f"band{bi}")
        for bi, idxs in enumerate(_BANDS)
    ]
    return sig.select("doc_id", "hs", *bands)


def dedup_incremental_filter(spark, sf):
    base = _band_sig(_incdedup_base(spark, sf)).cache()
    batch = _band_sig(_incdedup_batch(spark, sf)).cache()
    cands = None
    for bi in range(len(_BANDS)):
        a = batch.selectExpr("doc_id AS d1", "hs AS hs1", f"band{bi} AS bk")
        b = base.selectExpr("doc_id AS d2", "hs AS hs2", f"band{bi} AS bk2")
        c = (a.join(b, F.col("bk") == F.col("bk2"))
             .select("d1", "d2", "hs1", "hs2"))
        cands = c if cands is None else cands.unionByName(c)
    jac = (F.expr("size(array_intersect(hs1, hs2))").cast("double")
           / F.expr("size(hs1) + size(hs2) - size(array_intersect(hs1, hs2))"))
    matches = (cands.dropDuplicates(["d1", "d2"])
               .withColumn("jaccard", jac)
               .where(F.col("jaccard") >= _JACCARD_THRESHOLD)
               .groupBy("d1")
               .agg(F.count(F.lit(1)).cast("int").alias("n_base_matches"),
                    F.max("jaccard").alias("max_jaccard")))
    return (batch.select("doc_id")
            .join(matches, batch.doc_id == matches.d1, "left")
            .selectExpr("doc_id",
                        "coalesce(n_base_matches, 0) AS n_base_matches",
                        "max_jaccard",
                        "n_base_matches IS NULL AS keep"))


_INCDEDUP_BATCH_SQL = f"""
SELECT doc_id + {_NEARDUP_OFFSET} AS doc_id, substr({_CLEAN_DUCK}, 4) AS clean
FROM documents WHERE doc_id % 20 = 0
UNION ALL
SELECT doc_id + {2 * _NEARDUP_OFFSET} AS doc_id, reverse({_CLEAN_DUCK}) AS clean
FROM documents WHERE doc_id % 20 = 10
"""
_cross_band_joins = "\nUNION ALL\n".join(
    f"SELECT a.doc_id AS d1, b.doc_id AS d2 FROM bands a "
    f"JOIN bands b ON a.band{bi} = b.band{bi} "
    f"AND a.doc_id >= {_NEARDUP_OFFSET} AND b.doc_id < {_NEARDUP_OFFSET}"
    for bi in range(len(_BANDS)))
DEDUP_INCREMENTAL_SQL = f"""
WITH corpus AS (
  SELECT doc_id, {_CLEAN_DUCK} AS clean FROM documents
  UNION ALL
  {_INCDEDUP_BATCH_SQL}
),
sh AS ({_SHINGLES_SQL}),
sig AS (SELECT doc_id, {_mh_cols} FROM sh GROUP BY doc_id),
bands AS (SELECT doc_id, {_band_cols} FROM sig),
cand AS (SELECT DISTINCT d1, d2 FROM ({_cross_band_joins})),
m AS (
  SELECT d1, CAST(COUNT(*) AS INTEGER) AS n_base_matches,
         MAX(j) AS max_jaccard
  FROM (SELECT doc_id_1 AS d1, jaccard AS j
        FROM (WITH sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
              inter AS (
                SELECT c.d1, c.d2, COUNT(*) AS i
                FROM cand c
                JOIN sh s1 ON s1.doc_id = c.d1
                JOIN sh s2 ON s2.doc_id = c.d2 AND s2.h = s1.h
                GROUP BY c.d1, c.d2)
              SELECT i.d1 AS doc_id_1, i.d2 AS doc_id_2,
                     CAST(i.i AS DOUBLE) / (z1.n + z2.n - i.i) AS jaccard
              FROM inter i
              JOIN sz z1 ON z1.doc_id = i.d1
              JOIN sz z2 ON z2.doc_id = i.d2
              WHERE CAST(i.i AS DOUBLE) / (z1.n + z2.n - i.i)
                    >= {_JACCARD_THRESHOLD}))
  GROUP BY d1
),
batch AS ({_INCDEDUP_BATCH_SQL})
SELECT b.doc_id, COALESCE(m.n_base_matches, 0) AS n_base_matches,
       m.max_jaccard, m.n_base_matches IS NULL AS keep
FROM batch b LEFT JOIN m ON m.d1 = b.doc_id
"""


# -- embedding outlier trim (mislabeled/noise-vector filter) -------------
# Per-label farthest-from-centroid ranking: the embedding-space analogue
# of the text quality filter — vectors far from their class centroid are
# label noise / junk embeddings, trimmed before training.  Exactness: the
# centroid sum_q/n is never materialized as a float; the squared distance
# is scaled by n^2 (sum over dims of (n*q_d - sum_d)^2), an exact BIGINT
# (|n*q| <= ~1.5e7 at sf=1 -> per-dim square <= ~2e14, x64 dims well
# under 2^63), so the per-label outlier ranking is pure integer with a
# vec_id tie-break.  The only float ops are one sqrt + one division for
# the human-readable distance.  Plan: centroid table is labels x dims
# (tiny, broadcast); one partial-combined shuffle per grain.
def embedding_outlier_trim(spark, sf):
    from pyspark.sql import Window
    e = load_table(spark, sf, "embeddings")
    q = (e.selectExpr("vec_id", "label", f"{_QUANT_SPARK} AS qv")
         .select("vec_id", "label", F.posexplode("qv").alias("dim", "q")))
    cent = (q.groupBy("label", "dim")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("q").alias("sum_q")))
    per_vec = (q.join(F.broadcast(cent), ["label", "dim"])
               .groupBy("label", "vec_id")
               .agg(F.expr("CAST(sum((n*q - sum_q) * (n*q - sum_q)) AS BIGINT)")
                    .alias("sqd"),
                    F.max("n").alias("n")))
    w = Window.partitionBy("label").orderBy(F.col("sqd").desc(), "vec_id")
    return (per_vec
            .withColumn("outlier_rank", F.row_number().over(w).cast("long"))
            .selectExpr("label", "vec_id", "sqd",
                        "sqrt(CAST(sqd AS DOUBLE)) / (n * 1000.0) AS dist",
                        "outlier_rank", "outlier_rank <= 3 AS is_outlier"))


EMBEDDING_OUTLIER_SQL = f"""
WITH q AS (SELECT vec_id, label, {_QUANT_DUCK} AS qv FROM embeddings),
x AS (SELECT vec_id, label,
             unnest(range(0, len(qv))) AS dim, unnest(qv) AS q
      FROM q),
c AS (SELECT label, dim, COUNT(*) AS n, SUM(q) AS sum_q
      FROM x GROUP BY 1, 2),
v AS (SELECT x.label, x.vec_id, MAX(c.n) AS n,
             CAST(SUM((c.n * x.q - c.sum_q) * (c.n * x.q - c.sum_q))
                  AS BIGINT) AS sqd
      FROM x JOIN c ON x.label = c.label AND x.dim = c.dim
      GROUP BY 1, 2)
SELECT label, vec_id, sqd,
       sqrt(CAST(sqd AS DOUBLE)) / (n * 1000.0) AS dist,
       CAST(rk AS BIGINT) AS outlier_rank,
       rk <= 3 AS is_outlier
FROM (SELECT *, row_number() OVER (PARTITION BY label
                                   ORDER BY sqd DESC, vec_id) AS rk
      FROM v)
"""


# -- int8 embedding quantization audit ------------------------------------
# Storage-tier decision for a 100 TB embedding store: int8 symmetric
# quantization cuts ANN scan I/O 4x (the same lever PqIndex pushes to
# 32x); this measures what it costs.  Per dim: q = clamp(round(x*127),
# ±127); the reconstruction error in 1/127000 grid units is
# |round(x*127000) - 1000*q| — EXACT BIGINT arithmetic (|x| <= 1 keeps
# every product far under 2^53), same integer-quantization discipline as
# _QUANT above, so the DuckDB oracle hashes identically.  Plan: map-only
# per-vector fold, then one K-group aggregation — no shuffle of vectors.
_QERR_SPARK = (
    "transform(embedding, x -> "
    "abs(CAST(round(CAST(x AS DOUBLE) * 127000) AS BIGINT) - "
    "1000 * greatest(CAST(-127 AS BIGINT), least(CAST(127 AS BIGINT), "
    "CAST(round(CAST(x AS DOUBLE) * 127) AS BIGINT)))))")
_QERR_DUCK = (
    "list_transform(embedding::DOUBLE[], x -> "
    "abs(CAST(round(x * 127000) AS BIGINT) - "
    "1000 * greatest(CAST(-127 AS BIGINT), least(CAST(127 AS BIGINT), "
    "CAST(round(x * 127) AS BIGINT)))))")


def embedding_int8_quant(spark, sf):
    e = load_table(spark, sf, "embeddings")
    return (e.selectExpr("label", f"{_QERR_SPARK} AS errs")
            .selectExpr(
                "label",
                "aggregate(errs, CAST(0 AS BIGINT), (a, x) -> a + x) AS err_sum",
                "array_max(errs) AS err_max",
                "CAST(size(errs) AS BIGINT) AS dims")
            .groupBy("label")
            .agg(F.count(F.lit(1)).alias("n_vecs"),
                 F.sum("err_sum").alias("total_err"),
                 F.max("err_max").alias("max_err"),
                 F.sum("dims").alias("n_dims"))
            .selectExpr("label", "n_vecs", "total_err", "max_err",
                        "CAST(total_err AS DOUBLE) / (n_dims * 127000.0)"
                        " AS mean_abs_err")
            .orderBy("label"))


EMBEDDING_INT8_QUANT_SQL = f"""
WITH q AS (SELECT label, {_QERR_DUCK} AS errs FROM embeddings)
SELECT label, COUNT(*) AS n_vecs,
       CAST(SUM(list_sum(errs)) AS BIGINT) AS total_err,
       CAST(MAX(list_max(errs)) AS BIGINT) AS max_err,
       CAST(SUM(list_sum(errs)) AS DOUBLE)
         / (SUM(len(errs)) * 127000.0) AS mean_abs_err
FROM q GROUP BY label ORDER BY label
"""


# -- k-means: one exact-integer Lloyd iteration ---------------------------
# The oracle-checkable core of IvfIndex.train_centroids (operators/
# ivf.py:92): assignment = argmin integer L2 over the current centroids,
# update = per-(centroid, dimension) member sums + counts.  Division is
# deferred (sums + counts instead of means) so every output cell is a
# BIGINT and the cross-engine hash is bit-exact; callers divide when they
# need the mean.  Scale shape: the K centroids are a driver-side LUT
# (K x dim literals, metadata-sized like the PQ codebook) folded into ONE
# codegen projection — assignment is map-only, zero joins, zero shuffles;
# the only exchange is the final aggregation, whose key space is
# K*dim (= {K}*64) groups, so map-side partial aggregation reduces the
# shuffle to ~partitions * K * dim rows regardless of corpus size.
_KM_K = 8


def embedding_kmeans_step(spark, sf):
    qv = _quantized(spark, sf)
    cents = (qv.where(F.col("vec_id") < _KM_K)
             .selectExpr("vec_id", "qv", "norm2")
             .orderBy("vec_id").collect())        # K rows: driver LUT
    arms = []
    for c in cents:
        lit = "array(" + ",".join(f"{int(x)}L" for x in c["qv"]) + ")"
        dot = _DOT_SPARK.format(a="qv", b=lit)
        arms.append(f"struct(norm2 - 2 * ({dot}) + {int(c['norm2'])}L AS d, "
                    f"{int(c['vec_id'])} AS cent_id)")
    best = f"array_min(array({', '.join(arms)})).cent_id"
    assigned = qv.selectExpr(f"{best} AS cent_id", "qv")
    return (assigned.select("cent_id", F.posexplode("qv").alias("pos", "x"))
            .groupBy("cent_id", "pos")
            .agg(F.sum("x").alias("dim_sum"),
                 F.count(F.lit(1)).alias("n_members"))
            .selectExpr("CAST(cent_id AS INT) AS cent_id",
                        "CAST(pos AS INT) AS pos",
                        "CAST(dim_sum AS BIGINT) AS dim_sum",
                        "CAST(n_members AS BIGINT) AS n_members"))


EMBEDDING_KMEANS_STEP_SQL = f"""
WITH q AS (SELECT vec_id, {_QUANT_DUCK} AS qv FROM embeddings),
n AS (SELECT vec_id, qv,
             CAST(list_dot_product(qv::DOUBLE[], qv::DOUBLE[]) AS BIGINT) AS norm2
      FROM q),
c AS (SELECT vec_id AS cent_id, qv AS cv, norm2 AS cn FROM n WHERE vec_id < {_KM_K}),
d AS (SELECT n.vec_id, c.cent_id, n.qv,
             n.norm2 - 2 * CAST(list_dot_product(n.qv::DOUBLE[], c.cv::DOUBLE[]) AS BIGINT) + c.cn AS dist
      FROM n, c),
a AS (SELECT vec_id, qv, cent_id FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cent_id) AS rn
        FROM d) t WHERE rn = 1),
e AS (SELECT cent_id, unnest(range(0, len(qv))) AS pos, unnest(qv) AS x FROM a)
SELECT CAST(cent_id AS INTEGER) AS cent_id, CAST(pos AS INTEGER) AS pos,
       CAST(SUM(x) AS BIGINT) AS dim_sum, CAST(COUNT(*) AS BIGINT) AS n_members
FROM e GROUP BY cent_id, pos
"""


# -- triangle count + clustering coefficient of the near-dup graph --------
# Graph analytics beyond connected components: how CLIQUE-LIKE are the
# near-dup clusters?  A chain of pairwise-similar docs (A~B~C but A!~C,
# the transitive-closure trap CC deliberately accepts) has triangles=0;
# a true duplicate family is a clique.  The triangle census is the
# standard oriented-edge algorithm: edges already carry d1 < d2, so
# each triangle {x<y<z} is counted EXACTLY once as the join
# (x,y)+(y,z) closed by (x,z) — no division by 6, no double counting.
# Wedges (open triads) are sum-over-nodes C(deg, 2) from one degree
# aggregation; global clustering coefficient = 3*triangles / wedges
# (all-integer numerators, one IEEE division).  Scale: fan-out of the
# wedge join is bounded by the near-dup DEGREE (band-collision bound,
# small by construction) — never corpus-sized; the edge list itself is
# the LSH candidate output, already ∝ collisions.
def dedup_graph_triangles(spark, sf):
    e = (dedup_minhash_lsh(spark, sf)
         .selectExpr("doc_id_1 AS a", "doc_id_2 AS b").cache())
    deg = (e.selectExpr("a AS v").unionAll(e.selectExpr("b AS v"))
           .groupBy("v").agg(F.count(F.lit(1)).alias("d")))
    wedges = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum(F.expr("d * (d - 1) DIV 2")).alias("n_wedges"))
    e2 = e.selectExpr("a AS b2", "b AS c")
    e3 = e.selectExpr("a AS a3", "b AS c3")
    tri = (e.join(e2, F.col("b") == F.col("b2"))
           .join(e3, (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3")))
           .agg(F.count(F.lit(1)).alias("n_triangles")))
    edges = e.agg(F.count(F.lit(1)).alias("n_edges"))
    return (wedges.crossJoin(F.broadcast(edges))
            .crossJoin(F.broadcast(tri))     # all sides are 1 row
            .selectExpr("n_nodes", "n_edges", "n_wedges", "n_triangles",
                        "CAST(3 * n_triangles AS DOUBLE) / n_wedges"
                        " AS clustering_coeff"))


DEDUP_GRAPH_TRIANGLES_SQL = f"""
WITH edges AS (
  SELECT doc_id_1 AS a, doc_id_2 AS b FROM ({DEDUP_MINHASH_LSH_SQL})
),
deg AS (SELECT v, COUNT(*) AS d FROM (
          SELECT a AS v FROM edges UNION ALL SELECT b AS v FROM edges)
        GROUP BY v),
w AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
             CAST(SUM(d * (d - 1) // 2) AS BIGINT) AS n_wedges FROM deg),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
      FROM edges e1
      JOIN edges e2 ON e1.b = e2.a
      JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM edges)
SELECT w.n_nodes, m.n_edges, w.n_wedges, t.n_triangles,
       CAST(3 * t.n_triangles AS DOUBLE) / w.n_wedges AS clustering_coeff
FROM w, m, t
"""


# -- contrastive hard-negative mining -------------------------------------
# Training-pair construction for contrastive/embedding models: for each
# query vector, the top-k most-similar vectors whose LABEL differs —
# "hard negatives", the near-misses that carry the most gradient signal
# (easy negatives are random pairs; these are mined from the similarity
# structure).  Same determinism discipline as ann_cosine_topk: integer-
# quantized dot products (exact BIGINTs), one sqrt + one division per
# pair (correctly rounded), total-ordered top-k.  Scale shape: the
# query side is broadcast (a training batch, not the corpus), the label
# filter is a codegen predicate on the scanned side, and the per-query
# top-k is a WindowGroupLimit — map-side partial top-k, never a global
# sort; the corpus side streams through ONE scan regardless of k.
_HN_TOP_K = 10


def ann_hard_negatives(spark, sf):
    from pyspark.sql import Window
    e = load_table(spark, sf, "embeddings")
    qv = e.selectExpr("vec_id", "label", f"{_QUANT_SPARK} AS qv")
    dot_self = _DOT_SPARK.format(a="qv", b="qv")
    qv = qv.selectExpr("vec_id", "label", "qv", f"{dot_self} AS norm2")
    queries = qv.where(F.col("vec_id") < _N_QUERIES) \
        .selectExpr("vec_id AS query_id", "label AS query_label",
                    "qv AS qq", "norm2 AS qn")
    dot = _DOT_SPARK.format(a="qq", b="qv")
    scored = (F.broadcast(queries).crossJoin(qv)
              .where(F.col("label") != F.col("query_label"))
              .selectExpr("query_id", "query_label", "vec_id",
                          "label AS neg_label",
                          f"CAST({dot} AS DOUBLE) / sqrt(CAST(qn AS DOUBLE)"
                          " * CAST(norm2 AS DOUBLE)) AS cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= _HN_TOP_K)
            .select("query_id", F.col("query_label").cast("int").alias("query_label"),
                    "vec_id", F.col("neg_label").cast("int").alias("neg_label"),
                    "cosine", F.col("rank").cast("int").alias("rank")))


ANN_HARD_NEGATIVES_SQL = f"""
WITH q AS (SELECT vec_id, label, {_QUANT_DUCK} AS qv FROM embeddings),
n AS (SELECT vec_id, label, qv,
             CAST(list_dot_product(qv::DOUBLE[], qv::DOUBLE[]) AS BIGINT) AS norm2
      FROM q),
scored AS (
  SELECT a.vec_id AS query_id, a.label AS query_label, b.vec_id,
         b.label AS neg_label,
         list_dot_product(a.qv::DOUBLE[], b.qv::DOUBLE[])
           / sqrt(CAST(a.norm2 AS DOUBLE) * CAST(b.norm2 AS DOUBLE)) AS cosine
  FROM n a, n b
  WHERE a.vec_id < {_N_QUERIES} AND b.label <> a.label
)
SELECT query_id, CAST(query_label AS INTEGER) AS query_label, vec_id,
       CAST(neg_label AS INTEGER) AS neg_label, cosine,
       CAST(rank AS INTEGER) AS rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM scored
) WHERE rank <= {_HN_TOP_K}
"""


# -- SemDeDup-style semantic dedup (cluster, then prune within cell) ------
# The published semantic-dedup shape (SemDeDup, Abbas et al. 2023,
# arXiv:2303.09540): k-means partitions the corpus into cells, pairwise
# cosine runs ONLY within each cell (cell-bounded — never O(n²) on the
# corpus), and of each over-threshold pair the member FARTHER from its
# cell centroid is removed (the paper's keep-closest-to-centroid rule;
# vec_id breaks exact ties).  Everything is exact-integer except the
# final cosine: quantized int components, BIGINT dots, integer squared
# L2 to the centroid — so the keep/remove decision is bit-deterministic
# cross-engine.  Plan shape: K-row driver LUT for assignment (map-only,
# the kmeans_step contract), ONE exchange on cent_id for the self-join;
# at 100 TB the cell width bounds the quadratic term exactly as IVF's
# nprobe bounds the scan.
def dedup_semantic_cluster(spark, sf):
    corpus = _cos_corpus(spark, sf)
    q = corpus.selectExpr("vec_id", f"{_QUANT_SPARK} AS qv")
    dot_self = _DOT_SPARK.format(a="qv", b="qv")
    qv = q.selectExpr("vec_id", "qv", f"{dot_self} AS norm2")
    cents = (qv.where(F.col("vec_id") < _KM_K)
             .orderBy("vec_id").collect())        # K rows: driver LUT
    arms = []
    for c in cents:
        lit = "array(" + ",".join(f"{int(x)}L" for x in c["qv"]) + ")"
        dot = _DOT_SPARK.format(a="qv", b=lit)
        arms.append(f"struct(norm2 - 2 * ({dot}) + {int(c['norm2'])}L AS d, "
                    f"{int(c['vec_id'])} AS cent_id)")
    best = f"array_min(array({', '.join(arms)}))"
    assigned = (qv.selectExpr("vec_id", "qv", "norm2", f"{best} AS best")
                .selectExpr("vec_id", "qv", "norm2",
                            "best.cent_id AS cent_id", "best.d AS d_cent")
                .cache())
    a = assigned.selectExpr("cent_id AS ca", "vec_id AS id1", "qv AS qa",
                            "norm2 AS na", "d_cent AS da")
    b = assigned.selectExpr("cent_id AS cb", "vec_id AS id2", "qv AS qb",
                            "norm2 AS nb", "d_cent AS db")
    dot = _DOT_SPARK.format(a="qa", b="qb")
    pairs = (a.join(b, (F.col("ca") == F.col("cb"))
                    & (F.col("id1") < F.col("id2")))
             .where(F.expr(
                 f"CAST({dot} AS DOUBLE) / sqrt(CAST(na AS DOUBLE) * "
                 f"CAST(nb AS DOUBLE)) >= {_COS_DUP_THRESHOLD}"))
             # the pair's loser: farther from the centroid (exact
             # integer d), vec_id tie-break (id1 < id2 by construction)
             .selectExpr("CASE WHEN da <= db THEN id2 ELSE id1 END"
                         " AS vec_id"))
    removed = pairs.distinct().withColumn("is_removed", F.lit(True))
    return (assigned.join(removed, "vec_id", "left_outer")
            .selectExpr("CAST(cent_id AS INTEGER) AS cent_id", "vec_id",
                        "CAST(d_cent AS BIGINT) AS dist_to_centroid",
                        "coalesce(is_removed, false) AS is_removed"))


DEDUP_SEMANTIC_CLUSTER_SQL = f"""
WITH embeddings_nd AS ({_COS_CORPUS_SQL}),
q AS (SELECT vec_id, {_QUANT_DUCK} AS qv FROM embeddings_nd),
n AS (SELECT vec_id, qv,
             CAST(list_dot_product(qv::DOUBLE[], qv::DOUBLE[]) AS BIGINT)
             AS norm2 FROM q),
c AS (SELECT vec_id AS cent_id, qv AS cv, norm2 AS cn
      FROM n WHERE vec_id < {_KM_K}),
d AS (SELECT n.vec_id, n.qv, n.norm2, c.cent_id,
             n.norm2 - 2 * CAST(list_dot_product(n.qv::DOUBLE[],
                                                 c.cv::DOUBLE[]) AS BIGINT)
             + c.cn AS dist
      FROM n, c),
assigned AS (SELECT vec_id, qv, norm2, cent_id, dist AS d_cent FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                     ORDER BY dist, cent_id) AS rn
        FROM d) t WHERE rn = 1),
pairs AS (
  SELECT CASE WHEN a.d_cent <= b.d_cent THEN b.vec_id
              ELSE a.vec_id END AS vec_id
  FROM assigned a JOIN assigned b
    ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id
  WHERE list_dot_product(a.qv::DOUBLE[], b.qv::DOUBLE[])
        / sqrt(CAST(a.norm2 AS DOUBLE) * CAST(b.norm2 AS DOUBLE))
        >= {_COS_DUP_THRESHOLD}
),
removed AS (SELECT DISTINCT vec_id FROM pairs)
SELECT CAST(s.cent_id AS INTEGER) AS cent_id, s.vec_id,
       CAST(s.d_cent AS BIGINT) AS dist_to_centroid,
       r.vec_id IS NOT NULL AS is_removed
FROM assigned s LEFT JOIN removed r ON s.vec_id = r.vec_id
"""


QUERIES = {
    "embedding_outlier_trim": Query(
        embedding_outlier_trim, EMBEDDING_OUTLIER_SQL,
        "per-label farthest-from-centroid outlier ranking, integer-exact",
        ("simops", "embedding")),
    "dedup_incremental_filter": Query(
        dedup_incremental_filter, DEDUP_INCREMENTAL_SQL,
        "incremental dedup: new batch LSH-filtered against the base corpus"),
    "dedup_cluster_assign": Query(
        dedup_cluster_assign, DEDUP_CLUSTER_ASSIGN_SQL,
        "near-dup clustering: LSH pairs -> connected components -> representatives"),
    "embedding_pseudo_label": Query(
        embedding_pseudo_label, EMBEDDING_PSEUDO_LABEL_SQL,
        "nearest-centroid pseudo-labeling (weak supervision)"),
    "embedding_label_centroids": Query(
        embedding_label_centroids, EMBEDDING_LABEL_CENTROIDS_SQL,
        "per-label mean embedding (pooling / class prototypes)"),
    "dedup_embedding_cosine": Query(dedup_embedding_cosine, DEDUP_EMBEDDING_COSINE_SQL,
                                    "embedding-cosine near-dup (bucketed)"),
    "dedup_ngram_jaccard": Query(dedup_ngram_jaccard, DEDUP_NGRAM_JACCARD_SQL,
                                 "n-gram Jaccard near-dup (baseline)"),
    "dedup_minhash_lsh": Query(dedup_minhash_lsh, DEDUP_MINHASH_LSH_SQL,
                               "MinHash + banded LSH near-dup (scale path)"),
    "dedup_simhash": Query(dedup_simhash, DEDUP_SIMHASH_SQL,
                           "SimHash Hamming-distance near-dup"),
    "ann_cosine_topk": Query(ann_cosine_topk, ANN_COSINE_TOPK_SQL,
                             "brute-force cosine top-k (exact baseline)"),
    "ann_lsh_bucket_topk": Query(ann_lsh_bucket_topk, ANN_LSH_BUCKET_TOPK_SQL,
                                 "sign-bit LSH-bucketed ANN (approximate scale path)"),
    "ann_ivf_topk": Query(ann_ivf_topk, ANN_IVF_TOPK_SQL,
                          "IVF coarse-quantizer ANN (nprobe cell-pruned scale path)"),
    # appended at the END of the module dict (gate-composition rule,
    # corpus/__init__.py): new queries must not shift the pinned first 50
    "ann_pq_topk": Query(ann_pq_topk, ANN_PQ_TOPK_SQL,
                         "product-quantization ANN: byte codes + ADC "
                         "lookup scoring (compression scale path)"),
    "embedding_int8_quant": Query(
        embedding_int8_quant, EMBEDDING_INT8_QUANT_SQL,
        "int8 quantization audit: exact-integer reconstruction error "
        "per label (storage-tier decision)"),
    "ann_ivfpq_rerank_topk": Query(
        ann_ivfpq_rerank_topk, ANN_IVFPQ_RERANK_SQL,
        "composed IVF-PQ probe: cell pruning -> ADC shortlist -> exact "
        "integer-L2 rerank (the PqIndex rerank_factor/cell_filter paths "
        "under the oracle)"),
    "dedup_minhash_containment": Query(
        dedup_minhash_containment, DEDUP_MINHASH_CONTAINMENT_SQL,
        "asymmetric containment near-dup: catches subset documents "
        "(quote inclusion) that Jaccard under-scores"),
    "embedding_kmeans_step": Query(
        embedding_kmeans_step, EMBEDDING_KMEANS_STEP_SQL,
        "one Lloyd iteration in exact integer math: map-only LUT "
        "assignment + deferred-division centroid sums (the oracle-"
        "checkable core of IvfIndex.train_centroids)"),
    "dedup_substring_runs": Query(
        dedup_substring_runs, DEDUP_SUBSTRING_RUNS_SQL,
        "exact-substring near-dup: longest verbatim shared token run "
        "per banded-LSH candidate pair via diagonal islands over "
        "token-3-gram positions (the sequence statistic Jaccard/"
        "containment set overlap cannot see)"),
    "corpus_leakage_safe_split": Query(
        corpus_leakage_safe_split, CORPUS_LEAKAGE_SAFE_SPLIT_SQL,
        "leakage-safe train/val/test split: explicit-LCG hash of the "
        "dedup CLUSTER id, so near-duplicate documents can never "
        "straddle splits (decontamination by construction)"),
    "corpus_dedup_canonical": Query(
        corpus_dedup_canonical, CORPUS_DEDUP_CANONICAL_SQL,
        "survivorship selection: the canonical (longest, doc_id "
        "tie-break) document per near-dup cluster + member->canonical "
        "mapping — ONE FIRST_VALUE window on the cluster exchange over "
        "the CC assignment"),
    "dedup_graph_triangles": Query(
        dedup_graph_triangles, DEDUP_GRAPH_TRIANGLES_SQL,
        "triangle census + global clustering coefficient of the "
        "near-dup graph (are clusters cliques or chains?) — oriented "
        "d1<d2 edges count each triangle exactly once; wedge fan-out "
        "bounded by near-dup degree"),
    "ann_hard_negatives": Query(
        ann_hard_negatives, ANN_HARD_NEGATIVES_SQL,
        "contrastive hard-negative mining: per query, the top-k most-"
        "similar vectors with a DIFFERENT label (the pairs that teach "
        "an embedding model the most) — broadcast queries, map-side "
        "top-k, exact integer dot products"),
    "dedup_semantic_cluster": Query(
        dedup_semantic_cluster, DEDUP_SEMANTIC_CLUSTER_SQL,
        "SemDeDup-style semantic dedup: k-means cell assignment "
        "(K-row LUT, map-only), within-cell pairwise cosine, and the "
        "paper's keep-closest-to-centroid survivorship — exact-integer "
        "distances make removal bit-deterministic; cell width bounds "
        "the quadratic term"),
}
