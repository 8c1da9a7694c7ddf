"""Edge-case regressions for corpus/textops queries on degenerate docs.

The sf fixtures only contain long documents, so token-count edge cases
(<3 tokens, empty text) never fire in the differential suite; these tests
pin them with a hand-built table.  Regression for the round-4 advisor
finding: Spark's sequence(1, 0) is the DESCENDING [1, 0], so the 3-gram
transform crashed with INVALID_INDEX_OF_ZERO on any <3-token doc.
"""

import duckdb
import pytest

from firebolt_cdc_lambda_spark.corpus import ALL_QUERIES

_DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


@pytest.fixture(scope="module")
def short_doc_dir(spark, tmp_path_factory):
    rows = [
        (0, "just two", "en", "web", 8),          # 2 tokens -> no 3-grams
        (1, "one", "en", "web", 3),               # 1 token
        (2, "", "en", "web", 0),                  # 0 tokens
        (3, "alpha beta gamma delta", "en", "web", 22),
        (4, "alpha beta gamma", "en", "web", 16),  # exactly 3 tokens
    ]
    d = tmp_path_factory.mktemp("shortdocs")
    spark.createDataFrame(rows, _DOCS_SCHEMA).coalesce(1).write.parquet(
        str(d / "documents.parquet"))
    return str(d)


def test_ngram_novelty_short_docs(spark, short_doc_dir):
    # half 0 = docs {0, 2, 4}: only doc 4 has a gram ("alpha beta gamma").
    # half 1 = docs {1, 3}: doc 3 has "alpha beta gamma", "beta gamma delta".
    row = ALL_QUERIES["text_ngram_novelty"].fn(spark, short_doc_dir).collect()[0]
    assert (row.n_grams_total, row.n_grams_old, row.n_grams_new,
            row.n_novel) == (2, 1, 2, 1)
    assert row.novelty_ratio == 0.5


def test_ngram_novelty_short_docs_matches_oracle(spark, short_doc_dir):
    q = ALL_QUERIES["text_ngram_novelty"]
    got = q.fn(spark, short_doc_dir).collect()[0]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{short_doc_dir}/documents.parquet/*.parquet'")
    exp = con.sql(q.oracle).fetchall()[0]
    cols = sorted(got.asDict())
    got_sorted = [got[c] for c in cols]
    exp_by_name = dict(zip([d[0] for d in con.sql(q.oracle).description], exp))
    assert got_sorted == [exp_by_name[c] for c in cols]


def test_bpe_pair_merge_short_docs(spark, short_doc_dir):
    # length-1 words ("") are excluded by the length >= 2 guard; pairs are
    # per-position.  Crash-freedom + a spot value is enough here (the full
    # oracle runs in the differential suite).
    rows = ALL_QUERIES["text_bpe_pair_merge"].fn(spark, short_doc_dir).collect()
    counts = {r.pair: r.pair_count for r in rows}
    # "alpha" has wc=2 (docs 3 and 4) -> al/lp/ph/ha each counted twice
    assert counts["al"] == 2 and counts["ha"] == 2


def test_cms_heavy_hitters_short_docs(spark, short_doc_dir):
    """Tiny vocabulary: every token is a heavy hitter; estimates must
    still satisfy the CMS guarantee est >= exact, and tokens that share
    no sketch cell with others must estimate exactly."""
    rows = ALL_QUERIES["text_cms_heavy_hitters"].fn(spark, short_doc_dir).collect()
    assert rows, "expected heavy hitters"
    for r in rows:
        assert r.overestimate >= 0
        assert r.cms_estimate >= r.exact_count
    counts = {r.token: r.exact_count for r in rows}
    assert counts["alpha"] == 2 and counts["beta"] == 2


@pytest.mark.parametrize("seed", [7, 23, 91])
def test_cms_guarantee_on_varied_corpora(spark, tmp_path_factory, seed):
    """CMS structural guarantee, est >= exact, on corpora with very
    different collision profiles (vocab ~ tokens, heavy skew, tiny
    vocab) — seeded, not random, so failures reproduce."""
    import random
    rng = random.Random(seed)
    vocab = [f"w{seed}x{i}" for i in range(5 + (seed % 37) * 8)]
    rows = []
    for doc_id in range(60):
        n = 1 + rng.randrange(30)
        # skew: low ids heavily repeated
        toks = [vocab[min(int(rng.expovariate(0.3)), len(vocab) - 1)]
                for _ in range(n)]
        rows.append((doc_id, " ".join(toks), "en", "web", len(toks)))
    d = tmp_path_factory.mktemp(f"cms{seed}")
    spark.createDataFrame(rows, _DOCS_SCHEMA).coalesce(1).write.parquet(
        str(d / "documents.parquet"))
    out = ALL_QUERIES["text_cms_heavy_hitters"].fn(spark, str(d)).collect()
    assert out
    for r in out:
        assert r.cms_estimate >= r.exact_count >= 1
        assert r.overestimate == r.cms_estimate - r.exact_count
