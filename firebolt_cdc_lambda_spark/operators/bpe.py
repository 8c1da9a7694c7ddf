"""Byte-pair-encoding vocabulary trainer — the iterative form of the
oracle-gated single step (corpus/textops.py text_bpe_pair_merge).

Classic BPE (Sennrich et al., public method): start from characters,
repeatedly (1) count adjacent symbol pairs over the WORD-TYPE table
weighted by word frequency, (2) merge the most frequent pair everywhere,
greedy left-to-right.  The trainer is Spark-first throughout:

* State lives in a DataFrame of (symbols array<string>, wc) word types —
  bounded by the type vocabulary (Heaps' law), never the corpus.  At
  100 TB the one corpus-sized job is the initial word count; every merge
  iteration touches only the type table.
* The pair count is one groupBy over exploded adjacent pairs (map-side
  combined; key space = live pair vocabulary).  The argmax pair is a
  1-row TakeOrdered to the driver — the merge decision is metadata, like
  k-means centroids.
* The merge itself is a pure Catalyst fold (``aggregate`` over the
  symbol array with a (out, carry) struct accumulator): greedy
  left-to-right, non-overlapping — no UDF, no Python row loop.
* Ties break on (count DESC, pair ASC) — pinned so training is
  deterministic and the pytest reference (pure-Python BPE) can predict
  the exact merge sequence.

``encode`` replays the learned merges in order on any word column —
the tokenizer side of the trainer, same fold expression per merge.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _merge_expr(col: str, a: str, b: str) -> str:
    """SQL expression: greedy left-to-right merge of adjacent (a, b) in
    a symbol array.  Fold accumulator: (out ARRAY<STRING>, carry STRING);
    carry holds the previous unconsumed symbol."""
    qa, qb = a.replace("'", "\\'"), b.replace("'", "\\'")
    return (
        "aggregate("
        f"  {col},"
        "  named_struct('out', CAST(array() AS ARRAY<STRING>),"
        "               'carry', CAST(NULL AS STRING)),"
        "  (acc, s) -> CASE"
        f"    WHEN acc.carry = '{qa}' AND s = '{qb}'"
        f"      THEN named_struct('out', array_append(acc.out, '{qa}{qb}'),"
        "                         'carry', CAST(NULL AS STRING))"
        "    WHEN acc.carry IS NULL"
        "      THEN named_struct('out', acc.out, 'carry', s)"
        "    ELSE named_struct('out', array_append(acc.out, acc.carry),"
        "                      'carry', s)"
        "  END,"
        "  acc -> CASE WHEN acc.carry IS NULL THEN acc.out"
        "              ELSE array_append(acc.out, acc.carry) END)"
    )


def chars_column(word_col: str) -> Column:
    """Split a word into its character symbols (the BPE start state).
    The empty-string CASE is load-bearing: sequence(1, 0) is the
    DESCENDING [1, 0] in Spark, which would yield ['', '']."""
    return F.expr(
        f"CASE WHEN length({word_col}) = 0 THEN CAST(array() AS ARRAY<STRING>)"
        f" ELSE transform(sequence(1, length({word_col})), "
        f"i -> substr({word_col}, i, 1)) END")


class BpeTrainer:
    def __init__(self, min_pair_count: int = 2):
        self.min_pair_count = min_pair_count
        self.merges: list[tuple[str, str]] = []
        #: (a, b, pair_count) per merge — the count that won each
        #: decision, kept for auditing/oracling the training loop
        self.merge_stats: list[tuple[str, str, int]] = []

    def train(self, words: DataFrame, num_merges: int,
              word_col: str = "w", count_col: str = "wc") -> list[tuple[str, str]]:
        """Learn up to ``num_merges`` merges from a (word, count) type
        table.  Early-stops when no pair reaches ``min_pair_count``.
        Returns the merge list (also kept on ``self.merges``)."""
        state = (words.select(chars_column(word_col).alias("sym"),
                              F.col(count_col).cast("long").alias("wc"))
                 .localCheckpoint(eager=True))
        self.merges = []
        self.merge_stats = []
        for _ in range(num_merges):
            # size(sym) >= 2 guard is load-bearing: Spark's
            # sequence(1, 0) is the DESCENDING [1, 0] (same trap as
            # textops.text_ngram_novelty), so a fully-merged single-
            # symbol word would hit element_at(sym, 2) out of bounds
            pairs = (state.where("size(sym) >= 2")
                     .selectExpr(
                        "wc",
                        "explode(transform(sequence(1, size(sym) - 1), "
                        "i -> struct(element_at(sym, i) AS a, "
                        "element_at(sym, i + 1) AS b))) AS p")
                     .groupBy("p.a", "p.b")
                     .agg(F.sum("wc").alias("n"))
                     .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
                     .limit(1).collect())
            if not pairs or pairs[0]["n"] < self.min_pair_count:
                break
            a, b = pairs[0]["a"], pairs[0]["b"]
            self.merges.append((a, b))
            self.merge_stats.append((a, b, int(pairs[0]["n"])))
            # checkpoint truncates the growing fold-chain lineage: each
            # iteration's plan stays one fold deep, not i folds deep
            state = (state.selectExpr(f"{_merge_expr('sym', a, b)} AS sym",
                                      "wc")
                     .localCheckpoint(eager=True))
        self._final_state = state
        return self.merges

    def vocab(self) -> DataFrame:
        """(symbol, weighted count) of the trained state — the subword
        vocabulary after all merges."""
        return (self._final_state
                .selectExpr("explode(sym) AS symbol", "wc")
                .groupBy("symbol").agg(F.sum("wc").cast("long").alias("n")))

    def encode(self, df: DataFrame, word_col: str,
               out_col: str = "pieces") -> DataFrame:
        """Apply the learned merges in order to ``word_col``."""
        out = df.withColumn(out_col, chars_column(word_col))
        for a, b in self.merges:
            out = out.withColumn(out_col,
                                 F.expr(_merge_expr(out_col, a, b)))
        return out
