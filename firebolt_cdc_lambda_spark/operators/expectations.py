"""Declarative data-quality expectations: N constraints, ONE pass.

The reference ships a page of hand-written validation SQL
(DATA_VALIDATION_QUERIES.sql — null counts, duplicate PKs, row counts,
range probes) that operators paste per table.  This operator turns that
practice into a composable gate, Deequ-style: declare constraints,
compile them ALL into one aggregation over one scan (conditional sums
— no per-check jobs, no second pass), get back a (check, violations,
passed) report, optionally hard-fail the batch before it reaches a
merge.

Scale shape: the report is a single map-side-combined global aggregate
— cost is the scan, regardless of how many checks ride it.  UNIQUE
constraints ride the same aggregate as COUNT(*) - COUNT(DISTINCT
struct(keys)) (the struct form counts NULL-keyed rows like the merge's
dedup window does, so the gate agrees with the engine's own key
semantics).

Usage::

    report = (Expectations(df)
              .not_null("o_custkey", "o_orderdate")
              .unique("o_orderkey")
              .in_range("o_totalprice", 0, 1_000_000)
              .matches("o_orderpriority", r"^[1-5]-[A-Z ]+$")
              .accepted_values("o_orderstatus", ["O", "F", "P"])
              .report())            # DataFrame: check, violations, passed
    Expectations(df).unique("id").enforce()   # raises on violation
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


class ExpectationError(ValueError):
    """A batch failed its declared expectations (the quality gate's
    analogue of the merge's MergeKeyError hard-fail)."""


class Expectations:
    def __init__(self, df: DataFrame):
        self.df = df
        self._checks: list[tuple[str, Column]] = []   # name -> violation count

    def _add(self, name: str, violations: Column) -> "Expectations":
        self._checks.append((name, violations.cast("bigint").alias(name)))
        return self

    def not_null(self, *cols: str) -> "Expectations":
        for c in cols:
            self._add(f"not_null:{c}",
                      F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)))
        return self

    def unique(self, *cols: str) -> "Expectations":
        name = "unique:" + ",".join(cols)
        return self._add(name, F.count(F.lit(1)) - F.count_distinct(
            F.struct(*[F.col(c) for c in cols])))

    def in_range(self, col: str, lo, hi) -> "Expectations":
        bad = F.col(col).isNotNull() & ~F.col(col).between(F.lit(lo), F.lit(hi))
        return self._add(f"in_range:{col}",
                         F.sum(F.when(bad, 1).otherwise(0)))

    def matches(self, col: str, pattern: str) -> "Expectations":
        bad = F.col(col).isNotNull() & ~F.col(col).rlike(pattern)
        return self._add(f"matches:{col}",
                         F.sum(F.when(bad, 1).otherwise(0)))

    def accepted_values(self, col: str, values) -> "Expectations":
        bad = F.col(col).isNotNull() & ~F.col(col).isin(list(values))
        return self._add(f"accepted_values:{col}",
                         F.sum(F.when(bad, 1).otherwise(0)))

    def custom(self, name: str, bad_row: Column) -> "Expectations":
        """Count rows where ``bad_row`` (a boolean Column) holds."""
        return self._add(f"custom:{name}",
                         F.sum(F.when(bad_row, 1).otherwise(0)))

    # -- evaluation --------------------------------------------------------
    def _row(self):
        if not self._checks:
            raise ValueError("no expectations declared")
        return self.df.agg(*[c for _, c in self._checks]).first()

    def report(self) -> DataFrame:
        """(check, violations, passed) — one row per declared check,
        computed by ONE aggregation job."""
        row = self._row()
        spark = self.df.sparkSession
        data = [(name, int(row[name]), row[name] == 0)
                for name, _ in self._checks]
        return spark.createDataFrame(
            data, "check string, violations bigint, passed boolean")

    def enforce(self) -> None:
        """Raise ExpectationError listing every failed check — the
        pre-merge quality gate posture: a violating batch must fail
        loudly, not land quietly."""
        row = self._row()
        failed = [(name, int(row[name]))
                  for name, _ in self._checks if row[name] != 0]
        if failed:
            raise ExpectationError(
                "expectations failed: "
                + "; ".join(f"{n} ({v} violations)" for n, v in failed))
