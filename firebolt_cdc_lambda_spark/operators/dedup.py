"""Window-function deduplication — THE core CDC operator.

Re-implements the reference's dedup CTAS (lambda/handler.py:452-467):

    ROW_NUMBER() OVER (PARTITION BY <pk cols> ORDER BY <cascade>) AS rn
    ... WHERE rn = 1

and its dedup *bypass* optimization (lambda/handler.py:422-437): when
``COUNT(*) == COUNT(DISTINCT keys)`` the batch has no duplicates and the
window op is skipped entirely.

Scale notes: the window shuffles once on the key hash; with AQE on, a
skewed key is split at runtime.  The same key-hash partitioning is what
the downstream merge join uses, so Catalyst can reuse the exchange.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .ordering import RANK_COL, dedup_ordering


def needs_dedup(df: DataFrame, keys: Sequence[str]) -> bool:
    """True if the batch contains >1 row for any key.

    One aggregation job: COUNT(*) vs COUNT(DISTINCT keys)
    (reference: lambda/handler.py:422-431).  NOTE Spark's
    ``count_distinct(*cols)`` skips rows where ANY key is NULL — same as
    SQL ``COUNT(DISTINCT k1, k2)``; CDC keys are non-null by contract.
    """
    row = df.agg(
        F.count(F.lit(1)).alias("total"),
        F.count_distinct(*[F.col(k) for k in keys]).alias("uniq"),
    ).first()
    return int(row["total"]) != int(row["uniq"])


def deduplicate(
    df: DataFrame,
    keys: Sequence[str],
    order: Sequence[Column] | None = None,
    check_bypass: bool = False,
) -> DataFrame:
    """Keep exactly one row per key: the 'last writer' under the cascade.

    ``order`` defaults to the 5-level cascade over whichever CDC columns
    are present (see ordering.dedup_ordering).  With ``check_bypass`` the
    count pre-check of the reference is run first and the window skipped
    for duplicate-free batches; for Spark this saves one shuffle on the
    (common) no-duplicate micro-batch at the cost of one extra pass.
    """
    if check_bypass and not needs_dedup(df, keys):
        return df
    order = list(order) if order is not None else dedup_ordering(df)
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*order)
    return (
        df.withColumn(RANK_COL, F.row_number().over(w))
        .where(F.col(RANK_COL) == 1)
        .drop(RANK_COL)
    )
