"""Bounded range join: pairs (l, r) on the same key with
``r.ts ∈ [l.ts, l.ts + max_gap)``.

The naive formulation is an inequality join — Spark plans it as a
per-key nested loop, O(n²) within each key.  The scalable composition
(the standard interval-bucketing trick): quantize time into buckets of
``max_gap``; a right row within the window of a left row can only be in
the left row's bucket or the next one, so emit each LEFT row into
(bucket, bucket+1) candidate slots, equi-join on (key, bucket) —
shuffle-friendly, candidates ∝ density — then apply the exact range
predicate.

Cost: one shuffle each side on (key, bucket); candidate pairs are only
rows within ~2×max_gap of each other, never the full per-key cross
product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    max_gap_sec: int,
    strict: bool = True,
) -> DataFrame:
    """All (left, right) pairs with same ``on`` key and
    ``left.ts <= right.ts < left.ts + max_gap_sec`` (strict upper bound;
    ``strict=False`` makes it inclusive).  Columns are suffixed _l/_r
    except the key."""
    gap_us = max_gap_sec * 1_000_000

    l = left.select(
        F.col(on),
        *[F.col(c).alias(f"{c}_l") for c in left.columns if c != on],
    ).withColumn("__lus", F.unix_micros(F.col(f"{left_ts}_l")))
    r = right.select(
        F.col(on),
        *[F.col(c).alias(f"{c}_r") for c in right.columns if c != on],
    ).withColumn("__rus", F.unix_micros(F.col(f"{right_ts}_r")))

    # left rows fan out to their bucket and the next; right rows keep one.
    # integer div, not double division — a double quotient can mis-floor
    # at exact bucket boundaries.
    l_bucket = F.expr(f"__lus div {gap_us}")
    l_fan = l.withColumn("__bucket", F.explode(F.array(l_bucket, l_bucket + 1)))
    r_b = r.withColumn("__bucket", F.expr(f"__rus div {gap_us}"))

    upper = (F.col("__rus") < F.col("__lus") + gap_us if strict
             else F.col("__rus") <= F.col("__lus") + gap_us)
    # each right row has ONE bucket and the two fan slots differ, so every
    # qualifying pair joins exactly once — no dedup needed.
    return (l_fan.join(r_b, [on, "__bucket"])
            .where((F.col("__rus") >= F.col("__lus")) & upper)
            .drop("__bucket", "__lus", "__rus"))
