"""Skew-resilient aggregation: two-phase salted groupBy.

AQE's skew-join splitting handles skewed JOINS at runtime; for *hot-key
aggregations* (one key holding a large share of a 100 TB table —
inevitable in CDC fleets where one tenant dominates) the classic fix is
salting: partial-aggregate on (key, salt) to spread the hot key over N
reducers, then final-aggregate on key.

MEASURED caveat (PLANS §7d, 6M rows with a 50%-hot key): for plain
algebraic aggregates, stock Spark's map-side partial aggregation
already collapses the hot key to one row per map task, and plain
groupBy BEATS this helper (0.68 s vs 1.10 s) — the extra salt-keyed
shuffle stage costs more than the skew it prevents.  Rank-1 window
dedup is likewise skew-safe via WindowGroupLimit.  Reach for salting
only when the partial step itself is the bottleneck — e.g. grouping
whose per-map-task partial output is still huge (per-key exact distinct
over high-cardinality values), or engines/paths with partial
aggregation disabled.

Only algebraic aggregates decompose this way; this helper supports the
set the validation corpus uses (count/sum/min/max).  For count-distinct
use the built-in two-level ``count_distinct`` (Spark already expands it
via partial sets) or HLL sketches.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"

#: (partial_fn, final_fn) per supported aggregate
_ALGEBRAIC = {
    "count": (F.count, F.sum),
    "sum": (F.sum, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(df: DataFrame, keys: Sequence[str],
               aggs: Sequence[tuple[str, str, str]],
               num_salts: int = 16) -> DataFrame:
    """Two-phase aggregation: ``aggs`` is [(fn, col, alias)] with fn in
    count/sum/min/max.  Equivalent to ``df.groupBy(keys).agg(...)`` but
    the first shuffle keys on (keys, salt), so a hot key spreads over
    ``num_salts`` reducers instead of melting one.
    """
    partials: list[Column] = []
    finals: list[Column] = []
    for fn, col, alias in aggs:
        if fn not in _ALGEBRAIC:
            raise ValueError(f"non-algebraic aggregate {fn!r}; salting not applicable")
        pfn, ffn = _ALGEBRAIC[fn]
        partials.append(pfn(F.col(col) if fn != "count" else F.lit(1)).alias(f"__p_{alias}"))
        finals.append(ffn(f"__p_{alias}").alias(alias))
    salted = df.withColumn(
        _SALT, F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(num_salts)))
    partial = salted.groupBy(*keys, _SALT).agg(*partials)
    return partial.groupBy(*keys).agg(*finals)


def salted_join(fact: DataFrame, dim: DataFrame, on: Sequence[str] | str,
                num_salts: int = 16, how: str = "inner") -> DataFrame:
    """Skew-spread equi-join: key the shuffle on (join key, salt).

    Every fact row gets a salt in [0, num_salts); every dim row is
    replicated once per salt, so the join on ``on + [salt]`` returns
    EXACTLY the plain ``fact.join(dim, on, how)`` — but one hot fact key
    now spreads over ``num_salts`` reducers instead of melting one.
    The salt value itself is irrelevant to correctness (the dim side
    carries all of them), so it can be any per-row expression.

    When to reach for this (vs the free alternatives): the dim side is
    too big to BROADCAST *and* AQE's skew-join splitting doesn't apply —
    e.g. the skewed side feeds a co-partitioned downstream op that
    AQE won't re-split, or a build with AQE disabled (this repo's
    merge path, merge.py).  Cost: dim shuffle volume multiplies by
    ``num_salts`` — size it to the skew, not higher.  ``how`` supports
    inner/left (fact-preserving); right/full would need the dim side
    de-replicated and is not what salting is for.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner|left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    salted_fact = fact.withColumn(
        _SALT, F.pmod(F.xxhash64(F.monotonically_increasing_id()),
                      F.lit(num_salts)).cast("int"))
    rep_dim = dim.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1))))
    return salted_fact.join(rep_dim, keys + [_SALT], how).drop(_SALT)
