"""As-of join: for each left row, the latest right row with
``right.ts <= left.ts`` within the same key — the standard
time-series/point-in-time enrichment operator.  Spark has no native
ASOF JOIN (DuckDB/Pandas do); the scalable composition here is the
union + last-value-carry window:

    tag left/right rows -> union -> window per key ordered by
    (ts, right-before-left) -> last(right_payload, ignoreNulls) carries
    the most recent right row forward -> keep left rows.

Cost: ONE shuffle on the key (the window), no range self-join blowup —
each row is touched once, so 100 TB of events against a large
right side scales linearly, unlike the naive inequality join
(O(left x right-per-key)).

At equal timestamps the right row sorts BEFORE the left row, so the
boundary is inclusive (ts >= right.ts), matching DuckDB's
``ASOF LEFT JOIN ... ON l.k = r.k AND l.ts >= r.ts`` semantics.

``direction="forward"`` flips the operator: the EARLIEST right row with
``right.ts >= left.ts`` (DuckDB ``... AND l.ts <= r.ts``) — the
"next event after" enrichment.  Same single-shuffle plan; the carry
window just runs over the following frame, with right rows sorting
AFTER left rows at equal timestamps so the boundary stays inclusive.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_payload: Sequence[str],
    how: str = "left",
    direction: str = "backward",
) -> DataFrame:
    """As-of join ``left`` with ``right`` on key ``on``.

    Returns every left row (``how='left'``; 'inner' drops unmatched)
    plus ``right_payload`` columns from the latest right row at or
    before the left row's timestamp (``direction='backward'``, the
    default) or the earliest right row at or after it
    (``direction='forward'``).  ``right`` should be unique per
    (key, right_ts) — pre-aggregate if not, or the carried row among
    ties is the last under (right_ts) ordering (backward) / the first
    (forward).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    lcols = left.columns
    # the right payload travels as ONE struct so a NULL field inside a
    # right row can never be "filled in" from an older right row
    r_struct_t = F.struct(*[F.col(c).alias(c) for c in right_payload])
    l_tag = (left
             .withColumn("__ts", F.col(left_ts))
             .withColumn("__is_left", F.lit(1))
             .withColumn("__r", F.lit(None).cast(
                 "struct<" + ",".join(
                     f"{c}:{right.schema[c].dataType.simpleString()}"
                     for c in right_payload) + ">")))
    r_tag = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        r_struct_t.alias("__r"),
    )
    for c in lcols:
        if c != on:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    unioned = (l_tag.select(*lcols, "__ts", "__is_left", "__r")
               .unionByName(r_tag.select(*lcols, "__ts", "__is_left", "__r")))

    if direction == "backward":
        # right rows (__is_left=0) sort before left rows at equal __ts
        w = (Window.partitionBy(on)
             .orderBy(F.col("__ts").asc(), F.col("__is_left").asc())
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        carried = F.last("__r", ignorenulls=True).over(w)
    else:
        # right rows sort AFTER left rows at equal __ts, and the first
        # non-null right struct in the following frame is the match
        w = (Window.partitionBy(on)
             .orderBy(F.col("__ts").asc(), F.col("__is_left").desc())
             .rowsBetween(Window.currentRow, Window.unboundedFollowing))
        carried = F.first("__r", ignorenulls=True).over(w)
    out = (unioned.select(*lcols, "__is_left", carried.alias("__m"))
           .where(F.col("__is_left") == 1)
           .select(*lcols, *[F.col(f"__m.{c}").alias(c) for c in right_payload],
                   F.col("__m").isNotNull().alias("__matched"))
           .drop("__is_left"))
    if how == "inner":
        out = out.where(F.col("__matched"))
    return out.drop("__matched")
