"""Deterministic CDC deduplication ordering cascade.

Re-implements (Spark-first) the 5-level "last writer wins" ordering the
reference builds as a SQL ORDER BY (reference: lambda/handler.py:345-404):

1. ``load_timestamp DESC``      — DMS S3-write time, the primary version.
2. Op-priority ``DESC``         — Delete(3) > Update(2) > Insert(1) on ties
                                  (reference: lambda/handler.py:381-387).
3. ``COALESCE(updated, 0) DESC``— source MySQL update time (may be epoch
                                  BIGINT or TIMESTAMP; normalized here).
4. ``COALESCE(created, 0) DESC``— source MySQL create time.
5. ``ingestion_seq DESC``       — file-local row order = binlog order,
                                  final tie-breaker (lambda/handler.py:521-527).

Each level is present only if its column exists in the batch, exactly as
the reference builds its ORDER BY conditionally (lambda/handler.py:374-399).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: CDC wire-format metadata columns, excluded from production tables
#: (reference: lambda/handler.py:274 and :582-588).
OP_COL = "Op"
LOAD_TS_COL = "load_timestamp"
UPDATED_COL = "updated"
CREATED_COL = "created"
INGEST_SEQ_COL = "ingestion_seq"
RANK_COL = "rn"
CDC_META_COLS = frozenset({OP_COL, LOAD_TS_COL, RANK_COL, INGEST_SEQ_COL})


def op_priority(col: str | Column = OP_COL) -> Column:
    """D > U > I > anything else (reference: lambda/handler.py:381-387)."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.when(c == "D", F.lit(3))
        .when(c == "U", F.lit(2))
        .when(c == "I", F.lit(1))
        .otherwise(F.lit(0))
    )


def _as_epoch(df: DataFrame, name: str) -> Column:
    """Normalize a maybe-timestamp/maybe-epoch-BIGINT column to a numeric
    epoch for NULL-safe ordering (reference COALESCE(col, 0):
    lambda/handler.py:389-396; the epoch/timestamp duality is noted in
    SURVEY §7.4)."""
    dtype = df.schema[name].dataType
    c = F.col(name)
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        c = F.unix_micros(c)
    elif isinstance(dtype, T.DateType):
        c = F.unix_date(c).cast("long") * F.lit(86400_000_000)
    else:
        c = c.cast("long")
    return F.coalesce(c, F.lit(0))


def dedup_ordering(df: DataFrame) -> list[Column]:
    """Build the ordering cascade for the columns present in ``df``.

    Returns a list of descending sort Columns suitable for
    ``Window.partitionBy(keys).orderBy(*dedup_ordering(df))``.
    """
    cols = set(df.columns)
    order: list[Column] = []
    if LOAD_TS_COL in cols:
        order.append(F.col(LOAD_TS_COL).desc_nulls_last())
    if OP_COL in cols:
        order.append(op_priority(OP_COL).desc())
    if UPDATED_COL in cols:
        order.append(_as_epoch(df, UPDATED_COL).desc())
    if CREATED_COL in cols:
        order.append(_as_epoch(df, CREATED_COL).desc())
    if INGEST_SEQ_COL in cols:
        order.append(F.col(INGEST_SEQ_COL).desc())
    if not order:
        raise ValueError(
            "no ordering columns available; need at least one of "
            f"{LOAD_TS_COL}/{OP_COL}/{UPDATED_COL}/{CREATED_COL}/{INGEST_SEQ_COL}"
        )
    return order
