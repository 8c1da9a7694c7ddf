"""Driver-fidelity strict comparator for the differential harness.

Round 6 lesson (VERDICT r6, "What's wrong" #3): the local harness
compared DuckDB ``fetchall()`` Python values at 10 significant digits,
which structurally cannot see two classes of driver-gate failure:

1. **Exposed-type drift** — DuckDB widens window ``SUM(BIGINT)`` to
   HUGEINT, which surfaces through Arrow as ``decimal128(38,0)`` while
   Spark exposes ``int64``.  ``fetchall()`` collapses HUGEINT back to
   Python ``int``, so values "match" locally while the driver's
   Arrow-level hash fails (events_markov_transitions, r6's one red row).
2. **Sub-1e-10 float drift** — ``f"{v:.10g}"`` hides drift below 10
   significant digits; the driver hashes full bit patterns.

This module is the fix: compare every oracle via ``.arrow()`` —

* ``schema_mismatches`` asserts the oracle's **exposed Arrow schema**
  matches Spark's dtypes under ONE pinned widening map (below).  A
  HUGEINT/decimal128 leaking into an exposed column is a FAIL even
  when the values are equal.
* ``canon_rows`` canonicalizes values **type-tagged at full bit
  precision**: ``float.hex()`` for doubles (no rounding), ``Decimal``
  kept distinct from ``int``, bytes hex-tagged, lists recursed.

THE PINNED WIDENING MAP (everything else is a mismatch):

=================  ==========================================
Spark dtype        acceptable exposed Arrow type(s)
=================  ==========================================
boolean            bool
tinyint/smallint   int8 / int16
int                int32
bigint             int64
float / double     float32 / float64
decimal(p,s)       decimal128(p,s)  (exact precision+scale)
string             string | large_string   (width only)
binary             binary | large_binary   (width only)
date               date32
timestamp          timestamp[us] with or without tz (tz only)
array<T>           list<T'> | large_list<T'>, T' under this map
=================  ==========================================

The only widenings are *representation-level* (string width, list
width, timestamp tz presence) — never value-type-level.  Shared by
``tools/validate.py`` and ``tests/test_corpus_vs_duckdb.py`` so the
local harness is exactly as strict as the gate it predicts.
"""

from __future__ import annotations

import datetime
import math
from decimal import Decimal

import pyarrow as pa

__all__ = ["schema_mismatches", "canon_rows"]


def _arrow_ok(spark_dt: str, t: pa.DataType) -> bool:
    sd = spark_dt.strip()
    if sd == "boolean":
        return pa.types.is_boolean(t)
    if sd == "tinyint":
        return t == pa.int8()
    if sd == "smallint":
        return t == pa.int16()
    if sd == "int":
        return t == pa.int32()
    if sd == "bigint":
        return t == pa.int64()
    if sd == "float":
        return t == pa.float32()
    if sd == "double":
        return t == pa.float64()
    if sd == "string":
        return pa.types.is_string(t) or pa.types.is_large_string(t)
    if sd == "binary":
        return pa.types.is_binary(t) or pa.types.is_large_binary(t)
    if sd == "date":
        return pa.types.is_date32(t)
    if sd in ("timestamp", "timestamp_ntz"):
        return pa.types.is_timestamp(t) and t.unit == "us"
    if sd.startswith("decimal(") and sd.endswith(")"):
        p, s = (int(x) for x in sd[len("decimal("):-1].split(","))
        return (pa.types.is_decimal(t)
                and t.precision == p and t.scale == s)
    if sd.startswith("array<") and sd.endswith(">"):
        if not (pa.types.is_list(t) or pa.types.is_large_list(t)):
            return False
        return _arrow_ok(sd[len("array<"):-1], t.value_type)
    return False  # maps/structs never exposed by an oracle-gated query


def schema_mismatches(spark_dtypes, arrow_schema) -> list:
    """Exposed-type check: Spark ``df.dtypes`` vs the oracle's
    ``.arrow()`` schema, matched BY COLUMN NAME (the driver sorts
    columns by name before hashing).  Returns ``[(col, spark_dt,
    arrow_t), ...]`` — empty means the exposed schemas agree under the
    pinned widening map."""
    spark_map = dict(spark_dtypes)
    arrow_map = {f.name: f.type for f in arrow_schema}
    bad = []
    for col, sd in spark_map.items():
        at = arrow_map.get(col)
        if at is None or not _arrow_ok(sd, at):
            bad.append((col, sd, str(at)))
    for col in arrow_map:
        if col not in spark_map:
            bad.append((col, None, str(arrow_map[col])))
    return bad


def _canon(v) -> str:
    if v is None:
        return "~"
    if isinstance(v, bool):            # before int (bool is an int)
        return "B1" if v else "B0"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else "f" + v.hex()  # full bits
    if isinstance(v, int):
        return "i" + str(v)
    if isinstance(v, Decimal):
        return "NaN" if v.is_nan() else "d" + str(v)
    if isinstance(v, str):
        return "s" + v
    if isinstance(v, bytes):
        return "x" + v.hex()
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:       # tz widening: compare the instant
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return "t" + v.isoformat()
    if isinstance(v, datetime.date):
        return "D" + v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, dict):            # arrow map_ -> list of pairs
        return "{" + ",".join(
            f"{_canon(k)}:{_canon(x)}" for k, x in sorted(v.items())) + "}"
    return "?" + repr(v)


def canon_rows(rows, cols) -> list:
    """Column-name-sorted, order-insensitive, TYPE-TAGGED full-bit
    canonical form (the driver-hash analogue).  ``rows`` are tuples in
    ``cols`` order; output is a sorted list of joined strings."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        "|".join(_canon(row[i]) for i in order) for row in rows)
