"""Source-type → Spark-type conversion for CDC schema evolution.

Re-expresses the reference's MySQL→Firebolt type system
(lambda/mysql_firebolt_type_mapping.py:22-343, condensed copy in
lambda/handler.py:30-99) with Spark SQL types as the target.  The
*semantics* preserved:

* string/binary/semi-structured families -> StringType (the reference
  flattens BLOB/JSON/UUID/... to TEXT);
* unsigned widening: INT UNSIGNED -> LongType, BIGINT UNSIGNED/UINT64 ->
  DecimalType(20, 0) (reference :67-82);
* DECIMAL default (38, 10), declared precision preserved and capped at
  38 (reference :87-93, :277-284) — Spark's max precision is also 38;
* TIME/TIMETZ/INTERVAL have no Spark scalar either -> StringType;
  YEAR -> IntegerType (reference :114-117);
* unknown types fall back to StringType with ``is_safe=False``
  (reference :292-293);
* a "safe to auto-add" whitelist gating schema evolution
  (reference :164-172) and a manual-intervention set (reference :175-180).

Deliberate improvement over the reference: Spark natively supports
ARRAY/STRUCT/MAP, which the reference cannot auto-convert at all
(:143-147).  Simple ``ARRAY<T>`` strings are converted here (still marked
``is_safe=False`` so they never silently auto-add, matching the
reference's conservative posture).  Spatial types remain manual.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# base-type table (reference :22-162); values are Spark type *factories*
# evaluated after precision extraction.
# ---------------------------------------------------------------------------

_STRING_TYPES = {
    "CHAR", "VARCHAR", "TINYTEXT", "TEXT", "MEDIUMTEXT", "LONGTEXT", "STRING",
    "BINARY", "VARBINARY", "TINYBLOB", "BLOB", "MEDIUMBLOB", "LONGBLOB", "BYTEA",
    "ENUM", "SET", "JSON", "JSONB", "UUID", "INET", "CIDR", "MACADDR",
    "XML", "CLOB", "NCLOB", "NCHAR", "NVARCHAR", "NTEXT", "IMAGE",
    "TIME", "TIMETZ", "INTERVAL",
}
_INT_TYPES = {
    "TINYINT", "SMALLINT", "MEDIUMINT", "INT", "INTEGER",
    "TINYINT UNSIGNED", "SMALLINT UNSIGNED", "MEDIUMINT UNSIGNED",
    "INT8", "INT16", "INT32", "UINT8", "UINT16",
    "YEAR", "SERIAL", "SMALLSERIAL",
}
_BIGINT_TYPES = {
    "BIGINT", "INT64", "INT UNSIGNED", "INTEGER UNSIGNED", "UINT32", "BIGSERIAL",
}
_DECIMAL20_TYPES = {"BIGINT UNSIGNED", "UINT64"}  # no unsigned 64-bit anywhere
_BOOL_TYPES = {"BIT", "BOOL", "BOOLEAN"}
_FLOAT_TYPES = {"FLOAT", "FLOAT4", "REAL", "FLOAT32"}
_DOUBLE_TYPES = {"FLOAT8", "DOUBLE", "DOUBLE PRECISION", "FLOAT64"}
_DECIMAL_TYPES = {"DECIMAL", "NUMERIC", "DEC", "FIXED", "NUMBER"}
_MONEY_TYPES = {"MONEY": (19, 4), "SMALLMONEY": (10, 4)}
_DATE_TYPES = {"DATE", "DATE32", "DATE64"}
_TIMESTAMP_TYPES = {
    "DATETIME", "TIMESTAMP", "TIMESTAMPTZ",
    "TIMESTAMP_S", "TIMESTAMP_MS", "TIMESTAMP_US", "TIMESTAMP_NS",
}

#: safe for automatic ADD COLUMN during schema evolution (reference :164-172)
SAFE_AUTO_ADD_TYPES = frozenset(
    {"TEXT", "VARCHAR", "STRING", "CHAR",
     "INTEGER", "INT", "BIGINT", "SMALLINT", "TINYINT",
     "BOOLEAN", "BOOL", "DATE", "TIMESTAMP", "TIMESTAMPTZ",
     "DOUBLE", "FLOAT", "REAL",
     "NUMERIC", "DECIMAL", "NUMBER", "DEC"}
)

#: never auto-converted (reference :175-180); ARRAY/STRUCT/MAP handled
#: natively by Spark but still flagged unsafe for auto-add.
MANUAL_INTERVENTION_TYPES = frozenset(
    {"GEOMETRY", "POINT", "LINESTRING", "POLYGON", "MULTIPOINT",
     "MULTILINESTRING", "MULTIPOLYGON", "GEOMETRYCOLLECTION", "GEOGRAPHY",
     "STRUCT", "MAP", "ROW", "TUPLE"}
)

MAX_DECIMAL_PRECISION = 38  # Firebolt's and Spark's shared ceiling


def normalize_type(data_type: str) -> str:
    """``VARCHAR(255)`` -> ``VARCHAR``; keeps the UNSIGNED suffix
    (reference :183-205)."""
    if not data_type:
        return "UNKNOWN"
    dtype = data_type.upper().strip()
    base = dtype.split("(", 1)[0].strip()
    if dtype.endswith(" UNSIGNED") and "(" in dtype:
        # e.g. "INT(10) UNSIGNED" -> "INT UNSIGNED"
        base = base + " UNSIGNED"
        base = re.sub(r"\s+", " ", base)
    base = base.split("<", 1)[0].strip()
    if "<" in dtype:
        base = dtype.split("<", 1)[0].strip()
    return base


def extract_precision(data_type: str) -> tuple[int, int | None] | None:
    """``DECIMAL(10,2)`` -> (10, 2); ``VARCHAR(255)`` -> (255, None)
    (reference :208-225)."""
    m = re.search(r"\((\d+)(?:\s*,\s*(\d+))?\)", data_type or "")
    if not m:
        return None
    return int(m.group(1)), (int(m.group(2)) if m.group(2) else None)


@dataclass(frozen=True)
class Conversion:
    spark_type: T.DataType | None
    is_safe: bool
    message: str


_SIMPLE_ELEMENT = {
    "STRING": T.StringType(), "TEXT": T.StringType(), "VARCHAR": T.StringType(),
    "INT": T.IntegerType(), "INTEGER": T.IntegerType(),
    "BIGINT": T.LongType(), "INT64": T.LongType(),
    "FLOAT": T.FloatType(), "DOUBLE": T.DoubleType(),
    "BOOLEAN": T.BooleanType(), "DATE": T.DateType(), "TIMESTAMP": T.TimestampType(),
}


def convert_source_type(source_type: str) -> Conversion:
    """Convert a source (MySQL/DMS/Parquet-ish) type string to a Spark type.

    Mirrors convert_mysql_to_firebolt (reference :228-293): returns the
    target type, an is-safe flag for the auto-add gate, and a message.
    """
    if not source_type:
        return Conversion(None, False, "Empty source type")
    base = normalize_type(source_type)

    if base == "ARRAY" and "<" in source_type:
        elem_name = source_type.upper().split("<", 1)[1].rstrip(">").strip()
        elem = _SIMPLE_ELEMENT.get(normalize_type(elem_name))
        if elem is not None:
            return Conversion(
                T.ArrayType(elem), False,
                f"ARRAY<{elem_name}> supported natively by Spark "
                "(reference requires manual intervention)")
        return Conversion(None, False, f"ARRAY element type {elem_name} unsupported")

    if base in MANUAL_INTERVENTION_TYPES:
        return Conversion(None, False,
                          f"Type {base} requires manual conversion (complex/spatial type)")

    if base in _STRING_TYPES:
        return Conversion(T.StringType(), True, f"Converted from {base}")
    if base in _DECIMAL20_TYPES:
        return Conversion(T.DecimalType(20, 0), True,
                          f"Converted from {base} (unsigned 64-bit widened)")
    if base in _INT_TYPES:
        return Conversion(T.IntegerType(), True, f"Converted from {base}")
    if base in _BIGINT_TYPES:
        return Conversion(T.LongType(), True, f"Converted from {base}")
    if base in _BOOL_TYPES:
        return Conversion(T.BooleanType(), True, f"Converted from {base}")
    if base in _FLOAT_TYPES:
        return Conversion(T.FloatType(), True, f"Converted from {base}")
    if base in _DOUBLE_TYPES:
        return Conversion(T.DoubleType(), True, f"Converted from {base}")
    if base in _MONEY_TYPES:
        p, s = _MONEY_TYPES[base]
        return Conversion(T.DecimalType(p, s), True, f"Converted from {base}")
    if base in _DECIMAL_TYPES:
        prec = extract_precision(source_type)
        if prec:
            p, s = prec
            s = s if s is not None else 0
            p = min(p, MAX_DECIMAL_PRECISION)
            return Conversion(T.DecimalType(p, s), True,
                              f"Converted from {base} with preserved precision")
        return Conversion(T.DecimalType(38, 10), True,
                          f"Converted from {base} with default precision")
    if base in _DATE_TYPES:
        return Conversion(T.DateType(), True, f"Converted from {base}")
    if base in _TIMESTAMP_TYPES:
        return Conversion(T.TimestampType(), True, f"Converted from {base}")

    return Conversion(T.StringType(), False,
                      f"Unknown type {source_type} - using STRING fallback (may need review)")


# ---------------------------------------------------------------------------
# compatibility families for merge-time gating (reference :296-324)
# ---------------------------------------------------------------------------

_COMPAT_GROUPS: list[frozenset[type]] = [
    frozenset({T.StringType}),
    frozenset({T.ByteType, T.ShortType, T.IntegerType}),
    frozenset({T.LongType}),
    frozenset({T.FloatType, T.DoubleType}),
    frozenset({T.BooleanType}),
    frozenset({T.TimestampType, T.TimestampNTZType}),
    frozenset({T.DateType}),
]


def is_type_compatible(source: T.DataType, target: T.DataType) -> bool:
    """Can staging data land in a target column without loss?

    Mirrors is_type_compatible (reference :296-324), including the core
    decimal-strictness semantic: DecimalType is compatible ONLY with the
    exact same (precision, scale) — mismatches must be *dropped from the
    merge*, never silently cast
    (HOW_TO_FIX_DECIMAL_PRECISION_ERRORS.md:5-12, lambda/handler.py:884-897).
    """
    if source == target:
        return True
    if isinstance(source, T.DecimalType) or isinstance(target, T.DecimalType):
        return False  # strict precision; equality handled above
    for group in _COMPAT_GROUPS:
        if type(source) in group and type(target) in group:
            return True
    return False
