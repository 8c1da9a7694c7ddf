"""Type-system semantics (reference mysql_firebolt_type_mapping.py),
including the reference's own inline test cases (:364-387)."""

from pyspark.sql import types as T

from firebolt_cdc_lambda_spark.typemap import (
    convert_source_type,
    extract_precision,
    is_type_compatible,
    normalize_type,
)


def test_normalize():
    assert normalize_type("VARCHAR(255)") == "VARCHAR"
    assert normalize_type("DECIMAL(10,2)") == "DECIMAL"
    assert normalize_type("INT UNSIGNED") == "INT UNSIGNED"
    assert normalize_type("int(10) unsigned") == "INT UNSIGNED"
    assert normalize_type("") == "UNKNOWN"


def test_extract_precision():
    assert extract_precision("DECIMAL(10,2)") == (10, 2)
    assert extract_precision("VARCHAR(255)") == (255, None)
    assert extract_precision("INT") is None


def test_reference_inline_cases():
    # mirrors test_conversions() cases (reference :364-387)
    cases = {
        "VARCHAR(255)": (T.StringType(), True),
        "DECIMAL(10,2)": (T.DecimalType(10, 2), True),
        "BIGINT UNSIGNED": (T.DecimalType(20, 0), True),
        "DATETIME": (T.TimestampType(), True),
        "JSON": (T.StringType(), True),
        "GEOMETRY": (None, False),
        "INT": (T.IntegerType(), True),
        "TIMESTAMP": (T.TimestampType(), True),
    }
    for src, (expect_type, expect_safe) in cases.items():
        conv = convert_source_type(src)
        assert conv.spark_type == expect_type, src
        assert conv.is_safe == expect_safe, src
    # unknown type -> STRING fallback, flagged unsafe (reference :292-293)
    conv = convert_source_type("UNKNOWN_TYPE")
    assert conv.spark_type == T.StringType() and not conv.is_safe
    # ARRAY<STRING>: reference requires manual intervention; Spark handles it
    conv = convert_source_type("ARRAY<STRING>")
    assert conv.spark_type == T.ArrayType(T.StringType()) and not conv.is_safe


def test_decimal_precision_cap():
    assert convert_source_type("DECIMAL(65,10)").spark_type == T.DecimalType(38, 10)
    assert convert_source_type("NUMERIC").spark_type == T.DecimalType(38, 10)
    assert convert_source_type("DECIMAL(10)").spark_type == T.DecimalType(10, 0)
    assert convert_source_type("MONEY").spark_type == T.DecimalType(19, 4)


def test_unsigned_widening():
    assert convert_source_type("INT UNSIGNED").spark_type == T.LongType()
    assert convert_source_type("UINT64").spark_type == T.DecimalType(20, 0)
    assert convert_source_type("TINYINT UNSIGNED").spark_type == T.IntegerType()


def test_compatibility_families():
    assert is_type_compatible(T.IntegerType(), T.ShortType())
    assert is_type_compatible(T.FloatType(), T.DoubleType())
    assert not is_type_compatible(T.IntegerType(), T.LongType())  # distinct families (:312-313)
    assert not is_type_compatible(T.StringType(), T.IntegerType())


def test_full_map_families():
    """Exhaustive family sweep mirroring the reference's ~100-entry map
    (mysql_firebolt_type_mapping.py:22-162)."""
    strings = ["CHAR(4)", "VARCHAR(255)", "TINYTEXT", "TEXT", "MEDIUMTEXT",
               "LONGTEXT", "STRING", "BINARY", "VARBINARY(16)", "TINYBLOB",
               "BLOB", "MEDIUMBLOB", "LONGBLOB", "BYTEA", "ENUM", "SET",
               "JSON", "JSONB", "UUID", "INET", "CIDR", "MACADDR", "XML",
               "CLOB", "NCLOB", "NCHAR", "NVARCHAR(50)", "NTEXT", "IMAGE",
               "TIME", "TIMETZ", "INTERVAL"]
    for t in strings:
        c = convert_source_type(t)
        assert c.spark_type == T.StringType() and c.is_safe, t
    ints = ["TINYINT", "SMALLINT", "MEDIUMINT", "INT", "INTEGER", "INT8",
            "INT16", "INT32", "UINT8", "UINT16", "YEAR", "SERIAL",
            "SMALLSERIAL", "TINYINT UNSIGNED", "SMALLINT UNSIGNED",
            "MEDIUMINT UNSIGNED"]
    for t in ints:
        assert convert_source_type(t).spark_type == T.IntegerType(), t
    bigints = ["BIGINT", "INT64", "INT UNSIGNED", "INTEGER UNSIGNED",
               "UINT32", "BIGSERIAL"]
    for t in bigints:
        assert convert_source_type(t).spark_type == T.LongType(), t
    for t in ["BIT", "BOOL", "BOOLEAN"]:
        assert convert_source_type(t).spark_type == T.BooleanType(), t
    for t in ["FLOAT", "FLOAT4", "REAL", "FLOAT32"]:
        assert convert_source_type(t).spark_type == T.FloatType(), t
    for t in ["FLOAT8", "DOUBLE", "DOUBLE PRECISION", "FLOAT64"]:
        assert convert_source_type(t).spark_type == T.DoubleType(), t
    for t in ["DATE", "DATE32", "DATE64"]:
        assert convert_source_type(t).spark_type == T.DateType(), t
    for t in ["DATETIME", "TIMESTAMP", "TIMESTAMPTZ", "TIMESTAMP_S",
              "TIMESTAMP_MS", "TIMESTAMP_US", "TIMESTAMP_NS"]:
        assert convert_source_type(t).spark_type == T.TimestampType(), t
    spatial = ["GEOMETRY", "POINT", "LINESTRING", "POLYGON", "MULTIPOINT",
               "MULTILINESTRING", "MULTIPOLYGON", "GEOMETRYCOLLECTION",
               "GEOGRAPHY", "STRUCT", "MAP", "ROW", "TUPLE"]
    for t in spatial:
        c = convert_source_type(t)
        assert c.spark_type is None and not c.is_safe, t
    assert convert_source_type("SMALLMONEY").spark_type == T.DecimalType(10, 4)
    for t in ["DEC(12,3)", "FIXED(12,3)", "NUMBER(12,3)"]:
        assert convert_source_type(t).spark_type == T.DecimalType(12, 3), t


def test_decimal_strictness():
    # numeric(38,0) can't be assigned to numeric(20,0)
    # (HOW_TO_FIX_DECIMAL_PRECISION_ERRORS.md:5-12)
    assert is_type_compatible(T.DecimalType(20, 0), T.DecimalType(20, 0))
    assert not is_type_compatible(T.DecimalType(38, 0), T.DecimalType(20, 0))
    assert not is_type_compatible(T.DecimalType(10, 2), T.DecimalType(10, 4))
    assert not is_type_compatible(T.DecimalType(10, 2), T.DoubleType())
