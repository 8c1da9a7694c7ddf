"""CDC Parquet ingestion: scans, path grammar, file-local ingestion order.

Reference behaviors re-implemented:

* Parquet scan of one file / a glob per batch — ``READ_PARQUET(LOCATION,
  PATTERN)`` (lambda/handler.py:504-510; glob patterns in
  FIX_36_TABLES_SCHEMA.sql:19).  Spark: ``spark.read.parquet(paths...)``;
  Catalyst pushes filters/pruning into the scan for free.
* Path grammar ``fair/{table}/{yyyy}/{mm}/{dd}/{file}.parquet``
  (regex at lambda/handler.py:765-777).
* Full-load files named ``LOAD*`` are skipped by the CDC path
  (lambda/handler.py:781-783).
* ``ingestion_seq`` — the per-file row number capturing Parquet row order
  = binlog order, used as the final dedup tie-breaker
  (lambda/handler.py:521-527, rationale :1-10).  Spark has no
  ``ROW_NUMBER() OVER ()``; a *file-local* row number is built from
  ``input_file_name`` + ``monotonically_increasing_id`` (the id is
  monotone within a partition and partitions of one file follow block
  order, preserving row order per file).
"""

from __future__ import annotations

import re
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.ordering import INGEST_SEQ_COL

#: ``fair/<table>/YYYY/MM/DD/<file>.parquet`` (lambda/handler.py:765-777)
CDC_PATH_RE = re.compile(
    r"^(?:.*/)?fair/([^/]+)/(\d{4})/(\d{2})/(\d{2})/([^/]+\.parquet)$"
)


def parse_cdc_path(file_key: str) -> tuple[str, str, str] | None:
    """-> (table, 'YYYY-MM-DD', filename), or None if not a CDC path."""
    m = CDC_PATH_RE.match(file_key)
    if not m:
        return None
    table, yyyy, mm, dd, filename = m.groups()
    return table, f"{yyyy}-{mm}-{dd}", filename


def is_full_load_file(filename: str) -> bool:
    """DMS full-load files are named LOAD*; the CDC path skips them
    (lambda/handler.py:781-783)."""
    return filename.rsplit("/", 1)[-1].upper().startswith("LOAD")


def with_ingestion_seq(df: DataFrame,
                       assert_file_names: bool = False) -> DataFrame:
    """Add the file-local ``ingestion_seq`` (1-based, per input file).

    The monotonically_increasing_id ordering assumption (block order =
    row order within one file) is load-bearing for the binlog-order
    tie-breaker — and it silently degrades if ``input_file_name()``
    comes back empty (a non-file-backed plan would collapse every row
    into ONE window partition).  ``assert_file_names=True`` (the
    streaming path sets it) turns that silent degradation into a loud
    per-row ``raise_error`` guard on the partition key itself — zero
    extra jobs, zero cost when names are present."""
    name = F.input_file_name()
    if assert_file_names:
        name = F.when(
            name == "",
            F.raise_error(F.lit(
                "ingestion_seq: input_file_name() is empty — the batch is "
                "not file-backed, so the binlog-order tie-breaker would "
                "silently degrade to a single window partition"))
        ).otherwise(name)
    w = Window.partitionBy(name).orderBy(F.monotonically_increasing_id())
    return df.withColumn(INGEST_SEQ_COL, F.row_number().over(w))


def read_cdc_files(
    spark: SparkSession,
    paths: str | Sequence[str],
    add_ingestion_seq: bool = True,
) -> DataFrame:
    """Read one or more CDC Parquet files/globs as a staging batch."""
    if isinstance(paths, str):
        paths = [paths]
    df = spark.read.parquet(*paths)
    if add_ingestion_seq:
        df = with_ingestion_seq(df)
    return df
