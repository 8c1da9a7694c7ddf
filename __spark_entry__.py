"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship query; ``queries``/``oracle_sql`` expose the
full operator corpus (SURVEY.md §2 + beyond-reference training-data ops)
for the DuckDB differential correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from firebolt_cdc_lambda_spark.corpus import ALL_QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: Q1 pricing summary
    (scan + grouped exact-decimal multi-agg)."""
    return ALL_QUERIES["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in ALL_QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in ALL_QUERIES.items() if q.oracle is not None}
