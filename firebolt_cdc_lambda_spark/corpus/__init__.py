"""The query corpus: every operator from SURVEY §2 exposed as a named
(spark_fn, oracle_sql) pair for differential testing against DuckDB.

Each module defines ``QUERIES: dict[str, Query]``; keys are stable names
used by __spark_entry__ and the driver's CORRECTNESS gate.
"""

from .base import Query, load_table
from . import validation, cdc, joins, analytics, textops, simops

ALL_QUERIES: dict[str, Query] = {}
for _m in (validation, cdc, joins, analytics, textops, simops):
    ALL_QUERIES.update(_m.QUERIES)

__all__ = ["Query", "load_table", "ALL_QUERIES"]
