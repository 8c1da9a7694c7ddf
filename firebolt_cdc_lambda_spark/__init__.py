"""firebolt_cdc_lambda_spark — a PySpark-native CDC + analytics engine.

A from-scratch re-implementation of the query and data-processing
capabilities of the reference system ``asimrout-eng/firebolt-cdc-lambda``
(an AWS-Lambda-orchestrated, Firebolt-executed CDC pipeline), re-expressed
Spark-first:

* CDC ingestion: Parquet micro-batches -> window-function deduplication
  (5-level deterministic ordering cascade) -> keyed MERGE (upsert+delete)
  into a bucketed snapshot table, with additive schema evolution and a
  strict decimal-precision gate.  See ``operators/`` and ``pipeline.py``.
* Structured Streaming wrapper with checkpoint-based exactly-once file
  processing (replaces the reference's ``cdc_processed_files`` ledger).
  See ``streaming/``.
* The reference's 18-query validation corpus plus analytic queries as
  native DataFrame plans with DuckDB-oracle SQL.  See ``corpus/``.
* Large-scale training-data operators (exact/MinHash-LSH/SimHash dedup,
  ANN similarity search, text quality analysis) that go beyond the
  reference.  See ``functions/`` and ``corpus/``.

Everything here is built only on the public Apache Spark API.
"""

__version__ = "0.1.0"
