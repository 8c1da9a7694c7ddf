"""File-processing ledger — observability analogue of ``cdc_processed_files``.

The reference uses a metadata table for file-level exactly-once
(lambda/handler.py:664-703: check before work, INSERT
completed/failed after; statuses 'completed'/'batch_processed'/'failed').
In the Spark engine, exactly-once is the Structured Streaming file-source
checkpoint's job; this ledger is kept for *observability and batch-mode
idempotency* (re-running a batch reload skips completed files), plus the
probabilistic 30-day GC (AUTOMATIC_CLEANUP.md:10-63).
"""

from __future__ import annotations

import datetime as _dt
import random

from pyspark.sql import Row, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

LEDGER_SCHEMA = T.StructType([
    T.StructField("file_key", T.StringType(), False),
    T.StructField("status", T.StringType(), False),
    T.StructField("error_message", T.StringType(), True),
    T.StructField("processed_at", T.TimestampType(), False),
])

COMPLETED_STATUSES = ("completed", "batch_processed")


class FileLedger:
    def __init__(self, spark: SparkSession, path: str,
                 cleanup_probability: float = 0.01, days_to_keep: int = 30):
        self.spark = spark
        self.path = path
        self.cleanup_probability = cleanup_probability
        self.days_to_keep = days_to_keep

    def _read(self):
        from pyspark.errors import AnalysisException
        try:
            return self.spark.read.schema(LEDGER_SCHEMA).parquet(self.path)
        except AnalysisException as exc:
            # only a verifiably-absent ledger is "empty"; a real read
            # error re-raises (reading it as empty would answer
            # is_processed=False and replay files — harmless only
            # because merges are idempotent, but the error belongs to
            # the caller).  Same contract as KeyedTable._read_raw.
            if exc.getErrorClass() not in ("PATH_NOT_FOUND",
                                           "UNABLE_TO_INFER_SCHEMA"):
                raise
            return self.spark.createDataFrame([], LEDGER_SCHEMA)

    def _rewrite_kept(self, kept) -> None:
        """Replace the ledger with ``kept`` via temp-dir-and-swap (the
        ``KeyedTable.rewrite`` shape): write the survivors to a sibling
        temp dir, then delete-old + rename-in.  The old cache→count→
        overwrite-in-place pattern could lose the ENTIRE ledger if an
        executor was lost mid-overwrite (recomputation re-reads source
        files the overwrite already deleted); with the swap, the only
        crash window (between delete and rename) leaves the ledger
        verifiably absent — files replay as idempotent no-ops, never a
        partial recomputation."""
        tmp = f"{self.path}__tmp"
        kept.write.mode("overwrite").parquet(tmp)
        jvm = self.spark._jvm
        hconf = self.spark._jsc.hadoopConfiguration()
        p_old = jvm.org.apache.hadoop.fs.Path(self.path)
        p_tmp = jvm.org.apache.hadoop.fs.Path(tmp)
        fs = p_old.getFileSystem(hconf)
        if fs.exists(p_old):
            fs.delete(p_old, True)
        fs.rename(p_tmp, p_old)

    def is_processed(self, file_key: str) -> bool:
        """Idempotency check (lambda/handler.py:664-675): completed or
        batch_processed ⇒ skip."""
        return bool(
            self._read()
            .where((F.col("file_key") == file_key)
                   & F.col("status").isin(*COMPLETED_STATUSES))
            .limit(1)
            .take(1)
        )

    def record(self, file_key: str, status: str, error_message: str | None = None) -> None:
        """Append one ledger row (lambda/handler.py:679-703).  Error text
        truncated to 500 chars like the reference (:694) — no quote
        escaping needed, writes are parameterized by construction."""
        if error_message:
            error_message = error_message[:500]
        row = Row(file_key=file_key, status=status, error_message=error_message,
                  processed_at=_dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None))
        (self.spark.createDataFrame([row], LEDGER_SCHEMA)
         .write.mode("append").parquet(self.path))
        self.maybe_cleanup()

    def forget(self, file_keys=None, prefix: str | None = None) -> int:
        """Incident tool: UN-mark files so they re-process — the ledger
        half of a rollback (``KeyedTable.restore`` re-points the table;
        this re-opens the window so ``process_file`` re-lands the
        corrected files instead of answering ``already_processed``).
        Drops every row — any status — for the explicit ``file_keys``
        and/or every key under ``prefix`` (the natural incident shape:
        one bad day-dir, e.g. ``fair/orders/2024/01/05/``).  Returns
        the number of rows dropped; 0 skips the rewrite entirely.

        Rewrites via ``_rewrite_kept``'s temp-dir-and-swap; the ledger
        is observability + batch idempotency and merges are idempotent,
        so even the swap's absent-window degrades safe (files replay as
        no-ops), never wrong."""
        if file_keys is None and prefix is None:
            raise ValueError(
                "forget() needs file_keys and/or prefix (to drop the "
                "WHOLE ledger, delete its directory)")
        if isinstance(file_keys, str):
            # the natural incident call passes ONE key (process_file
            # takes a single str); list("one/path") would silently
            # explode it into per-character keys matching nothing
            file_keys = [file_keys]
        if prefix == "":
            # every key startswith("") — the whole-ledger drop the
            # error above routes to an explicit directory delete
            raise ValueError("empty prefix would forget EVERY file; "
                             "to drop the whole ledger, delete its "
                             "directory")
        drop = F.lit(False)
        if file_keys is not None:
            drop = drop | F.col("file_key").isin(list(file_keys))
        if prefix is not None:
            drop = drop | F.col("file_key").startswith(prefix)
        df = self._read()
        n = df.where(drop).count()
        if n == 0:
            return 0
        self._rewrite_kept(df.where(~drop))
        return n

    def maybe_cleanup(self, force: bool = False) -> None:
        """Probabilistic GC: with p=1% drop entries older than 30 days
        (AUTOMATIC_CLEANUP.md:10-63)."""
        if not force and random.random() >= self.cleanup_probability:
            return
        cutoff = _dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None) - _dt.timedelta(
            days=self.days_to_keep)
        self._rewrite_kept(
            self._read().where(F.col("processed_at") >= F.lit(cutoff)))
