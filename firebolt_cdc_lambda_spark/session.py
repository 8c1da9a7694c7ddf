"""SparkSession factory with scale-oriented defaults.

The engine is designed for a multi-executor cluster reading ~100 TB; the
local[{N}] session used in tests/bench only changes the master URL, not the
plan shapes.  AQE is on so skewed CDC keys and small post-filter shuffles
are re-planned at runtime; dynamic partition overwrite enables the
bucket-pruned snapshot merge (see operators/merge.py).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))

# local-mode heap: pyspark's default driver memory is 1g, and in local
# mode the driver JVM IS every executor thread — local[32] workers
# sharing a 1g heap is what a real cluster would never look like.  The
# quadratic exact-baseline query (dedup_ngram_jaccard) at sf0.1 was the
# first to actually fall over (task OOM -> shuffle-file loss -> JVM
# exit).  The default is DERIVED from the host's physical memory (1/8,
# clamped to [2g, 16g]) rather than hard-coding the 128 GiB dev box's
# 16g (round-6 advisor): a 16 GiB host importing the library gets 2g,
# this box still gets 16g.  Env-overridable like the rest.
def _default_driver_memory() -> str:
    try:
        total_gib = (os.sysconf("SC_PAGE_SIZE")
                     * os.sysconf("SC_PHYS_PAGES")) / 2**30
    except (ValueError, OSError, AttributeError):
        return "2g"
    return f"{max(2, min(16, int(total_gib // 8)))}g"


DEFAULT_DRIVER_MEMORY = (os.environ.get("SPARK_GRAFT_DRIVER_MEM")
                         or _default_driver_memory())


def get_spark(
    app_name: str = "firebolt-cdc-lambda-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or f"local[{cpus}]"
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # deterministic cross-engine comparisons (DuckDB oracle is tz-naive)
        .config("spark.sql.session.timeZone", "UTC")
        # must be set before the JVM launches — no-op on getOrCreate of
        # an already-running session
        .config("spark.driver.memory", DEFAULT_DRIVER_MEMORY)
        # runtime re-planning: skew joins, coalesced shuffles
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS))
        # Arrow for the (few) pandas-UDF paths
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # bucket-pruned snapshot merge rewrites only affected partitions
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # Partition-directory listing switches from driver-side to a
        # distributed Spark job above this many paths.  The stock
        # default (32) is tuned for object stores; on this engine every
        # bucketed table root / bloom-words dataset has num_buckets
        # (64+) dirs, so EVERY such read paid a 64-task listing job
        # (~0.15 s of pure scheduling) for a listing the driver does in
        # microseconds on a filesystem.  256 keeps the engine's actual
        # local dir counts (64-256 buckets) driver-listed while a
        # production 16k-bucket table on S3 still gets the parallel
        # listing job exactly when it helps.  Env-overridable like the
        # other scale knobs (round 13).
        .config("spark.sql.sources.parallelPartitionDiscovery.threshold",
                os.environ.get("SPARK_GRAFT_PAR_DISCOVERY", "256"))
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
