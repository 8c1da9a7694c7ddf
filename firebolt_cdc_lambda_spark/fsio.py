"""Hadoop-FileSystem text I/O for driver-side metadata documents.

Every metadata sidecar in this repo (KeyedTable schema/meta, drift
snapshots, drift reports, config backups) must work when the warehouse
root is an object store (s3a://, abfs://, hdfs://) exactly as it does on
a local path — the reference keeps the analogous schema metadata in S3
(lambda_schema_evolution_integration.py:32-68).  These helpers are the
one place that touches the JVM FileSystem API for that.

Driver-side by design: the documents are tiny (KBs) and read/written
once per batch, never per row.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def fs_and_path(spark: SparkSession, p: str):
    """(FileSystem, Path, jvm) for ``p`` under the session's Hadoop conf."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(p)
    return path.getFileSystem(hconf), path, jvm


def exists(spark: SparkSession, p: str) -> bool:
    fs, path, _ = fs_and_path(spark, p)
    return fs.exists(path)


def mkdirs(spark: SparkSession, p: str) -> None:
    fs, path, _ = fs_and_path(spark, p)
    fs.mkdirs(path)


def write_text(spark: SparkSession, p: str, text: str) -> None:
    fs, path, _ = fs_and_path(spark, p)
    out = fs.create(path, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def read_text(spark: SparkSession, p: str) -> str | None:
    """File contents, or None if the file does not exist."""
    fs, path, jvm = fs_and_path(spark, p)
    if not fs.exists(path):
        return None
    stream = fs.open(path)
    try:
        data = bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
    finally:
        stream.close()
    return data.decode("utf-8")


def list_names(spark: SparkSession, p: str) -> list[str]:
    """Leaf names of a directory's children ([] if the dir is missing)."""
    fs, path, _ = fs_and_path(spark, p)
    if not fs.exists(path):
        return []
    return [st.getPath().getName() for st in fs.listStatus(path)]


def list_dirs(spark: SparkSession, p: str) -> list[str]:
    """Leaf names of a directory's sub-DIRECTORIES ([] if missing)."""
    fs, path, _ = fs_and_path(spark, p)
    if not fs.exists(path):
        return []
    return [st.getPath().getName() for st in fs.listStatus(path)
            if st.isDirectory()]
