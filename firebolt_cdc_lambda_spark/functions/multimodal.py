"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The reference's type system cannot represent any of this (BLOBs are
flattened to TEXT, mysql_firebolt_type_mapping.py:35-41; complex types
are manual-intervention, :143-147).  For a 100 TB training-data pipeline
this engine treats media as:

    media(id BIGINT, kind STRING, payload BINARY,
          meta STRUCT<width INT, height INT, n_frames INT,
                      sample_rate INT, codec STRING>)

and implements decode / feature-extract / resize / frame-sample as
Arrow-batched pandas transforms over ``mapInPandas`` — the documented
Spark pattern for binary-heavy columns (one Python worker per partition,
columnar Arrow transfer, no per-row pickling).

The actual pixel/audio decoding is STUBBED: the image/audio libraries are
not in this container.  Each stub either raises NotImplementedError
(``strict=True``) or produces a deterministic fake derived from the bytes
(default), so the Spark-side plumbing — schema, batch iteration,
partitioning, output shape — is real and tested end-to-end.

Scale notes: ``mapInPandas`` streams Arrow batches, so peak memory is
one batch (spark.sql.execution.arrow.maxRecordsPerBatch), not one
partition; payloads never pass through the driver; and partition counts
follow the input file splits, so a 100 TB media corpus fans out across
executors with no shuffle at all for the map-only stages.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType([
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_frames", T.IntegerType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("codec", T.StringType()),
])

MEDIA_SCHEMA = T.StructType([
    T.StructField("id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),       # image|audio|video
    T.StructField("payload", T.BinaryType(), False),
    T.StructField("meta", MEDIA_META, True),
])


def _stub_decode(payload: bytes, strict: bool) -> bytes:
    """STUB decoder: no imaging libs in this container.

    strict=True raises (production posture until a real decoder is
    wired); otherwise returns a deterministic pseudo-pixel buffer keyed
    by the payload hash so downstream shapes/values are testable.
    """
    if strict:
        raise NotImplementedError(
            "media decoding requires an imaging library (e.g. Pillow/ffmpeg) "
            "not present in this environment; wire it here")
    return hashlib.sha256(payload).digest()


def make_media_table(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic synthetic media fixture (no external data needed)."""
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        payload = (f"media-{i}".encode() * (8 + i % 5))
        meta = {
            "width": 64 + (i % 4) * 32 if kind != "audio" else None,
            "height": 64 + (i % 3) * 32 if kind != "audio" else None,
            "n_frames": 1 if kind == "image" else 24 + i % 10,
            "sample_rate": 16000 if kind == "audio" else None,
            "codec": {"image": "png", "audio": "pcm", "video": "h264"}[kind],
        }
        rows.append((i, kind, payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_image_batch(df: DataFrame, strict: bool = False) -> DataFrame:
    """payload -> decoded buffer + dims; mapInPandas, Arrow-batched."""
    out_schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("decoded", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_stub_decode(p, strict) for p in pdf["payload"]]
            meta = pdf["meta"]
            yield pd.DataFrame({
                "id": pdf["id"],
                "decoded": decoded,
                "width": [m["width"] if m is not None else None for m in meta],
                "height": [m["height"] if m is not None else None for m in meta],
            })

    return df.where(F.col("kind") == "image").mapInPandas(fn, out_schema)


def extract_image_features(df: DataFrame, dim: int = 16,
                           strict: bool = False) -> DataFrame:
    """decoded bytes -> fixed-dim float feature vector (stubbed embed)."""
    out_schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for p in pdf["payload"]:
                buf = _stub_decode(p, strict)
                # deterministic fake embedding: normalized byte windows
                feats.append([buf[i % len(buf)] / 255.0 for i in range(dim)])
            yield pd.DataFrame({"id": pdf["id"], "features": feats})

    return df.where(F.col("kind") == "image").mapInPandas(fn, out_schema)


def resize_images(df: DataFrame, width: int, height: int,
                  strict: bool = False) -> DataFrame:
    """Resize: new payload + updated meta (stub keeps bytes, sets dims)."""
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [_stub_decode(p, strict) for p in pdf["payload"]]
            metas = [
                None if m is None else
                {**{k: m[k] for k in ("n_frames", "sample_rate", "codec")},
                 "width": width, "height": height}
                for m in pdf["meta"]
            ]
            yield pd.DataFrame({"id": pdf["id"], "kind": pdf["kind"],
                                "payload": payloads, "meta": metas})

    return df.where(F.col("kind") == "image").mapInPandas(fn, MEDIA_SCHEMA)


def frame_sample(df: DataFrame, every_nth: int = 8,
                 strict: bool = False) -> DataFrame:
    """Video -> one row per sampled frame (fan-out inside mapInPandas)."""
    out_schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for _, row in pdf.iterrows():
                n = (row["meta"]["n_frames"] or 0) if row["meta"] is not None else 0
                buf = _stub_decode(row["payload"], strict)
                for fi in range(0, n, every_nth):
                    ids.append(row["id"])
                    idxs.append(fi)
                    frames.append(buf)       # stub: real impl decodes frame fi
            yield pd.DataFrame({"id": ids, "frame_idx": idxs, "frame": frames})

    return df.where(F.col("kind") == "video").mapInPandas(fn, out_schema)
