"""Multimodal plumbing: schema, Arrow batch shapes, fan-out, strict-stub
behavior.  Decoding itself is stubbed (no imaging libs here); what's
under test is the real Spark side."""

import pytest
from pyspark.sql import functions as F

from firebolt_cdc_lambda_spark.functions.multimodal import (
    MEDIA_SCHEMA,
    decode_image_batch,
    extract_image_features,
    frame_sample,
    make_media_table,
    resize_images,
)


@pytest.fixture(scope="module")
def media(spark):
    return make_media_table(spark, n=30).repartition(4).cache()


def test_media_table_schema(media):
    assert media.schema == MEDIA_SCHEMA
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_decode_images(media):
    out = decode_image_batch(media)
    rows = out.collect()
    n_images = media.where("kind = 'image'").count()
    assert len(rows) == n_images
    for r in rows:
        assert isinstance(r["decoded"], (bytes, bytearray)) and len(r["decoded"]) == 32
        assert r["width"] is not None and r["height"] is not None


def test_decode_deterministic(media):
    a = {r["id"]: bytes(r["decoded"]) for r in decode_image_batch(media).collect()}
    b = {r["id"]: bytes(r["decoded"]) for r in decode_image_batch(media).collect()}
    assert a == b


def test_strict_mode_raises(media):
    with pytest.raises(Exception) as exc:
        decode_image_batch(media, strict=True).collect()
    assert "NotImplementedError" in str(exc.value) or isinstance(
        exc.value, NotImplementedError)


def test_feature_extraction_shape(media):
    out = extract_image_features(media, dim=16)
    rows = out.collect()
    assert all(len(r["features"]) == 16 for r in rows)
    assert all(0.0 <= v <= 1.0 for r in rows for v in r["features"])


def test_resize_updates_meta_keeps_schema(media):
    out = resize_images(media, 224, 224)
    assert out.schema == MEDIA_SCHEMA
    for r in out.collect():
        assert r["meta"]["width"] == 224 and r["meta"]["height"] == 224
        assert r["kind"] == "image"


def test_frame_sample_fanout(media):
    out = frame_sample(media, every_nth=8)
    per_video = (out.groupBy("id").agg(F.count(F.lit(1)).alias("n"),
                                       F.min("frame_idx").alias("mn"))
                 .collect())
    metas = {r["id"]: r["meta"]["n_frames"]
             for r in media.where("kind = 'video'").collect()}
    assert {r["id"] for r in per_video} == set(metas)
    for r in per_video:
        expect = (metas[r["id"]] + 7) // 8
        assert r["n"] == expect and r["mn"] == 0
