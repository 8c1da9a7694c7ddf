"""Multimodal plumbing: schema, Arrow batch shapes, fan-out, strict-stub
behavior.  Pixel decoding is stubbed (no imaging libs here); the AUDIO
path is fully real — WAV payloads are genuine RIFF files, decoded with
stdlib wave + numpy inside mapInPandas."""

import math
import wave

import pytest
from pyspark.sql import functions as F

from firebolt_cdc_lambda_spark.functions.multimodal import (
    MEDIA_SCHEMA,
    _decode_bmp,
    decode_audio_batch,
    decode_image_batch,
    extract_audio_features,
    extract_image_features,
    frame_sample,
    image_near_dup,
    make_bmp,
    make_media_table,
    make_wav,
    phash_images,
    resize_images,
)


@pytest.fixture(scope="module")
def media(spark):
    return make_media_table(spark, n=30).repartition(4).cache()


def test_media_table_schema(media):
    assert media.schema == MEDIA_SCHEMA
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_decode_images_real_pixels(media):
    """Image payloads are genuine BMPs: decode yields raw RGB of exactly
    width*height*3 bytes, dims parsed from the BMP header itself."""
    out = decode_image_batch(media)
    rows = out.collect()
    metas = {r["id"]: r["meta"] for r in media.where("kind = 'image'").collect()}
    assert len(rows) == len(metas) > 0
    for r in rows:
        m = metas[r["id"]]
        assert r["width"] == m["width"] and r["height"] == m["height"]
        assert len(r["decoded"]) == r["width"] * r["height"] * 3


def test_bmp_roundtrip_exact():
    """encode->decode is the identity on pixels (real codec, not a fake)."""
    import numpy as np
    rgb = np.arange(37 * 23 * 3, dtype=np.uint32).reshape(23, 37, 3) % 256
    payload = make_bmp(37, 23, seed=5)
    assert payload[:2] == b"BM"
    arr = _decode_bmp(payload)
    assert arr.shape == (23, 37, 3)
    # row padding: 37*3=111 pad to 112 — exercised by the odd width
    from firebolt_cdc_lambda_spark.functions.multimodal import encode_bmp
    again = _decode_bmp(encode_bmp(arr))
    assert (again == arr).all()
    assert (_decode_bmp(make_bmp(37, 23, seed=5)) == arr).all()


def test_decode_deterministic(media):
    a = {r["id"]: bytes(r["decoded"]) for r in decode_image_batch(media).collect()}
    b = {r["id"]: bytes(r["decoded"]) for r in decode_image_batch(media).collect()}
    assert a == b


def test_strict_mode_raises(spark):
    opaque = make_media_table(spark, n=30, real_images=False)
    with pytest.raises(Exception) as exc:
        decode_image_batch(opaque, strict=True).collect()
    assert "NotImplementedError" in str(exc.value) or isinstance(
        exc.value, NotImplementedError)


def test_feature_extraction_shape(media):
    out = extract_image_features(media, dim=16)
    rows = out.collect()
    assert all(len(r["features"]) == 16 for r in rows)
    assert all(0.0 <= v <= 1.0 for r in rows for v in r["features"])


def test_resize_real_pixels(media):
    out = resize_images(media, 224, 224)
    assert out.schema == MEDIA_SCHEMA
    for r in out.collect():
        assert r["meta"]["width"] == 224 and r["meta"]["height"] == 224
        assert r["kind"] == "image"
        arr = _decode_bmp(bytes(r["payload"]))  # re-encoded valid BMP
        assert arr.shape == (224, 224, 3)


def test_phash_and_near_dup(spark):
    """Exact dups hash identically; a lightly-perturbed copy lands within
    hamming 4; banded join finds exactly the planted pairs."""
    import numpy as np
    base = _decode_bmp(make_bmp(64, 64, seed=1))
    perturbed = base.copy()
    perturbed[:2, :2] = 0                      # tiny corruption
    rows = [
        (0, "image", make_bmp(64, 64, seed=1), None),
        (1, "image", make_bmp(64, 64, seed=1), None),   # exact dup of 0
        (2, "image", __import__(
            "firebolt_cdc_lambda_spark.functions.multimodal",
            fromlist=["encode_bmp"]).encode_bmp(perturbed), None),
        (3, "image", make_bmp(64, 64, seed=77), None),  # unrelated
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    ph = phash_images(df).cache()
    h = {r["id"]: r["phash"] for r in ph.collect()}
    assert h[0] == h[1]
    assert bin(h[0] ^ h[2]).count("1") <= 4
    assert bin(h[0] ^ h[3]).count("1") > 4
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in image_near_dup(ph, max_hamming=4).collect()}
    assert pairs[(0, 1)] == 0
    assert (0, 2) in pairs and (1, 2) in pairs
    assert not any(3 in p for p in pairs)


def test_image_features_real_grid(media):
    """BMP features are the block-mean grayscale grid — recomputing the
    grid from the decoded pixels must reproduce them exactly."""
    import numpy as np
    from firebolt_cdc_lambda_spark.functions.multimodal import _gray_grid
    feats = {r["id"]: r["features"]
             for r in extract_image_features(media, dim=16).collect()}
    for r in media.where("kind = 'image'").collect():
        arr = _decode_bmp(bytes(r["payload"]))
        want = _gray_grid(arr, 4).ravel()
        got = np.array(feats[r["id"]], dtype=np.float64)
        assert np.allclose(got, want, atol=1e-6)


def test_make_wav_is_real_riff():
    import io
    payload = make_wav(440.0, duration_s=0.1, sample_rate=8000)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    with wave.open(io.BytesIO(payload), "rb") as w:
        assert w.getframerate() == 8000
        assert w.getnchannels() == 1
        assert w.getnframes() == 800


def test_decode_audio_real(media):
    rows = decode_audio_batch(media).collect()
    n_audio = media.where("kind = 'audio'").count()
    assert len(rows) == n_audio > 0
    for r in rows:
        assert r["sample_rate"] == 16000
        assert r["n_channels"] == 1
        assert r["n_samples"] == 800          # 0.05 s @ 16 kHz
        assert abs(r["duration_s"] - 0.05) < 1e-9
        # 0.5-amplitude sine -> rms ~ 0.5/sqrt(2)
        assert abs(r["rms"] - 0.5 / math.sqrt(2)) < 0.01


def test_audio_features_band_peak(media):
    """The spectral peak must land in the band containing the tone."""
    n_bands = 16
    feats = {r["id"]: r["features"]
             for r in extract_audio_features(media, n_bands=n_bands).collect()}
    assert feats and all(len(v) == n_bands for v in feats.values())
    import numpy as np
    # rfft of 800 samples @16k: bin width 20 Hz, 401 bins; band k holds
    # the bins np.array_split assigns it (first band is one bin longer)
    bin_to_band = np.concatenate(
        [np.full(len(b), k) for k, b in
         enumerate(np.array_split(np.arange(401), n_bands))])
    for id_, v in feats.items():
        freq = 200.0 + 50.0 * (id_ % 8)       # the fixture's tone
        assert v.index(max(v)) == bin_to_band[int(round(freq / 20.0))]


def test_audio_features_deterministic(media):
    a = {r["id"]: r["features"] for r in extract_audio_features(media).collect()}
    b = {r["id"]: r["features"] for r in extract_audio_features(media).collect()}
    assert a == b


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


# -- rawseq: the real multi-frame video container --------------------------
def test_rawseq_roundtrip_and_truncation():
    import pytest as _pytest
    from firebolt_cdc_lambda_spark.functions.multimodal import (
        decode_rawseq, encode_rawseq, make_bmp)
    frames = [make_bmp(16, 12, seed=s) for s in (3, 4, 5)]
    payload = encode_rawseq(frames)
    assert decode_rawseq(payload) == frames
    assert decode_rawseq(b"nope" + payload) is None     # not a container
    with _pytest.raises(ValueError):                     # corruption is loud
        decode_rawseq(payload[:-5])
    for cut in (4, 5, 7):                                # count header cut off
        with _pytest.raises(ValueError, match="count header"):
            decode_rawseq(payload[:cut])


def test_frame_sample_yields_real_decodable_frames(media, spark):
    """Sampled frames are EXACT per-frame bytes: each is a genuine BMP
    that the still-image decoder parses, and frame fi of the video with
    base seed i*100 is bit-identical to make_bmp(seed=i*100+fi)."""
    from firebolt_cdc_lambda_spark.functions.multimodal import (
        _try_decode_image, make_bmp)
    out = frame_sample(media, every_nth=8).collect()
    assert out
    metas = {r["id"]: r["meta"] for r in media.where("kind = 'video'").collect()}
    for r in out:
        m = metas[r["id"]]
        expect = make_bmp(m["width"], m["height"], seed=r["id"] * 100 + r["frame_idx"])
        assert bytes(r["frame"]) == expect
        arr = _try_decode_image(r["frame"])
        assert arr is not None and arr.shape == (m["height"], m["width"], 3)


def test_frame_sample_stub_path_for_compressed_codecs(spark):
    """real_video=False keeps the documented stub: opaque h264 payloads
    fan out to metadata-counted placeholder frames."""
    from firebolt_cdc_lambda_spark.functions.multimodal import make_media_table
    media = make_media_table(spark, n=12, real_video=False)
    out = frame_sample(media, every_nth=8).collect()
    metas = {r["id"]: r["meta"]["n_frames"]
             for r in media.where("kind = 'video'").collect()}
    got = {}
    for r in out:
        got[r["id"]] = got.get(r["id"], 0) + 1
        assert len(bytes(r["frame"])) == 32      # sha256 placeholder
    assert got == {i: (n + 7) // 8 for i, n in metas.items()}


# -- PNG: the real stdlib-zlib codec --------------------------------------
def test_png_roundtrip_exact():
    from firebolt_cdc_lambda_spark.functions.multimodal import (
        _decode_png, _gradient_rgb, encode_png)
    rgb = _gradient_rgb(37, 23, seed=7)     # non-multiple-of-4 width
    assert (_decode_png(encode_png(rgb)) == rgb).all()


def test_png_all_five_filters_invert():
    """The decoder must invert every scanline filter the spec defines;
    forward-filter rows 0-4 with filters 0-4 by hand and decode."""
    import binascii
    import struct
    import zlib

    import numpy as np

    from firebolt_cdc_lambda_spark.functions.multimodal import (
        PNG_SIG, _decode_png, _gradient_rgb)
    rgb = _gradient_rgb(11, 5, seed=3)
    h, w, bpp = 5, 11, 3
    stride = w * bpp
    flat = rgb.reshape(h, stride).astype(np.int32)
    raw = bytearray()
    for y in range(h):
        ft = y % 5
        cur, prev = flat[y], (flat[y - 1] if y else np.zeros(stride, np.int32))
        line = np.zeros(stride, np.int32)
        for x in range(stride):
            a = int(cur[x - bpp]) if x >= bpp else 0
            b_ = int(prev[x])
            c = int(prev[x - bpp]) if x >= bpp else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b_
            elif ft == 3:
                pred = (a + b_) >> 1
            else:
                q = a + b_ - c
                pa, pb, pc = abs(q - a), abs(q - b_), abs(q - c)
                pred = a if (pa <= pb and pa <= pc) else (b_ if pb <= pc else c)
            line[x] = (int(cur[x]) - pred) & 255
        raw.append(ft)
        raw.extend(line.astype(np.uint8).tobytes())

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", binascii.crc32(tag + data) & 0xFFFFFFFF))

    payload = (PNG_SIG
               + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
               + chunk(b"IDAT", zlib.compress(bytes(raw)))
               + chunk(b"IEND", b""))
    assert (_decode_png(payload) == rgb).all()


def test_png_rgba_drops_alpha():
    import binascii
    import struct
    import zlib

    import numpy as np

    from firebolt_cdc_lambda_spark.functions.multimodal import (
        PNG_SIG, _decode_png, _gradient_rgb)
    rgb = _gradient_rgb(9, 4, seed=1)
    rgba = np.concatenate(
        [rgb, np.full((4, 9, 1), 200, np.uint8)], axis=2)
    raw = b"".join(b"\x00" + rgba[y].tobytes() for y in range(4))

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", binascii.crc32(tag + data) & 0xFFFFFFFF))

    payload = (PNG_SIG
               + chunk(b"IHDR", struct.pack(">IIBBBBB", 9, 4, 8, 6, 0, 0, 0))
               + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    assert (_decode_png(payload) == rgb).all()


def test_png_unsupported_shapes_raise():
    import pytest

    from firebolt_cdc_lambda_spark.functions.multimodal import (
        _decode_png, _gradient_rgb, encode_png)
    png = bytearray(encode_png(_gradient_rgb(8, 8)))
    with pytest.raises(ValueError):
        _decode_png(b"nope" * 4)
    # flip interlace byte inside IHDR (offset: 8 sig + 8 chunk hdr + 12)
    bad = bytearray(png)
    bad[8 + 8 + 12] = 1
    with pytest.raises(ValueError, match="interlace"):
        _decode_png(bytes(bad))


def test_phash_is_codec_independent(spark):
    """The SAME picture as BMP and as PNG must produce the SAME
    perceptual hash — the fingerprint sees pixels, not containers."""
    from firebolt_cdc_lambda_spark.functions.multimodal import (
        MEDIA_SCHEMA, make_bmp, make_png, phash_images)
    rows = []
    for i in range(6):
        rows.append((i, "image", make_bmp(64, 48, seed=i),
                     {"width": 64, "height": 48, "n_frames": 1,
                      "sample_rate": None, "codec": "bmp"}))
        rows.append((100 + i, "image", make_png(64, 48, seed=i),
                     {"width": 64, "height": 48, "n_frames": 1,
                      "sample_rate": None, "codec": "png"}))
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    hashes = {r["id"]: r["phash"] for r in phash_images(df).collect()}
    for i in range(6):
        assert hashes[i] == hashes[100 + i]


def test_decode_image_batch_handles_png(spark):
    from firebolt_cdc_lambda_spark.functions.multimodal import (
        MEDIA_SCHEMA, decode_image_batch, make_png)
    df = spark.createDataFrame(
        [(1, "image", make_png(40, 30, seed=2),
          {"width": 40, "height": 30, "n_frames": 1,
           "sample_rate": None, "codec": "png"})], MEDIA_SCHEMA)
    row = decode_image_batch(df).first()
    assert (row["width"], row["height"]) == (40, 30)
    assert len(row["decoded"]) == 40 * 30 * 3      # real pixels, not a stub
