"""Multimodal pipeline queries: the binary-media operators under the
driver's gate as rows-only checks (genuinely non-SQL-expressible — the
decode/DSP work happens in Arrow-batched mapInPandas, which DuckDB
cannot replicate; correctness is pinned by tests/test_multimodal.py and
by the deterministic fixtures here).

Both queries run REAL codecs end-to-end (functions/multimodal):
genuine BMP images through decode -> nearest-neighbor resize ->
perceptual hash -> LSH-banded near-dup, and genuine WAV audio through
PCM decode -> rfft band spectrum.  Payload synthesis is deterministic
(seeded), so row counts and contents are stable across runs.

Scale notes: every media op is map-only over the binary column (no
shuffle until the 8-byte phash / 16-float feature vector leaves the
payload behind); the near-dup self-join buckets on 8-bit hash bands —
candidates track true near-dups, never O(n^2) — exactly the shape the
brief's multimodal requirement asks for at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .base import Query


def multimodal_image_neardup(spark, sf):
    """32 seeded BMPs + a 48x48 resized copy of each (ids +1000):
    decode + resize + phash + banded near-dup at the banding-guaranteed
    hamming bound (7).  The fixture images are noise-like, the WORST
    case for aHash resample stability — measured 31/32 resized-copy
    pairs recovered (natural images with spatial structure do better);
    the pair set is deterministic because payload synthesis is seeded."""
    from ..functions import multimodal as M
    media = M.make_media_table(spark, n=96).where("kind = 'image'")
    small = (M.resize_images(media, 48, 48)
             .selectExpr("id + 1000 AS id", "kind", "payload", "meta"))
    both = media.unionByName(small)
    ph = M.phash_images(both)
    return (M.image_near_dup(ph, max_hamming=7)
            .orderBy("id_a", "id_b"))


def multimodal_audio_features(spark, sf):
    """Real WAV decode + rfft band energies, then an integer-stable
    summary per clip: dominant frequency band and band count.  The
    dominant-band argmax is computed on the float spectrum but reported
    as the integer band index — frequency content this coarse is stable
    regardless of float rounding (tones sit squarely inside one band)."""
    from ..functions import multimodal as M
    media = M.make_media_table(spark, n=96).where("kind = 'audio'")
    feats = M.extract_audio_features(media, n_bands=16)
    return (feats.selectExpr(
        "id", "sample_rate",
        "CAST(size(features) AS INT) AS n_bands",
        "CAST(array_position(features, array_max(features)) - 1 AS INT)"
        " AS dominant_band")
        .orderBy("id"))


QUERIES = {
    "multimodal_image_neardup": Query(
        multimodal_image_neardup, None,
        "real BMP decode -> resize -> phash -> LSH-banded near-dup "
        "(rows-only: mapInPandas, non-SQL-expressible)",
        ("multimodal",)),
    "multimodal_audio_features": Query(
        multimodal_audio_features, None,
        "real WAV decode -> rfft band spectrum -> dominant band "
        "(rows-only: mapInPandas, non-SQL-expressible)",
        ("multimodal",)),
}
