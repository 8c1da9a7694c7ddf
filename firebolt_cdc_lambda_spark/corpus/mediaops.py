"""Multimodal pipeline queries: the binary-media operators under the
driver's gate with FULL hash-matchable oracles.  The decode/DSP work
happens in Arrow-batched mapInPandas, which DuckDB cannot replicate —
but the fixtures are fully deterministic (seeded BMP gradients,
synthesized WAV tones), so each query's expected output is a FIXED
table, expressed as a literal VALUES relation.  The literals were
captured from the Spark pipeline and are independently pinned by
tests/test_multimodal.py's codec-level assertions; any regression in
decode, resize, phash, banding, or the rfft path breaks the value hash.

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


def multimodal_png_neardup(spark, sf):
    """CODEC INDEPENDENCE as an oracle-checked fact: the SAME seeded
    gradient images as multimodal_image_neardup, but PNG-encoded (real
    stdlib-zlib decode: chunk walk + inflate + scanline unfiltering),
    pushed through the identical resize -> phash -> banded near-dup
    pipeline.  Because the perceptual hash sees pixels, not containers,
    the recovered pair set must be EXACTLY the BMP query's — the two
    queries share one literal-VALUES oracle."""
    from ..functions import multimodal as M
    base = M.make_media_table(spark, n=96).where("kind = 'image'")
    ids = [r["id"] for r in base.select("id").collect()]
    rows = []
    for i in ids:
        w = 64 + (i % 4) * 32
        h = 64 + (i % 3) * 32
        rows.append((i, "image", M.make_png(w, h, seed=i),
                     {"width": w, "height": h, "n_frames": 1,
                      "sample_rate": None, "codec": "png"}))
    media = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    small = (M.resize_images(media, 48, 48)
             .selectExpr("id + 1000 AS id", "kind", "payload", "meta"))
    ph = M.phash_images(media.unionByName(small))
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


# Expected outputs as literal VALUES relations (deterministic fixtures
# => fixed tables).  31 of 32 resized-copy pairs survive the hamming<=7
# gate (id 90's noise-like image resamples past the bound — see the
# multimodal_image_neardup docstring); every 16 kHz tone's dominant rfft
# band is fixed by its synthesized frequency.
_IMAGE_NEARDUP_ORACLE = """\
SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
       CAST(hamming AS INTEGER) AS hamming
FROM (VALUES
    (0, 1000, 5), (3, 1003, 6), (6, 1006, 5), (9, 1009, 4),
    (12, 1012, 4), (15, 1015, 5), (18, 1018, 4), (21, 1021, 5),
    (24, 1024, 3), (27, 1027, 6), (30, 1030, 3), (33, 1033, 3),
    (36, 1036, 4), (39, 1039, 3), (42, 1042, 7), (45, 1045, 3),
    (48, 1048, 2), (51, 1051, 4), (54, 1054, 1), (57, 1057, 7),
    (60, 1060, 3), (63, 1063, 7), (66, 1066, 4), (69, 1069, 5),
    (72, 1072, 6), (75, 1075, 5), (78, 1078, 5), (81, 1081, 1),
    (84, 1084, 4), (87, 1087, 0), (93, 1093, 2)
) AS t(id_a, id_b, hamming)
ORDER BY id_a, id_b"""

_AUDIO_FEATURES_ORACLE = """\
SELECT CAST(id AS BIGINT) AS id, CAST(16000 AS INTEGER) AS sample_rate,
       CAST(16 AS INTEGER) AS n_bands, CAST(band AS INTEGER) AS dominant_band
FROM (VALUES
    (1, 0), (4, 0), (7, 1), (10, 0), (13, 0), (16, 0), (19, 0), (22, 0),
    (25, 0), (28, 0), (31, 1), (34, 0), (37, 0), (40, 0), (43, 0), (46, 0),
    (49, 0), (52, 0), (55, 1), (58, 0), (61, 0), (64, 0), (67, 0), (70, 0),
    (73, 0), (76, 0), (79, 1), (82, 0), (85, 0), (88, 0), (91, 0), (94, 0)
) AS t(id, band)
ORDER BY id"""

def multimodal_video_scenes(spark, sf):
    """REAL video demux -> cross-video duplicate-scene detection: 12
    deterministic rawseq videos (24 genuine BMP frames each) whose seed
    ranges overlap, so consecutive videos share bit-identical frames.
    frame_sample slices every 4th frame's exact bytes; scenes are keyed
    by frame md5 (identical frames <=> identical bytes), and the pair
    table counts shared sampled scenes per video pair — expected
    (v, v+1, 4) and (v, v+2, 2) from the seed arithmetic, which the
    literal-VALUES oracle pins.

    Scale: demux + hash are map-only over the payload column; only
    16-byte scene keys reach the join (one shuffle, never payloads)."""
    from ..functions import multimodal as M
    rows = []
    for v in range(12):
        rows.append((v, "video", M.make_rawseq(48, 32, 24, seed=v * 8),
                     {"width": 48, "height": 32, "n_frames": 24,
                      "sample_rate": None, "codec": "rawseq"}))
    media = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    frames = M.frame_sample(media, every_nth=4)
    scenes = frames.selectExpr("id AS video_id", "md5(frame) AS scene")
    a, b = scenes.alias("a"), scenes.alias("b")
    return (a.join(b, "scene")
            .where("a.video_id < b.video_id")
            .groupBy(F.col("a.video_id").alias("video_a"),
                     F.col("b.video_id").alias("video_b"))
            .agg(F.count_distinct("scene").alias("n_shared_scenes"))
            .orderBy("video_a", "video_b"))


# video v samples frame seeds 8v + {0,4,8,12,16,20}; intersecting with
# v+1's sampled seeds gives 4 shared frames, with v+2's gives 2, beyond
# that none — the VALUES below are that arithmetic, verified by the run.
_VIDEO_SCENES_ORACLE = """\
SELECT CAST(video_a AS BIGINT) AS video_a,
       CAST(video_b AS BIGINT) AS video_b,
       CAST(n AS BIGINT) AS n_shared_scenes
FROM (VALUES
    {rows}
) AS t(video_a, video_b, n)
ORDER BY video_a, video_b""".format(rows=", ".join(
    [f"({v}, {v + 1}, 4)" for v in range(11)]
    + [f"({v}, {v + 2}, 2)" for v in range(10)]))


QUERIES = {
    "multimodal_image_neardup": Query(
        multimodal_image_neardup, _IMAGE_NEARDUP_ORACLE,
        "real BMP decode -> resize -> phash -> LSH-banded near-dup "
        "(deterministic fixture => literal VALUES oracle)",
        ("multimodal",)),
    "multimodal_audio_features": Query(
        multimodal_audio_features, _AUDIO_FEATURES_ORACLE,
        "real WAV decode -> rfft band spectrum -> dominant band "
        "(deterministic fixture => literal VALUES oracle)",
        ("multimodal",)),
    # appended at the END of the module dict (gate-composition rule,
    # corpus/__init__.py): new queries must not shift the pinned first 50
    "multimodal_png_neardup": Query(
        multimodal_png_neardup, _IMAGE_NEARDUP_ORACLE,
        "real PNG decode (stdlib zlib + scanline unfiltering) through the "
        "same pipeline — codec-independent phash, shares the BMP oracle",
        ("multimodal",)),
    "multimodal_video_scenes": Query(
        multimodal_video_scenes, _VIDEO_SCENES_ORACLE,
        "real rawseq video demux -> frame-sample -> cross-video shared-"
        "scene pairs (deterministic fixture => literal VALUES oracle)",
        ("multimodal",)),
}
