"""Deterministic synthetic image+caption table (BASELINE.json input_hint
shape) generated DISTRIBUTED — spark.range → mapInPandas, each image
seeded by its own id, so generation scales with executors and produces
identical bytes at any parallelism (the property the two-cluster-size
scaling evidence depends on).

Columns: image_id:string, bytes:binary, w:int, h:int, fmt:string,
caption:string, phash:long  + spatial sidecars lon/lat (hotspot-skewed:
50% of rows in one 1°×1° cell — FIXTURES.md skew scenario) and
footprint WKB quad mimicking burst quads (eo_tools/auxils.py:78-120).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from eo_tools_spark.functions import imaging as IM
from eo_tools_spark.geo.wkb import polygon_to_wkb

IMAGE_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("bytes", BinaryType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("fmt", StringType()),
        StructField("caption", StringType()),
        StructField("phash", LongType()),
        StructField("lon", DoubleType()),
        StructField("lat", DoubleType()),
        StructField("footprint", BinaryType()),
        StructField("pcell", LongType()),
    ]
)

PARTITION_RES = 3  # coarse parent cell used as the storage partition key

_SIZES = [64, 128, 256]
_FMTS = ["png", "raw", "qjpg"]
_WORDS = np.array(
    "scene burst orbit swath tile cell ridge valley coast dune field lake "
    "river city delta plain mesa crater reef glacier".split()
)


def make_image(i: int, seed: int = 42):
    """One deterministic image row — pure function of (i, seed)."""
    rng = np.random.default_rng(np.uint64(seed) * np.uint64(0x9E3779B9) + np.uint64(i))
    w = _SIZES[i % 3]
    h = _SIZES[(i // 3) % 3]
    fmt = _FMTS[i % 3]
    # smooth terrain-like field + noise (compresses like EO imagery)
    yy, xx = np.mgrid[0:h, 0:w]
    a, b, c = rng.uniform(0.02, 0.2, 3)
    img = (
        96.0
        + 80.0 * np.sin(a * xx + c) * np.cos(b * yy)
        + rng.normal(0, 12, (h, w))
    )
    img = np.clip(np.round(img), 0, 255).astype(np.uint8)
    data = IM.encode_image(img, fmt)
    # hotspot skew: even ids inside [10,11]×[40,41]
    if i % 2 == 0:
        lon = 10.0 + (i * 9973 % 1000) / 1000.0
        lat = 40.0 + (i * 7919 % 1000) / 1000.0
    else:
        lon = (i * 9973 % 36000) / 100.0 - 180.0
        lat = (i * 7919 % 17000) / 100.0 - 85.0
    dx, dy, tilt = 0.15, 0.1, 0.02
    fp = polygon_to_wkb(
        [
            (lon - dx, lat - dy),
            (lon + dx, lat - dy + tilt),
            (lon + dx + tilt, lat + dy),
            (lon - dx + tilt, lat + dy - tilt),
        ]
    )
    cap_words = _WORDS[rng.integers(0, len(_WORDS), 6)]
    caption = f"scene {i % 500} " + " ".join(cap_words)
    from eo_tools_spark.geo.cells import cell_of_points

    pcell = int(cell_of_points([lon], [lat], PARTITION_RES)[0])
    return (
        f"img-{i:012d}",
        data,
        w,
        h,
        fmt,
        caption,
        IM.average_hash(img),
        lon,
        lat,
        fp,
        pcell,
        img,
    )


def images_table(spark: SparkSession, n: int, seed: int = 42, partitions: int | None = None) -> DataFrame:
    """Distributed generator: deterministic per-id, independent of
    partitioning/parallelism."""
    rng_df = spark.range(0, n, numPartitions=partitions or spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [make_image(int(i), seed)[:-1] for i in pdf["id"]]
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_SCHEMA.fields])

    return rng_df.mapInPandas(gen, schema=IMAGE_SCHEMA)


# --------------------------------------------------------------- media
# Deterministic audio/video rows carrying REAL container bytes
# (functions/media.py encoders) — the multimodal decode path's input
# (round-4 verdict task 3: de-stubbed frame sampling).

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("fmt", StringType()),
        StructField("bytes", BinaryType()),
        StructField("n_frames", IntegerType()),
        StructField("fh", IntegerType()),
        StructField("fw", IntegerType()),
        StructField("rate", IntegerType()),
        StructField("caption", StringType()),
        # routing column: fmt alone is ambiguous since MP4 carries both
        # media kinds — callers split mixed tables on media_kind before
        # frame_sample/audio_stats (round-6 review finding)
        StructField("media_kind", StringType()),
    ]
)


def make_video(i: int, seed: int = 42):
    """One deterministic video row — pure in (i, seed): a drifting
    gradient + per-frame noise, 4-9 frames, odd/even dims to exercise
    DIB row padding. Container/codec rotates by id: even ``i`` →
    uncompressed-DIB AVI, ``i % 4 == 1`` → MJPG AVI (round-5 verdict
    task 3), ``i % 4 == 3`` → ISO BMFF/MP4 with JPEG-family samples
    (round-6 codec breadth). The returned ground-truth frames are the
    codec's exact reconstruction (lossless identity for DIB, the
    deterministic qjpg quantization for MJPG/MP4), so decode == truth
    holds for all three."""
    from eo_tools_spark.functions.imaging import qjpg_decode, qjpg_encode
    from eo_tools_spark.functions.media import encode_avi, encode_mp4

    rng = np.random.default_rng(
        np.uint64(seed) * np.uint64(0x9E3779B9) + np.uint64(i) * np.uint64(2) + np.uint64(1)
    )
    n = 4 + i % 6
    h = 12 + i % 5          # 12..16 → odd widths hit the 4-byte pad
    w = 15 + (i // 5) % 4
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for t in range(n):
        base = (xx * 7 + yy * 5 + t * 11) % 256
        noise = rng.integers(0, 32, (h, w, 3))
        frames.append(
            np.clip(base[..., None] + noise, 0, 255).astype(np.uint8)
        )
    f = np.stack(frames)
    if i % 2 == 0:
        fmt, payload = "avi", encode_avi(f, fps=10, codec="DIB")
    elif i % 4 == 1:
        fmt, payload = "avi", encode_avi(f, fps=10, codec="MJPG")
    else:
        fmt, payload = "mp4", encode_mp4(f, fps=10, samples_per_chunk=2)
    truth = (
        f
        if i % 2 == 0
        else np.stack([qjpg_decode(qjpg_encode(fr), w, h, 3) for fr in f])
    )
    return (
        f"vid-{i:08d}",
        fmt,
        payload,
        n,
        h,
        w,
        10,
        f"clip {i} of {n} frames",
        "video",
        truth,
    )


def make_audio(i: int, seed: int = 42):
    """One deterministic audio row — pure in (i, seed): two tones +
    noise, PCM16 mono. Container rotates by id: ``i % 3 == 2`` → ISO
    BMFF/MP4 ('sowt' PCM track, round-6 codec breadth), else WAV.
    PCM is lossless in both, so decode == source either way."""
    from eo_tools_spark.functions.media import encode_mp4_audio, encode_wav

    rng = np.random.default_rng(
        np.uint64(seed) * np.uint64(0x9E3779B9) + np.uint64(i) * np.uint64(2)
    )
    rate = 8000
    n = 800 + (i % 7) * 160
    t = np.arange(n) / rate
    f0, f1 = 200 + (i % 10) * 50, 1000 + (i % 5) * 100
    sig = (
        8000 * np.sin(2 * np.pi * f0 * t)
        + 4000 * np.sin(2 * np.pi * f1 * t)
        + rng.normal(0, 400, n)
    )
    s = np.clip(np.round(sig), -32768, 32767).astype(np.int16)
    if i % 3 == 2:
        fmt, payload = "mp4", encode_mp4_audio(s, rate)
    else:
        fmt, payload = "wav", encode_wav(s, rate)
    return (
        f"aud-{i:08d}",
        fmt,
        payload,
        0,
        0,
        0,
        rate,
        f"tone {i} at {f0}hz",
        "audio",
        s,
    )


def media_table(spark: SparkSession, n_video: int, n_audio: int, seed: int = 42) -> DataFrame:
    """Distributed deterministic media table: ids < n_video → video
    rows (DIB-AVI / MJPG-AVI / MP4 rotating by id — see make_video),
    the rest → audio rows (WAV or MP4-PCM — see make_audio) —
    identical bytes at any parallelism."""
    rng_df = spark.range(0, n_video + n_audio)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                r = make_video(i, seed) if i < n_video else make_audio(i - n_video, seed)
                rows.append(r[:-1])
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA.fields])

    return rng_df.mapInPandas(gen, schema=MEDIA_SCHEMA)
