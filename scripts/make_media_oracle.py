"""Pin oracle fixtures for the media driver queries (frame_sample,
audio_stats) — and INDEPENDENTLY verify the package codecs first.

The media table is synthesized deterministically (make_video/make_audio
are pure in (i, seed)), so expected outputs are computable outside
Spark. Crucially, this script does NOT trust the package decoders: it
re-parses every container with its own struct-walk (written straight
from the public RIFF/AVI/WAVE layout, sharing no code with
functions/media.py) and asserts the package decode == the independent
decode == the generator's source arrays, BEFORE writing the fixture.

Run:  python scripts/make_media_oracle.py   (writes dist/oracle/*.parquet)
Idempotent — same bytes every run.
"""

from __future__ import annotations

import hashlib
import os
import struct
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eo_tools_spark.functions.media import (  # noqa: E402
    decode_avi,
    decode_mp4,
    decode_mp4_audio,
    decode_wav,
)
from eo_tools_spark.sources.synthetic import make_audio, make_video  # noqa: E402

N_VIDEO = 40
N_AUDIO = 40
EVERY_N = 2
SEED = 42
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "dist", "oracle"
)


# ------------------------- independent RIFF parsers (no shared code)

def _chunks(b, off, end):
    while off + 8 <= end:
        cid = b[off:off + 4]
        size = int.from_bytes(b[off + 4:off + 8], "little")
        yield cid, off + 8, size
        off += 8 + size + (size & 1)


def independent_avi(b: bytes) -> np.ndarray:
    assert b[:4] == b"RIFF" and b[8:12] == b"AVI "
    w = h = None
    compression = None
    frames = []
    for cid, off, size in _chunks(b, 12, len(b)):
        if cid != b"LIST":
            continue
        kind = b[off:off + 4]
        if kind == b"hdrl":
            for c2, o2, s2 in _chunks(b, off + 4, off + size):
                if c2 == b"avih":
                    w = int.from_bytes(b[o2 + 32:o2 + 36], "little")
                    h = int.from_bytes(b[o2 + 36:o2 + 40], "little")
                elif c2 == b"LIST" and b[o2:o2 + 4] == b"strl":
                    for c3, o3, s3 in _chunks(b, o2 + 4, o2 + s2):
                        if c3 == b"strf":
                            bitcount = int.from_bytes(b[o3 + 14:o3 + 16], "little")
                            compression = int.from_bytes(b[o3 + 16:o3 + 20], "little")
                            assert bitcount == 24
                            assert compression in (0, int.from_bytes(b"MJPG", "little"))
        elif kind == b"movi":
            if compression == int.from_bytes(b"MJPG", "little"):
                # independent MJPG/qjpg reconstruction straight from the
                # documented 6-bit mid-tread law (q*4 + 2), top-down RGB
                for c2, o2, s2 in _chunks(b, off + 4, off + size):
                    if c2 == b"00dc":
                        q = np.frombuffer(b[o2:o2 + s2], dtype=np.uint8)
                        assert s2 == w * h * 3
                        img = (q.astype(np.uint16) * 4 + 2).astype(np.uint8)
                        frames.append(img.reshape(h, w, 3).copy())
                continue
            stride = (w * 3 + 3) // 4 * 4
            for c2, o2, s2 in _chunks(b, off + 4, off + size):
                if c2 == b"00db":
                    raw = np.frombuffer(b[o2:o2 + s2], dtype=np.uint8)
                    rows = raw[: stride * h].reshape(h, stride)[:, : w * 3]
                    bgr_bottom_up = rows.reshape(h, w, 3)
                    frames.append(bgr_bottom_up[::-1, :, ::-1].copy())
    return np.stack(frames)


def independent_wav(b: bytes) -> tuple[int, np.ndarray]:
    assert b[:4] == b"RIFF" and b[8:12] == b"WAVE"
    rate, data = None, None
    for cid, off, size in _chunks(b, 12, len(b)):
        if cid == b"fmt ":
            fmt_tag, ch, rate = struct.unpack("<HHI", b[off:off + 8])
            bits = int.from_bytes(b[off + 14:off + 16], "little")
            assert fmt_tag == 1 and ch == 1 and bits == 16
        elif cid == b"data":
            data = b[off:off + size]
    return rate, np.frombuffer(data, dtype="<i2")


# --------------------- independent ISO BMFF parser (no shared code)

def _boxes(b, lo, hi):
    """(fourcc, payload_lo, payload_hi) over one box level — written
    straight from ISO/IEC 14496-12 §4.2, sharing nothing with
    functions/media.py."""
    out = []
    p = lo
    while p + 8 <= hi:
        sz = int.from_bytes(b[p:p + 4], "big")
        four = b[p + 4:p + 8].decode("latin1")
        body = p + 8
        if sz == 1:
            sz = int.from_bytes(b[p + 8:p + 16], "big")
            body = p + 16
        elif sz == 0:
            sz = hi - p
        out.append((four, body, p + sz))
        p += sz
    return out


def _descend(b, lo, hi, path):
    for name in path:
        hit = [x for x in _boxes(b, lo, hi) if x[0] == name]
        assert hit, f"missing {name}"
        _, lo, hi = hit[0]
    return lo, hi


def independent_mp4(b: bytes) -> np.ndarray:
    assert any(f == "ftyp" for f, _, _ in _boxes(b, 0, len(b)))
    moov = _descend(b, 0, len(b), ["moov"])
    vide = None
    for f, lo, hi in _boxes(b, *moov):
        if f != "trak":
            continue
        mdia = _descend(b, lo, hi, ["mdia"])
        h_lo, _ = _descend(b, *mdia, ["hdlr"])
        if b[h_lo + 8:h_lo + 12] == b"vide":
            vide = mdia
    assert vide is not None, "no video track"
    stbl = _descend(b, *vide, ["minf", "stbl"])

    def table(name):
        lo, hi = _descend(b, *stbl, [name])
        return lo, hi

    sd_lo, _ = table("stsd")
    entry = sd_lo + 8          # first sample entry's box header
    assert b[entry + 4:entry + 8] == b"jpeg", b[entry + 4:entry + 8]
    w = int.from_bytes(b[entry + 32:entry + 34], "big")
    h = int.from_bytes(b[entry + 34:entry + 36], "big")

    sz_lo, _ = table("stsz")
    fixed = int.from_bytes(b[sz_lo + 4:sz_lo + 8], "big")
    n = int.from_bytes(b[sz_lo + 8:sz_lo + 12], "big")
    sizes = (
        [fixed] * n
        if fixed
        else [
            int.from_bytes(b[sz_lo + 12 + 4 * k:sz_lo + 16 + 4 * k], "big")
            for k in range(n)
        ]
    )
    sc_lo, _ = table("stsc")
    n_sc = int.from_bytes(b[sc_lo + 4:sc_lo + 8], "big")
    runs = [
        (
            int.from_bytes(b[sc_lo + 8 + 12 * k:sc_lo + 12 + 12 * k], "big"),
            int.from_bytes(b[sc_lo + 12 + 12 * k:sc_lo + 16 + 12 * k], "big"),
        )
        for k in range(n_sc)
    ]
    co_lo, _ = table("stco")
    n_ch = int.from_bytes(b[co_lo + 4:co_lo + 8], "big")
    chunk_off = [
        int.from_bytes(b[co_lo + 8 + 4 * k:co_lo + 12 + 4 * k], "big")
        for k in range(n_ch)
    ]
    # per-chunk sample count: the stsc run covering that chunk number
    frames = []
    sample = 0
    for ci in range(1, n_ch + 1):
        per = [per for first, per in runs if first <= ci][-1]
        at = chunk_off[ci - 1]
        for _ in range(per):
            if sample >= n:
                break
            payload = b[at:at + sizes[sample]]
            assert len(payload) == w * h * 3
            q = np.frombuffer(payload, dtype=np.uint8)
            img = (q.astype(np.uint16) * 4 + 2).astype(np.uint8)
            frames.append(img.reshape(h, w, 3).copy())
            at += sizes[sample]
            sample += 1
    assert sample == n, (sample, n)
    return np.stack(frames)


def independent_mp4_audio(b: bytes) -> tuple[int, np.ndarray]:
    """'sowt' PCM track: uniform-size samples, chunk-level slicing."""
    moov = _descend(b, 0, len(b), ["moov"])
    soun = None
    for f, lo, hi in _boxes(b, *moov):
        if f != "trak":
            continue
        mdia = _descend(b, lo, hi, ["mdia"])
        h_lo, _ = _descend(b, *mdia, ["hdlr"])
        if b[h_lo + 8:h_lo + 12] == b"soun":
            soun = mdia
    assert soun is not None, "no audio track"
    md_lo, _ = _descend(b, *soun, ["mdhd"])
    rate = int.from_bytes(b[md_lo + 12:md_lo + 16], "big")
    stbl = _descend(b, *soun, ["minf", "stbl"])
    sd_lo, _ = _descend(b, *stbl, ["stsd"])
    entry = sd_lo + 8
    assert b[entry + 4:entry + 8] == b"sowt"
    sz_lo, _ = _descend(b, *stbl, ["stsz"])
    fixed = int.from_bytes(b[sz_lo + 4:sz_lo + 8], "big")
    n = int.from_bytes(b[sz_lo + 8:sz_lo + 12], "big")
    assert fixed == 2, "uniform 2-byte PCM frames expected"
    sc_lo, _ = _descend(b, *stbl, ["stsc"])
    n_sc = int.from_bytes(b[sc_lo + 4:sc_lo + 8], "big")
    runs = [
        (
            int.from_bytes(b[sc_lo + 8 + 12 * k:sc_lo + 12 + 12 * k], "big"),
            int.from_bytes(b[sc_lo + 12 + 12 * k:sc_lo + 16 + 12 * k], "big"),
        )
        for k in range(n_sc)
    ]
    co_lo, _ = _descend(b, *stbl, ["stco"])
    n_ch = int.from_bytes(b[co_lo + 4:co_lo + 8], "big")
    pcm = bytearray()
    done = 0
    for ci in range(1, n_ch + 1):
        per = [per for first, per in runs if first <= ci][-1]
        per = min(per, n - done)
        off = int.from_bytes(b[co_lo + 8 + 4 * (ci - 1):co_lo + 12 + 4 * (ci - 1)], "big")
        pcm += b[off:off + 2 * per]
        done += per
    assert done == n, (done, n)
    return rate, np.frombuffer(bytes(pcm), dtype="<i2")


# ----------------------------------------------------------- fixtures

def build_frame_sample() -> pd.DataFrame:
    out = []
    for i in range(N_VIDEO):
        r = make_video(i, SEED)
        media_id, fmt, payload, src = r[0], r[1], r[2], r[-1]
        if fmt == "mp4":
            pkg = decode_mp4(payload)
            ind = independent_mp4(payload)
        else:
            pkg = decode_avi(payload)
            ind = independent_avi(payload)
        assert np.array_equal(pkg, src), f"package decode != source for {media_id}"
        assert np.array_equal(ind, src), f"independent decode != source for {media_id}"
        for fi in range(0, src.shape[0], EVERY_N):
            f = src[fi]
            out.append(
                (
                    media_id,
                    fi,
                    f.shape[0],
                    f.shape[1],
                    float(int(f.sum())) / f.size,
                    hashlib.md5(f.tobytes()).hexdigest(),
                )
            )
    return pd.DataFrame(
        out, columns=["media_id", "frame_idx", "fh", "fw", "f_mean", "digest"]
    )


def build_audio_stats() -> pd.DataFrame:
    out = []
    for i in range(N_AUDIO):
        r = make_audio(i, SEED)
        media_id, fmt, payload, src = r[0], r[1], r[2], r[-1]
        if fmt == "mp4":
            rate_p, pkg = decode_mp4_audio(payload)
            rate_i, ind = independent_mp4_audio(payload)
        else:
            rate_p, pkg = decode_wav(payload)
            rate_i, ind = independent_wav(payload)
        assert rate_p == rate_i == 8000
        assert np.array_equal(pkg, src) and np.array_equal(ind, src), media_id
        s = src.astype(np.int64)
        out.append(
            (
                media_id,
                8000,
                len(s),
                int(s.sum()),
                int((s * s).sum()),
                int(np.abs(s).max()),
            )
        )
    return pd.DataFrame(
        out, columns=["media_id", "rate", "n_samples", "sum_s", "sum_sq", "peak"]
    )


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    fs = build_frame_sample()
    au = build_audio_stats()
    fs.to_parquet(os.path.join(OUT, f"frame_sample_{N_VIDEO}.parquet"), index=False)
    au.to_parquet(os.path.join(OUT, f"audio_stats_{N_AUDIO}.parquet"), index=False)
    print(f"pinned frame_sample ({len(fs)} rows), audio_stats ({len(au)} rows)")


if __name__ == "__main__":
    main()
