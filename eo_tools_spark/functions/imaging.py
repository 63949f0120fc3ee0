"""Image codecs + pixel functions (pure numpy + stdlib zlib — no image
libraries exist in this container).

Formats of the engine's image table (BASELINE.json input_hint:
``image_id, bytes, w, h, fmt, caption, phash``):

- ``raw``  — uint8 pixels, C-order, lossless.
- ``png``  — real PNG (public spec): signature, IHDR, IDAT (zlib'd
  scanlines with per-row filter), IEND + CRCs. Encoder emits filter 0
  or 2; decoder reconstructs ALL five standard filter types, so any
  spec-compliant grayscale/RGB 8-bit PNG decodes. Lossless.
- ``qjpg`` — DETERMINISTIC LOSSY STAND-IN for JPEG (clearly marked:
  this container has no libjpeg; the real system would decode JPEG
  here). 6-bit mid-tread quantization of uint8 → max error 2 →
  PSNR ≈ 46 dB, satisfying the ≥40 dB per-row invariant. The Spark
  plumbing (schema, batching, UDF signatures) is identical to a real
  JPEG path.

The reference reads/writes rasters via rasterio windows
(/root/reference/eo_tools/S1/core.py:1086-1092, process.py:1461-1549);
in this engine pixels live in ``bytes`` columns and are decoded per
Arrow batch inside pandas UDFs.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"


# ------------------------------------------------------------------ PNG

def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def png_encode(img: np.ndarray, filter_type: int = 0, level: int = 6) -> bytes:
    """Encode (h,w) grayscale or (h,w,3) RGB uint8 → PNG bytes."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        color_type, nch = 0, 1
        h, w = img.shape
    elif img.ndim == 3 and img.shape[2] == 3:
        color_type, nch = 2, 3
        h, w = img.shape[:2]
    else:
        raise ValueError("expect (h,w) gray or (h,w,3) RGB uint8")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    rows = img.reshape(h, w * nch)
    if filter_type == 0:
        filtered = np.concatenate(
            [np.zeros((h, 1), dtype=np.uint8), rows], axis=1
        ).tobytes()
    elif filter_type == 2:  # up filter — better compression on smooth data
        prev = np.vstack([np.zeros((1, w * nch), np.uint8), rows[:-1]])
        delta = (rows.astype(np.int16) - prev.astype(np.int16)) % 256
        filtered = np.concatenate(
            [np.full((h, 1), 2, dtype=np.uint8), delta.astype(np.uint8)], axis=1
        ).tobytes()
    else:
        raise ValueError("encoder supports filter 0 or 2")
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(filtered, level))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def png_decode(data: bytes) -> np.ndarray:
    """Decode 8-bit grayscale/RGB non-interlaced PNG → uint8 array."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG")
    off = 8
    w = h = None
    color_type = 0
    idat = []
    while off < len(data):
        (length,) = struct.unpack_from(">I", data, off)
        tag = data[off + 4 : off + 8]
        payload = data[off + 8 : off + 8 + length]
        off += 12 + length
        if tag == b"IHDR":
            w, h, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8 or interlace != 0 or color_type not in (0, 2):
                raise ValueError("decoder supports 8-bit gray/RGB non-interlaced")
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
    nch = 1 if color_type == 0 else 3
    raw = zlib.decompress(b"".join(idat))
    stride = w * nch
    mat = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    ftypes = mat[:, 0]
    rows = mat[:, 1:].copy()
    if np.all(ftypes == 2):
        # all-rows "up" filter (what png_encode writes): the sequential
        # cur += prev recurrence is exactly a column-wise uint8
        # cumulative sum — one vectorized accumulate instead of h
        # per-row numpy calls, identical mod-256 arithmetic.
        rows = np.add.accumulate(rows, axis=0, dtype=np.uint8)
        img = rows.reshape(h, w, nch)
        return img[:, :, 0] if nch == 1 else img
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = ftypes[y]
        cur = rows[y]
        if f == 1:  # sub
            for x in range(nch, stride):
                cur[x] = (int(cur[x]) + int(cur[x - nch])) % 256
        elif f == 2:  # up
            cur += prev
        elif f == 3:  # average
            for x in range(stride):
                left = int(cur[x - nch]) if x >= nch else 0
                cur[x] = (int(cur[x]) + (left + int(prev[x])) // 2) % 256
        elif f == 4:  # paeth
            for x in range(stride):
                a = int(cur[x - nch]) if x >= nch else 0
                c = int(prev[x - nch]) if x >= nch else 0
                cur[x] = (int(cur[x]) + int(_paeth(
                    np.uint8(a), prev[x], np.uint8(c)
                ))) % 256
        prev = cur
    img = rows.reshape(h, w, nch)
    return img[:, :, 0] if nch == 1 else img


# ---------------------------------------------------------- raw / qjpg

def raw_encode(img: np.ndarray) -> bytes:
    return np.ascontiguousarray(img, dtype=np.uint8).tobytes()


def raw_decode(data: bytes, w: int, h: int, nch: int = 1) -> np.ndarray:
    arr = np.frombuffer(data, dtype=np.uint8)
    return arr.reshape(h, w) if nch == 1 else arr.reshape(h, w, nch)


QJPG_BITS = 6  # 6-bit quantization → max err 2 → PSNR ≈ 46 dB


def qjpg_encode(img: np.ndarray) -> bytes:
    """Deterministic lossy stand-in for JPEG (STUB for libjpeg — see
    module docstring). Stores the 6-bit plane packed in uint8."""
    q = (np.ascontiguousarray(img, dtype=np.uint8) >> (8 - QJPG_BITS)).astype(np.uint8)
    return q.tobytes()


def qjpg_decode(data: bytes, w: int, h: int, nch: int = 1) -> np.ndarray:
    q = np.frombuffer(data, dtype=np.uint8)
    shift = 8 - QJPG_BITS
    # mid-tread reconstruction
    img = (q << shift) | (1 << (shift - 1))
    img = img.astype(np.uint8)
    return img.reshape(h, w) if nch == 1 else img.reshape(h, w, nch)


def decode_image(data: bytes, fmt: str, w: int, h: int) -> np.ndarray:
    """Dispatch by the table's ``fmt`` column (grayscale payloads)."""
    if fmt == "png":
        return png_decode(bytes(data))
    if fmt == "raw":
        return raw_decode(bytes(data), w, h)
    if fmt == "qjpg":
        return qjpg_decode(bytes(data), w, h)
    if fmt in ("audio", "video"):
        raise NotImplementedError(
            f"{fmt} decode is stubbed: no codec libs in this container; "
            "schema/partitioning/UDF plumbing is real, payload decode is not"
        )
    raise ValueError(f"unknown fmt {fmt!r}")


def encode_image(img: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return png_encode(img, filter_type=2)
    if fmt == "raw":
        return raw_encode(img)
    if fmt == "qjpg":
        return qjpg_encode(img)
    raise ValueError(f"unknown fmt {fmt!r}")


# ------------------------------------------------------------- metrics

def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB for uint8 images (inf if equal)."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 20.0 * np.log10(255.0) - 10.0 * np.log10(mse)


def average_hash(img: np.ndarray, grid: int = 8) -> int:
    """64-bit perceptual average-hash: grid×grid block means vs their
    overall mean (deterministic, no scipy)."""
    h, w = img.shape[:2]
    g = img.astype(np.float64)
    if img.ndim == 3:
        g = g.mean(axis=2)
    ys = (np.arange(grid + 1) * h) // grid
    xs = (np.arange(grid + 1) * w) // grid
    means = np.empty((grid, grid))
    for i in range(grid):
        for j in range(grid):
            means[i, j] = g[ys[i] : ys[i + 1], xs[j] : xs[j + 1]].mean()
    bits = (means > means.mean()).ravel()
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    return val - (1 << 64) if val >= (1 << 63) else val  # signed int64


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    h, w = img.shape[:2]
    yi = (np.arange(out_h) * h) // out_h
    xi = (np.arange(out_w) * w) // out_w
    return img[yi][:, xi]


def resize_bilinear_float(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Float bilinear resize, GDAL pixel-center convention with edge
    clamp (rasterio on-read Resampling.bilinear) — shared core for the
    uint8 thumbnail path below and the DEM upsampling in
    operators/geocode.upsample_dem_tiles."""
    h, w = arr.shape[:2]
    y = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    x = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = np.clip(np.floor(y).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(x).astype(int), 0, w - 1)
    y1, x1 = np.minimum(y0 + 1, h - 1), np.minimum(x0 + 1, w - 1)
    wy = np.clip(y - y0, 0, 1)[:, None]
    wx = np.clip(x - x0, 0, 1)[None, :]
    g = arr.astype(np.float64)
    return (
        g[np.ix_(y0, x0)] * (1 - wy) * (1 - wx)
        + g[np.ix_(y0, x1)] * (1 - wy) * wx
        + g[np.ix_(y1, x0)] * wy * (1 - wx)
        + g[np.ix_(y1, x1)] * wy * wx
    )


def resize_bilinear(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    out = resize_bilinear_float(img, out_h, out_w)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)
