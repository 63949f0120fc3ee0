"""SLC burst ingestion operators: window read, valid-sample masking,
radiometric calibration, deramp/reramp phase, amplitude/phase projections.

Reference semantics pinned:
- window addressing: burst window first_line = (burst_idx - min_burst) ·
  lines_per_burst (partial re-base, /root/reference/eo_tools/S1/core.py:704;
  tests/test_s1_core.py:60-76: burst 4 of min_burst 3 → first_line 1500).
- valid mask: per line, samples outside [firstValidSample,
  lastValidSample] → NaN+1jNaN; lines with -1 fully NaN (core.py:716-725).
- calibration: beta = scalar constant (fixture 237.0); sigma = bilinear
  grid interpolation over (cal lines, cal pixels); applied as arr /= cal
  (core.py:652-679, process.py:2348-2354; exact 2×3 identity fixture
  tests/test_s1_core.py:170-199).
- projections: amplitude |z|, phase angle(z), complex→(re,im)
  (process.py:1611, 1526; core.py:971-983).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def window_first_line(burst_idx: int, min_burst: int, lines_per_burst: int) -> int:
    """Partial-product re-based window offset (core.py:704)."""
    return (burst_idx - min_burst) * lines_per_burst


def read_window(raster: np.ndarray, first_line: int, n_lines: int) -> np.ndarray:
    """Window read of a line range (read_chunk, core.py:1086-1092)."""
    return raster[first_line : first_line + n_lines]


def apply_valid_mask(
    arr: np.ndarray, first_valid: np.ndarray, last_valid: np.ndarray
) -> np.ndarray:
    """NaN-out invalid samples, vectorized over all lines at once
    (replaces the reference's per-line loop, same semantics)."""
    out = arr.astype(np.complex64, copy=True)
    naz, nrg = out.shape
    fv = np.asarray(first_valid)[:naz]
    lv = np.asarray(last_valid)[:naz]
    cols = np.arange(nrg)[None, :]
    bad_line = (fv < 0)[:, None]
    bad = bad_line | (cols < fv[:, None]) | (cols > lv[:, None])
    out[bad] = np.nan + 1j * np.nan
    return out


def sigma_calibration_grid(
    cal_lines: np.ndarray,
    cal_pixels: np.ndarray,
    cal_values: np.ndarray,
    first_line: int,
    naz: int,
    nrg: int,
) -> np.ndarray:
    """Bilinear interpolation of the calibration grid onto the burst
    grid — RegularGridInterpolator(method='linear') semantics without
    scipy (core.py:659-672)."""
    rows = np.asarray(cal_lines, dtype=np.float64)
    cols = np.asarray(cal_pixels, dtype=np.float64)
    G = np.asarray(cal_values, dtype=np.float64)
    az = np.arange(first_line, first_line + naz, dtype=np.float64)
    rg = np.arange(nrg, dtype=np.float64)

    def interp1_idx(grid, q):
        i1 = np.clip(np.searchsorted(grid, q, side="right"), 1, len(grid) - 1)
        i0 = i1 - 1
        denom = grid[i1] - grid[i0]
        f = np.where(denom > 0, (q - grid[i0]) / np.where(denom == 0, 1, denom), 0.0)
        return i0, i1, f

    r0, r1, fr = interp1_idx(rows, az)
    c0, c1, fc = interp1_idx(cols, rg)
    top = G[np.ix_(r0, c0)] * (1 - fc)[None, :] + G[np.ix_(r0, c1)] * fc[None, :]
    bot = G[np.ix_(r1, c0)] * (1 - fc)[None, :] + G[np.ix_(r1, c1)] * fc[None, :]
    return top * (1 - fr)[:, None] + bot * fr[:, None]


def calibrate(arr: np.ndarray, cal_fac) -> np.ndarray:
    """arr / cal (process.py:2353-2354)."""
    return arr / cal_fac


def amplitude(z: np.ndarray) -> np.ndarray:
    return np.abs(z)


def phase(z: np.ndarray) -> np.ndarray:
    return np.angle(z)


def s2_reflectance(dn: np.ndarray, offset: float, quant: float, baseline_ge_4: bool) -> np.ndarray:
    """S2 DN → reflectance: (DN + offset)/QV clipped ≥ 0, float32;
    offset applies only for processing baseline ≥ 4
    (/root/reference/eo_tools/S2.py:198-202, offset parse S2.py:77-88)."""
    off = offset if baseline_ge_4 else 0.0
    return np.clip((dn + off) / quant, 0, None).astype(np.float32)


# --------------------------------------------------------- deramp math

def deramp_phase(
    az_idx: np.ndarray,
    rg_idx: np.ndarray,
    kt: np.ndarray,
    eta_ref: np.ndarray,
    azimuth_time_interval: float,
) -> np.ndarray:
    """Deramp phase φ(az, rg) = -π·kt(rg)·(η(az) - η_ref(rg))² — the
    polynomial-phase structure of the TOPS deramp (core.py:554-634
    math; constants folded by the caller from annotation params).
    Applied as arr *= exp(1j·φ) (process.py:2357-2359); reramp is the
    conjugate."""
    eta = az_idx[:, None] * azimuth_time_interval
    return -np.pi * kt[None, :] * (eta - eta_ref[None, :]) ** 2


def nearest_poly_index(poly_times: np.ndarray, t_mid: float) -> int:
    """Top-1 as-of selection of the annotation polynomial nearest in
    time: argmin |t - t_mid| (core.py:587-592, 606-612) — the Spark
    analog is F.min_by over the poly table."""
    return int(np.argmin(np.abs(np.asarray(poly_times) - t_mid)))


# --------------------------------------------------- DataFrame wrappers

def burst_read_masked(
    bursts: DataFrame,
    lines_per_burst: int,
) -> DataFrame:
    """Distributed burst read + valid-mask: rows carry the measurement
    strip (complex64 bytes) + valid-sample arrays; output adds the
    masked payload. Columns in: (product_id, subswath, burst, min_burst,
    data, nrg, first_valid array<int>, last_valid array<int>)."""
    from pyspark.sql.types import (
        BinaryType, IntegerType, StringType, StructField, StructType,
    )

    schema = StructType(
        [
            StructField("product_id", StringType()),
            StructField("subswath", StringType()),
            StructField("burst", IntegerType()),
            StructField("data", BinaryType()),
            StructField("naz", IntegerType()),
            StructField("nrg", IntegerType()),
        ]
    )

    def do(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                nrg = int(r.nrg)
                strip = np.frombuffer(bytes(r.data), dtype=np.complex64).reshape(-1, nrg)
                first = window_first_line(int(r.burst), int(r.min_burst), lines_per_burst)
                win = read_window(strip, first, lines_per_burst)
                masked = apply_valid_mask(
                    win, np.asarray(r.first_valid), np.asarray(r.last_valid)
                )
                rows.append(
                    (r.product_id, r.subswath, int(r.burst), masked.tobytes(),
                     masked.shape[0], nrg)
                )
            yield pd.DataFrame(
                rows, columns=["product_id", "subswath", "burst", "data", "naz", "nrg"]
            )

    return bursts.mapInPandas(do, schema=schema)
