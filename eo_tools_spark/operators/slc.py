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
    conjugate.

    STRUCTURE HELPER, not the reference-parity path: η here is the raw
    ``az_idx · azimuth_time_interval`` product the caller supplies —
    the reference's centered η grid (linspace(-T/2, T/2, naz), step
    T/(naz-1)) and mid-burst anchoring live in ``deramp_constants`` /
    ``tops_deramp_phase``, which is what production deramping must
    use."""
    eta = az_idx[:, None] * azimuth_time_interval
    return -np.pi * kt[None, :] * (eta - eta_ref[None, :]) ** 2


def nearest_poly_index(poly_times: np.ndarray, t_mid: float) -> int:
    """Top-1 as-of selection of the annotation polynomial nearest in
    time: argmin |t - t_mid| (core.py:587-592, 606-612) — the Spark
    analog is F.min_by over the poly table."""
    return int(np.argmin(np.abs(np.asarray(poly_times) - t_mid)))


C0 = 299792458.0


def iso_burst_t0(azimuth_time_iso: str, orbit_t0) -> float:
    """Burst azimuth start time in orbit-relative seconds:
    (isoparse(azimuthTime) − state_vectors.t0).total_seconds()
    (core.py:571-575)."""
    from eo_tools_spark.sources.annotation import iso_seconds

    return iso_seconds(azimuth_time_iso, orbit_t0)


def _poly2_eval(coeffs: np.ndarray, tau, slant_range_time: float):
    """Annotation 2nd-order polynomial in (τ - slantRangeTime)
    (core.py:597-603 ka_fun / core.py:617-623 fdc_fun)."""
    d = tau - slant_range_time
    return coeffs[0] + coeffs[1] * d + coeffs[2] * d**2


def deramp_constants(
    sv_t: np.ndarray,
    sv_pos: np.ndarray,
    sv_vel: np.ndarray,
    t0_az: float,
    lines_per_burst: int,
    azimuth_time_interval: float,
    range_sampling_rate: float,
    slant_range_time: float,
    nrg: int,
    azimuth_steering_rate_deg: float,
    radar_frequency: float,
    fm_times: np.ndarray,
    fm_coeffs: np.ndarray,
    dc_times: np.ndarray,
    dc_coeffs: np.ndarray,
):
    """Derive the TOPS deramp constants from annotation rows — the full
    reference chain (/root/reference/eo_tools/S1/core.py:554-634):

    - Doppler-rate of the antenna-steering ramp at mid-burst:
      ks = (2|v(t_mid)|/c0)·fc·radians(kp) (core.py:580-585), with
      v(t_mid) from the Hermite orbit interpolator over the state
      vectors inside the burst window ±360 s, STRICT bounds
      (core.py:574-579).
    - Nearest-in-time FM-rate and Doppler-centroid polynomials
      (argmin |t − t_mid|, core.py:587-612), both quadratic in
      (τ − slantRangeTime).
    - kt(τ) = ka·ks/(ka − ks) (core.py:624).
    - η_ref(τ) = η_c(τ) − η_mid = −fdc(τ)/ka(τ) − fdc(τ_mid)/ka(τ_mid)
      — note the reference's η_mid carries NO minus sign
      (core.py:630-633); matched verbatim.
    - η grid: linspace(−T/2, T/2, naz) with T = az_dt·naz
      (core.py:625-629) — step T/(naz−1), NOT az_dt.

    Returns (kt[nrg], eta_ref[nrg], eta[naz]).
    """
    sv_t = np.asarray(sv_t, dtype=np.float64)
    naz = int(lines_per_burst)
    az_dt = float(azimuth_time_interval)
    rg_dt = 1.0 / float(range_sampling_rate)
    t_mid = t0_az + az_dt * naz / 2.0
    t_end = t0_az + az_dt * naz
    cnd = (sv_t > t0_az - 360.0) & (sv_t < t_end + 360.0)
    from eo_tools_spark.operators.coreg import hermite_interp

    _, vq = hermite_interp(
        sv_t[cnd], np.asarray(sv_pos)[cnd], np.asarray(sv_vel)[cnd], np.array([t_mid])
    )
    v_mid = vq[0]
    ks = (
        (2.0 * np.sqrt((v_mid**2).sum()) / C0)
        * float(radar_frequency)
        * np.radians(float(azimuth_steering_rate_deg))
    )

    fm = np.asarray(fm_coeffs, dtype=np.float64)[nearest_poly_index(fm_times, t_mid)]
    dc = np.asarray(dc_coeffs, dtype=np.float64)[nearest_poly_index(dc_times, t_mid)]

    rg_tau = slant_range_time + np.arange(nrg) * rg_dt
    ka = _poly2_eval(fm, rg_tau, slant_range_time)
    fdc = _poly2_eval(dc, rg_tau, slant_range_time)
    kt = ka * ks / (ka - ks)

    rg_mid = slant_range_time + 0.5 * nrg * rg_dt
    eta_mid = _poly2_eval(dc, rg_mid, slant_range_time) / _poly2_eval(
        fm, rg_mid, slant_range_time
    )
    eta_ref = -fdc / ka - eta_mid
    eta = np.linspace(-az_dt * naz / 2.0, az_dt * naz / 2.0, naz)
    return kt, eta_ref, eta


def tops_deramp_phase(**kwargs) -> np.ndarray:
    """Full deramp phase φ(az, rg) = −π·kt(rg)·(η(az) − η_ref(rg))²
    from annotation inputs (core.py:630-634). kwargs =
    deramp_constants(...) signature. Apply as arr·exp(1jφ); reramp with
    exp(−1jφ) (process.py:2357-2359, 2425-2427)."""
    kt, eta_ref, eta = deramp_constants(**kwargs)
    return -np.pi * kt[None, :] * (eta[:, None] - eta_ref[None, :]) ** 2


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


def deramp_bursts(
    bursts: DataFrame,
    annotation: dict,
    direction: int = 1,
) -> DataFrame:
    """Distributed TOPS deramp (direction=+1) / reramp (−1) over burst
    rows (process.py:2357-2359 applies arr·exp(1j·φ); reramp conjugates,
    process.py:2425-2427). Rows in: (product_id, subswath, burst, data
    complex64 bytes, naz, nrg, t0_az double). ``annotation`` is the
    small per-product side data — broadcast once, never shuffled with
    the pixel payload:
    {sv_t, sv_pos, sv_vel, azimuth_time_interval, range_sampling_rate,
     slant_range_time, azimuth_steering_rate_deg, radar_frequency,
     fm_times, fm_coeffs, dc_times, dc_coeffs}.

    Scale shape: pixel bytes stay in place (narrow mapInPandas, no
    shuffle); the deramp grid is recomputed per burst row from ~KB of
    broadcast constants — at 10^12 rows this is embarrassingly parallel.
    """
    from pyspark.sql.types import (
        BinaryType, DoubleType, IntegerType, StringType, StructField, StructType,
    )

    spark = bursts.sparkSession
    bc = spark.sparkContext.broadcast(annotation)
    sgn = 1.0 if direction >= 0 else -1.0

    schema = StructType(
        [
            StructField("product_id", StringType()),
            StructField("subswath", StringType()),
            StructField("burst", IntegerType()),
            StructField("data", BinaryType()),
            StructField("naz", IntegerType()),
            StructField("nrg", IntegerType()),
            StructField("t0_az", DoubleType()),
        ]
    )

    def do(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ann = bc.value
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                naz, nrg = int(r.naz), int(r.nrg)
                arr = np.frombuffer(bytes(r.data), dtype=np.complex64).reshape(naz, nrg)
                phi = tops_deramp_phase(
                    sv_t=ann["sv_t"],
                    sv_pos=ann["sv_pos"],
                    sv_vel=ann["sv_vel"],
                    t0_az=float(r.t0_az),
                    lines_per_burst=naz,
                    azimuth_time_interval=ann["azimuth_time_interval"],
                    range_sampling_rate=ann["range_sampling_rate"],
                    slant_range_time=ann["slant_range_time"],
                    nrg=nrg,
                    azimuth_steering_rate_deg=ann["azimuth_steering_rate_deg"],
                    radar_frequency=ann["radar_frequency"],
                    fm_times=ann["fm_times"],
                    fm_coeffs=ann["fm_coeffs"],
                    dc_times=ann["dc_times"],
                    dc_coeffs=ann["dc_coeffs"],
                )
                out = (arr * np.exp(1j * sgn * phi)).astype(np.complex64)
                rows.append(
                    (r.product_id, r.subswath, int(r.burst), out.tobytes(),
                     naz, nrg, float(r.t0_az))
                )
            yield pd.DataFrame(
                rows,
                columns=["product_id", "subswath", "burst", "data", "naz", "nrg", "t0_az"],
            )

    return bursts.mapInPandas(do, schema=schema)
