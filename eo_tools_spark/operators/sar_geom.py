"""Burst stitching, overlap blending, terrain scatter-accumulate,
shadow mask — the reference's azimuth-geometry operators.

Pinned semantics:
- burst offset/overlap from azimuth start times
  (/root/reference/eo_tools/S1/core.py:758-835):
  offset(b) = (t_b - t_min)/dt, overlap(b) = (t_{b-1} + naz·dt - t_b)/dt
  rounded; overlap(min_burst) = 0.
- stitching (process.py:2633-2682): each burst drops its top
  H = overlap//2 lines; strips are written in burst order into the
  stitched grid → LAST WRITER WINS on remaining overlap. The Spark
  version makes the winner explicit: row_number over
  Window.partitionBy(out_line).orderBy(burst desc).
- LUT overlap trim + azimuth offset (process.py:2392-2401):
  az < H → NaN; az += burst_offset.
- terrain scatter-accumulate (core.py:1377-1529): contributions
  summed (+=) into SAR pixels, untouched pixels → NaN. Spark: emit
  (az, rg, γ) rows → groupBy(az, rg).sum — associative, map-side
  combinable.
- shadow mask (core.py:1580-1613): per azimuth line, running max of
  the projected look angle along range; shadow where θ < cummax so far.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F


# ------------------------------------------------ offsets and overlaps

def burst_offset(az_times: np.ndarray, burst_idx: int, min_burst: int, dt: float) -> float:
    return (az_times[burst_idx - 1] - az_times[min_burst - 1]) / dt


def burst_overlap(az_times: np.ndarray, burst_idx: int, min_burst: int, dt: float, naz: int) -> float:
    if burst_idx <= min_burst:
        return 0.0
    t_prev_end = az_times[burst_idx - 2] + naz * dt
    return (t_prev_end - az_times[burst_idx - 1]) / dt


def stitch_global(bursts: list[np.ndarray], offsets: list[int], overlaps: list[int]) -> np.ndarray:
    """Numpy oracle of _stitch_bursts (sequential write order)."""
    naz, nrg = bursts[0].shape
    out = np.full((offsets[-1] + naz, nrg), np.nan, dtype=bursts[0].dtype)
    for arr, off, ovl in zip(bursts, offsets, overlaps):
        H = ovl // 2
        out[off + H : off + naz] = arr[H:]
    return out


def stitch_bursts_df(
    burst_lines: DataFrame,
    lines_per_burst: int,
) -> DataFrame:
    """Distributed stitching at line granularity.

    Input rows: (burst:int, line:int, offset:int, overlap:int, payload…)
    where ``line`` is the line index within the burst. Output: one row
    per stitched line (out_line), later bursts winning overlaps —
    row_number over (out_line, burst desc), exactly the reference's
    write order resolved declaratively."""
    placed = (
        burst_lines.withColumn("_H", (F.col("overlap") / 2).cast("int"))
        .where(F.col("line") >= F.col("_H"))
        .withColumn("out_line", F.col("offset") + F.col("line"))
        .drop("_H")
    )
    w = Window.partitionBy("out_line").orderBy(F.desc("burst"))
    return (
        placed.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def lut_overlap_trim(az: np.ndarray, rg: np.ndarray, burst_overlap_px: int, burst_offset_px: float):
    """process.py:2392-2401: first H=overlap//2 azimuth lines dropped,
    azimuth re-based by the burst offset."""
    H = burst_overlap_px // 2
    mask = az < H
    az2 = np.where(mask, np.nan, az + burst_offset_px)
    rg2 = np.where(mask, np.nan, rg)
    return az2, rg2


# ---------------------------------------------------------- fast ESD

def esd_phase_diffs(prm_bursts: list[np.ndarray], sec_bursts: list[np.ndarray], overlap: int) -> list[float]:
    """Per burst-boundary: mean phase of the cross interferogram between
    the current burst's tail and the next burst's head
    (process.py:2589-2614; complex mean = Σre,Σim → angle, the
    associative form scatter-reduced by esd_phase_mean at scale)."""
    out = []
    for b in range(len(prm_bursts) - 1):
        tail_p = prm_bursts[b][-overlap:]
        tail_s = sec_bursts[b][-overlap:]
        head_p = prm_bursts[b + 1][:overlap]
        head_s = sec_bursts[b + 1][:overlap]
        cross = (tail_p * np.conj(tail_s)) * np.conj(head_p * np.conj(head_s))
        vals = cross[~np.isnan(cross)]
        out.append(float(np.angle(vals.mean())))
    return out


def esd_ramp(phase_diffs: list[float], idx: int, naz: int, overlap: int) -> np.ndarray:
    """Azimuth phase ramp for burst ``idx`` (process.py:2574-2585):
    linear between ±dφ/2 anchored at the half-overlap lines; first/last
    bursts use their single adjacent boundary."""
    x = np.arange(naz)
    xdown, xup = overlap / 2, naz - 1 - overlap / 2
    if idx == 0:
        ydown, yup = -phase_diffs[0] / 2, phase_diffs[0] / 2
    elif idx == len(phase_diffs):
        ydown, yup = -phase_diffs[-1] / 2, phase_diffs[-1] / 2
    else:
        ydown, yup = -phase_diffs[idx - 1] / 2, phase_diffs[idx] / 2
    slope = (yup - ydown) / (xup - xdown)
    ramp = slope * x + (ydown - slope * xdown)
    return ramp


def apply_fast_esd(prm_bursts: list[np.ndarray], sec_bursts: list[np.ndarray], overlap: int) -> list[np.ndarray]:
    """Fast-ESD correction: secondary bursts multiplied by exp(1j·ramp)
    so phase jumps at burst boundaries cancel (Qin et al. 2018 scheme,
    process.py:2563-2630). Distributed shape: phase_diffs is a tiny
    per-boundary aggregate (esd_phase_mean over overlap-region rows);
    the ramp applies map-side per burst strip."""
    diffs = esd_phase_diffs(prm_bursts, sec_bursts, overlap)
    naz = prm_bursts[0].shape[0]
    out = []
    for i, s in enumerate(sec_bursts):
        ramp = esd_ramp(diffs, i, naz, overlap)
        out.append((s * np.exp(1j * ramp)[:, None]).astype(s.dtype))
    return out


# ------------------------------------------- terrain scatter-aggregate

def scatter_accumulate(contrib: DataFrame, naz: int | None = None, nrg: int | None = None) -> DataFrame:
    """Sum γ contributions into SAR pixels: groupBy(az, rg).sum —
    map-side combinable (the reference's += loop, core.py:1487-1529).
    Pixels with no contribution simply have no row (≡ NaN in the dense
    raster; densify only when materializing tiles)."""
    return contrib.groupBy("az", "rg").agg(F.sum("gamma").alias("gamma"))


def scatter_to_dense(rows: pd.DataFrame, naz: int, nrg: int) -> np.ndarray:
    """Densify (az, rg, gamma) rows; untouched pixels NaN
    (core.py: zeros→NaN semantics)."""
    out = np.full((naz, nrg), np.nan)
    az = rows["az"].to_numpy()
    rg = rows["rg"].to_numpy()
    out[az, rg] = rows["gamma"].to_numpy()
    return out


def terrain_scatter_oracle(az_f: np.ndarray, rg_f: np.ndarray, gamma: np.ndarray, naz: int, nrg: int) -> np.ndarray:
    """Numpy oracle: accumulate γ at integer (az, rg) with +=, NaN
    where nothing lands."""
    acc = np.zeros((naz, nrg))
    hit = np.zeros((naz, nrg), dtype=bool)
    az = np.round(az_f).astype(int)
    rg = np.round(rg_f).astype(int)
    ok = (az >= 0) & (az < naz) & (rg >= 0) & (rg < nrg) & ~np.isnan(gamma)
    np.add.at(acc, (az[ok], rg[ok]), gamma[ok])
    hit[az[ok], rg[ok]] = True
    return np.where(hit, acc, np.nan)


# ------------------------------------- terrain backscatter simulation

def _gamma_of_triangle(P0, P1, P2, look):
    """γ = cot(projected incidence): normal of the facet projected into
    the (look, slant) plane, clamped at 0 — the reference's modified
    SNAP convention (core.py:1459-1487 math)."""
    lv = look / np.linalg.norm(look)
    nv = np.cross(P1 - P0, P2 - P0)
    n = np.linalg.norm(nv)
    if n == 0:
        return 0.0
    nv = nv / n
    s = look - P0
    sn = np.linalg.norm(s)
    if sn == 0:
        return 0.0
    s = s / sn
    uv = float(lv @ s)
    up = float(lv @ nv)
    vp = float(s @ nv)
    denom = 1 - uv**2
    if denom == 0:
        return 0.0
    alpha = (up - uv * vp) / denom
    beta = (vp - uv * up) / denom
    proj = alpha * lv + beta * s
    pn = np.linalg.norm(proj)
    if pn == 0:
        return 0.0
    cosp = float((proj / pn) @ lv)
    g = cosp / (1e-12 + np.sqrt(max(1 - cosp**2, 0.0)))
    return g if g > 0 else 0.0


def terrain_gamma_contributions(
    az: np.ndarray,
    rg: np.ndarray,
    dem_x: np.ndarray,
    dem_y: np.ndarray,
    dem_z: np.ndarray,
    dx: np.ndarray,
    dy: np.ndarray,
    dz: np.ndarray,
    shadow: np.ndarray,
    naz: int,
    nrg: int,
):
    """Per-DEM-quad γ contributions as (a, r, gamma) arrays — the
    map-side emit of the scatter-aggregate (core.py:1377-1529 semantics:
    2 triangles per quad, vertex orders (0,1,2)/(3,1,2), membership
    l1≥0∧l2≥0∧l1+l2<1, += accumulation). The pixel loop is vectorized
    per quad; the reduce is groupBy(az,rg).sum (scatter_accumulate)."""
    out_a, out_r, out_g = [], [], []
    nl, nc = az.shape
    for i in range(nl - 1):
        for j in range(nc - 1):
            if shadow[i, j] == 1:
                continue
            aa = az[i : i + 2, j : j + 2].ravel()
            rr = rg[i : i + 2, j : j + 2].ravel()
            if np.isnan(aa).any() or np.isnan(rr).any():
                continue
            xx = dem_x[i : i + 2, j : j + 2].ravel()
            yy = dem_y[i : i + 2, j : j + 2].ravel()
            zz = dem_z[i : i + 2, j : j + 2].ravel()
            P = np.stack([xx, yy, zz], axis=1)
            amin = max(int(np.floor(aa.min())), 0)
            amax = min(int(np.ceil(aa.max())), naz - 1)
            rmin = max(int(np.floor(rr.min())), 0)
            rmax = min(int(np.ceil(rr.max())), nrg - 1)
            if amax < amin or rmax < rmin:
                continue
            g1 = _gamma_of_triangle(P[0], P[1], P[2], np.array([dx[i, j], dy[i, j], dz[i, j]]))
            # triangle 2 uses the opposite corner's look vector and a
            # flipped normal (reference: -cross of (1-3, 2-3) edges)
            g2 = _gamma_of_triangle(
                P[3], P[2], P[1], np.array([dx[i + 1, j + 1], dy[i + 1, j + 1], dz[i + 1, j + 1]])
            )
            A, R = np.meshgrid(
                np.arange(amin, amax + 1), np.arange(rmin, rmax + 1), indexing="ij"
            )
            pa, pr = A.astype(np.float64), R.astype(np.float64)
            for verts, g in (((0, 1, 2), g1), ((3, 1, 2), g2)):
                if g <= 0:
                    continue
                a0, a1_, a2 = aa[list(verts)]
                r0, r1, r2 = rr[list(verts)]
                det = (r1 - r2) * (a0 - a2) + (a2 - a1_) * (r0 - r2)
                if det == 0:
                    continue
                l1 = ((r1 - r2) * (pa - a2) + (a2 - a1_) * (pr - r2)) / det
                l2 = ((r2 - r0) * (pa - a2) + (a0 - a2) * (pr - r2)) / det
                inside = (l1 >= 0) & (l2 >= 0) & (l1 + l2 < 1)
                if inside.any():
                    out_a.append(A[inside])
                    out_r.append(R[inside])
                    out_g.append(np.full(int(inside.sum()), g))
    if not out_a:
        e = np.empty(0)
        return e.astype(int), e.astype(int), e
    return np.concatenate(out_a), np.concatenate(out_r), np.concatenate(out_g)


def simulate_terrain_gamma_dense(az, rg, dem_x, dem_y, dem_z, dx, dy, dz, shadow, naz, nrg):
    """Single-array oracle: accumulate contributions, zeros → NaN
    (core.py:1523-1527)."""
    a, r, g = terrain_gamma_contributions(az, rg, dem_x, dem_y, dem_z, dx, dy, dz, shadow, naz, nrg)
    acc = np.zeros((naz, nrg))
    np.add.at(acc, (a, r), g)
    return np.where(acc == 0.0, np.nan, acc)


# ----------------------------------------------------------- shadow

def shadow_mask(theta_ground: np.ndarray) -> np.ndarray:
    """Per azimuth line, running max of look angle along range marks
    shadow, with the reference scan's exact semantics
    (core.py:1597-1604): ``max_elev`` starts at 0.0 and a pixel is
    shadowed unless θ STRICTLY exceeds the running max — so θ equal to
    the max is shadowed, and a leading θ ≤ 0 is shadowed too.
    Vectorized cummax replaces the sequential loop (the max only ever
    updates on lit pixels, but a shadowed pixel satisfies θ ≤ max, so
    folding it into the cummax is a no-op — identical scan state)."""
    cummax = np.fmax.accumulate(np.nan_to_num(theta_ground, nan=-np.inf), axis=1)
    prev = np.concatenate(
        [np.full((theta_ground.shape[0], 1), -np.inf), cummax[:, :-1]], axis=1
    )
    prev = np.maximum(prev, 0.0)  # the reference's max_elev = 0.0 init
    return theta_ground <= prev
