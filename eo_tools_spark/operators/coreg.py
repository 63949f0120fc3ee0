"""Coregistration (LUT scatter join) + topographic phase + orbit
interpolation.

- ``coregister``: project secondary (az, rg) LUT into the primary pixel
  grid by splitting each DEM quad into 2 triangles and barycentric-
  interpolating at integer primary coordinates — semantics of
  /root/reference/eo_tools/S1/core.py:838-918 (triangle membership
  l1≥0 ∧ l2≥0 ∧ l1+l2<1, vertex orders (0,1,2) and (3,1,2), quads
  processed in row-major order, later writes win). The inner pixel loop
  is vectorized per quad; the quad loop runs inside per-tile UDFs.
- ``phi_topo``: topographic phase (4π/λ)(rg·dr + r0) with
  r0 = slant_range_time·c/2, dr = c/(2·fsr) (core.py:728-756, constants
  folded at core.py:485-488).
- ``hermite_interp``: cubic Hermite orbit interpolation (positions +
  velocities → C1 spline), the reference's default interpolator
  (core.py:1095-1110, scipy CubicHermiteSpline semantics) without scipy.
- ``sv_window``: ±t_pad state-vector selection around a burst interval
  (t_pad = 360 s, core.py:441-446).
"""

from __future__ import annotations

import numpy as np

C0 = 299792458.0


def coregister(azp, rgp, azs, rgs, naz: int, nrg: int):
    """Returns (az_s2p, rg_s2p) of shape (naz, nrg), NaN where no DEM
    triangle covers the pixel."""
    az_out = np.full((naz, nrg), np.nan)
    rg_out = np.full((naz, nrg), np.nan)
    nl, nc = azp.shape
    for i in range(nl - 1):
        for j in range(nc - 1):
            aa = azp[i : i + 2, j : j + 2].ravel()
            rr = rgp[i : i + 2, j : j + 2].ravel()
            aas = azs[i : i + 2, j : j + 2].ravel()
            rrs = rgs[i : i + 2, j : j + 2].ravel()
            if np.isnan(aa).any() or np.isnan(rr).any() or np.isnan(aas).any() or np.isnan(rrs).any():
                continue
            amin = max(int(np.floor(aa.min())), 0)
            amax = min(int(np.ceil(aa.max())), naz - 1)
            rmin = max(int(np.floor(rr.min())), 0)
            rmax = min(int(np.ceil(rr.max())), nrg - 1)
            if amax < amin or rmax < rmin:
                continue
            A, R = np.meshgrid(
                np.arange(amin, amax + 1), np.arange(rmin, rmax + 1), indexing="ij"
            )
            pa = A.astype(np.float64)
            pr = R.astype(np.float64)
            for verts in ((0, 1, 2), (3, 1, 2)):
                a0, a1, a2 = aa[list(verts)]
                r0, r1, r2 = rr[list(verts)]
                det = (r1 - r2) * (a0 - a2) + (a2 - a1) * (r0 - r2)
                if det == 0:
                    continue
                l1 = ((r1 - r2) * (pa - a2) + (a2 - a1) * (pr - r2)) / det
                l2 = ((r2 - r0) * (pa - a2) + (a0 - a2) * (pr - r2)) / det
                l3 = 1 - l1 - l2
                inside = (l1 >= 0) & (l2 >= 0) & (l1 + l2 < 1)
                if not inside.any():
                    continue
                v_az = l1 * aas[verts[0]] + l2 * aas[verts[1]] + l3 * aas[verts[2]]
                v_rg = l1 * rrs[verts[0]] + l2 * rrs[verts[1]] + l3 * rrs[verts[2]]
                az_out[A[inside], R[inside]] = v_az[inside]
                rg_out[A[inside], R[inside]] = v_rg[inside]
    return az_out, rg_out


def phi_topo(rg: np.ndarray, radar_frequency: float, slant_range_time: float, range_sampling_rate: float) -> np.ndarray:
    lam = C0 / radar_frequency
    r0 = slant_range_time * C0 / 2.0
    dr = C0 / (2.0 * range_sampling_rate)
    return (4.0 * np.pi / lam) * (rg * dr + r0)


def hermite_interp(t: np.ndarray, pos: np.ndarray, vel: np.ndarray, tq: np.ndarray):
    """Piecewise cubic Hermite: value + derivative at each knot.
    pos (n,3), vel (n,3) → (pq (m,3), vq (m,3))."""
    t = np.asarray(t, dtype=np.float64)
    tq = np.asarray(tq, dtype=np.float64)
    i1 = np.clip(np.searchsorted(t, tq, side="right"), 1, len(t) - 1)
    i0 = i1 - 1
    h = (t[i1] - t[i0])[:, None]
    s = ((tq - t[i0]) / (t[i1] - t[i0]))[:, None]
    p0, p1 = pos[i0], pos[i1]
    m0, m1 = vel[i0] * h, vel[i1] * h
    h00 = 2 * s**3 - 3 * s**2 + 1
    h10 = s**3 - 2 * s**2 + s
    h01 = -2 * s**3 + 3 * s**2
    h11 = s**3 - s**2
    pq = h00 * p0 + h10 * m0 + h01 * p1 + h11 * m1
    # derivative wrt s, then /h
    d00 = 6 * s**2 - 6 * s
    d10 = 3 * s**2 - 4 * s + 1
    d01 = -6 * s**2 + 6 * s
    d11 = 3 * s**2 - 2 * s
    vq = (d00 * p0 + d10 * m0 + d01 * p1 + d11 * m1) / h
    return pq, vq


def barycentric_interp(t: np.ndarray, vals: np.ndarray, tq: np.ndarray) -> np.ndarray:
    """Barycentric Lagrange interpolation (exact degree-(n−1) polynomial
    through all knots) — the reference's 'bary' orbit interpolator
    (core.py:1111-1125, scipy BarycentricInterpolator semantics).
    vals (n, k) → (m, k)."""
    t = np.asarray(t, dtype=np.float64)
    tq = np.asarray(tq, dtype=np.float64)
    V = np.asarray(vals, dtype=np.float64)
    n = len(t)
    # barycentric weights w_j = 1 / prod_{i≠j}(t_j - t_i), scaled for
    # conditioning (only ratios matter)
    diff = t[:, None] - t[None, :]
    np.fill_diagonal(diff, 1.0)
    scale = (t.max() - t.min()) / 4.0
    w = 1.0 / np.prod(diff / scale, axis=1)
    d = tq[:, None] - t[None, :]  # (m, n)
    exact = d == 0
    d = np.where(exact, 1.0, d)
    c = w[None, :] / d  # (m, n)
    out = (c @ V) / c.sum(axis=1, keepdims=True)
    hit_rows, hit_cols = np.nonzero(exact)
    out[hit_rows] = V[hit_cols]
    return out


def polynomial_interp(t: np.ndarray, vals: np.ndarray, tq: np.ndarray, deg: int = 5) -> np.ndarray:
    """Degree-5 least-squares polynomial fit per component — the
    reference's 'poly' orbit interpolator (core.py:1128-1149,
    numpy Polynomial.fit(t, ·, 5) semantics, incl. its internal domain
    scaling). vals (n, k) → (m, k)."""
    from numpy.polynomial import Polynomial

    t = np.asarray(t, dtype=np.float64)
    tq = np.asarray(tq, dtype=np.float64)
    V = np.asarray(vals, dtype=np.float64)
    cols = [Polynomial.fit(t, V[:, k], deg)(tq) for k in range(V.shape[1])]
    return np.vstack(cols).T


def orbit_interpolate(
    t: np.ndarray,
    pos: np.ndarray,
    vel: np.ndarray,
    tq: np.ndarray,
    method: str = "chspline",
):
    """Dispatch over the reference's orbit_interpolator option
    (core.py:398, 448-453: 'chspline' | 'bary' | 'poly'). Returns
    (positions (m,3), velocities (m,3))."""
    if method == "chspline":
        return hermite_interp(t, pos, vel, tq)
    if method == "bary":
        return barycentric_interp(t, pos, tq), barycentric_interp(t, vel, tq)
    if method == "poly":
        return polynomial_interp(t, pos, tq), polynomial_interp(t, vel, tq)
    raise ValueError(
        f"unknown orbit interpolator {method!r} (chspline | bary | poly)"
    )


T_PAD = 360.0  # seconds, core.py:441-446


def sv_window(t: np.ndarray, t_start: float, t_end: float, t_pad: float = T_PAD) -> np.ndarray:
    """Boolean mask selecting state vectors within [start-pad, end+pad]."""
    t = np.asarray(t, dtype=np.float64)
    return (t >= t_start - t_pad) & (t <= t_end + t_pad)
