"""Pure-numpy raster kernels — single-array ("global") reference
implementations of the reference's windowed operators, used both as the
per-tile compute inside Spark UDFs and as the oracle the tile engine is
tested against (the block-with-halo ≡ global law,
/root/reference/tests/test_auxils.py:12-81).

Semantics ported (math, not code):
- boxcar: scipy.ndimage.convolve(ones(k)/k, mode='reflect') with NaNs
  zero-filled before filtering and restored after
  (/root/reference/eo_tools/S1/util.py:7-46). 'reflect' boundary is
  np.pad mode='symmetric'. Even kernels use the convolve offset
  convention: window [i-(k-1-k//2), i+k//2].
- presum: trim to multiples of (m,n), block mean
  (/root/reference/eo_tools/S1/util.py:48-97).
- erosion: min-filter with ones footprint, reflect boundary — the
  coherence border mask (/root/reference/eo_tools/S1/process.py:1757-1759).
- coherence: boxcar(p·s̄)/√(boxcar(|p|²))/√(boxcar(|s|²)), presummed,
  erosion-masked (/root/reference/eo_tools/S1/process.py:1670-1793).
- eigh_2x2 / h_alpha: closed-form 2×2 hermitian eigendecomposition →
  entropy + mean alpha (/root/reference/eo_tools/S1/process.py:1796-1940).
"""

from __future__ import annotations

import numpy as np


def _win_bounds(k: int) -> tuple[int, int]:
    """(lo, hi) such that output[i] averages input[i-lo .. i+hi]."""
    return k - 1 - k // 2, k // 2


def _box_sum(x: np.ndarray, kaz: int, krg: int) -> np.ndarray:
    """Windowed sum with reflect ('symmetric') boundary, float64 acc."""
    lo_a, hi_a = _win_bounds(kaz)
    lo_r, hi_r = _win_bounds(krg)
    p = np.pad(x, ((lo_a, hi_a), (lo_r, hi_r)), mode="symmetric")
    c = np.cumsum(np.cumsum(p, axis=0, dtype=np.float64), axis=1)
    c = np.pad(c, ((1, 0), (1, 0)))
    h, w = x.shape
    return (
        c[kaz : kaz + h, krg : krg + w]
        - c[0:h, krg : krg + w]
        - c[kaz : kaz + h, 0:w]
        + c[0:h, 0:w]
    )


def boxcar(img: np.ndarray, dimaz: int, dimrg: int) -> np.ndarray:
    """NaN-aware uniform filter (zero-fill, filter, restore NaN)."""
    if dimaz <= 1 and dimrg <= 1:
        return img
    msk = np.isnan(img)
    img_ = np.where(msk, 0, img)
    k = float(dimaz * dimrg)
    if np.iscomplexobj(img):
        out = (
            _box_sum(img_.real, dimaz, dimrg) + 1j * _box_sum(img_.imag, dimaz, dimrg)
        ) / k
        out = out.astype(np.complex128)
        out[msk] = np.nan + 1j * np.nan
    else:
        out = _box_sum(img_, dimaz, dimrg) / k
        out[msk] = np.nan
    return out


def presum(img: np.ndarray, m: int, n: int) -> np.ndarray:
    """Block mean after trimming to multiples of (m, n)."""
    if m <= 1 and n <= 1:
        return img
    M, N = (img.shape[0] // m) * m, (img.shape[1] // n) * n
    t = img[:M, :N].reshape(M // m, m, N // n, n)
    return t.sum(axis=(1, 3)) / float(m * n)


def erosion(mask: np.ndarray, kaz: int, krg: int) -> np.ndarray:
    """Binary erosion with a ones (kaz,krg) footprint, reflect boundary:
    True where the whole window is True."""
    s = _box_sum(mask.astype(np.float64), kaz, krg)
    return s >= (kaz * krg) - 0.5


def interferogram(p: np.ndarray, s: np.ndarray, mlt_az: int = 1, mlt_rg: int = 1) -> np.ndarray:
    return presum(p * np.conj(s), mlt_az, mlt_rg)


def coherence(
    p: np.ndarray,
    s: np.ndarray,
    box_az: int = 5,
    box_rg: int = 5,
    mlt_az: int = 1,
    mlt_rg: int = 1,
    magnitude: bool = True,
) -> np.ndarray:
    """Global coherence oracle (process.py:1670-1793 semantics)."""
    ifg = presum(p * np.conj(s), mlt_az, mlt_rg)
    msk = ~np.isnan(ifg)
    prm2 = presum(np.nan_to_num((p * np.conj(p)).real), mlt_az, mlt_rg)
    sec2 = presum(np.nan_to_num((s * np.conj(s)).real), mlt_az, mlt_rg)
    coh = boxcar(ifg, box_az, box_rg)
    coh = coh / np.sqrt(boxcar(prm2, box_az, box_rg))
    coh = coh / np.sqrt(boxcar(sec2, box_az, box_rg))
    if magnitude:
        coh = np.abs(coh)
    msk_out = erosion(msk, box_az, box_rg)
    return np.where(msk_out, coh, np.nan)


def block_process(img: np.ndarray, block_size, overlap_size, fun, *args, **kwargs) -> np.ndarray:
    """Overlapped block processing, zero-padded — exact semantics of
    /root/reference/eo_tools/auxils.py:154-254 (the reference's own
    block≡global law is tested against this)."""
    bh, bw = block_size
    oh, ow = overlap_size
    ih, iw = img.shape[:2]
    pad_l, pad_r = ow, iw - bw * (iw // bw)
    pad_t, pad_b = oh, ih - bh * (ih // bh)
    img_ = np.pad(img, ((pad_t, pad_b), (pad_l, pad_r)))
    out = np.zeros_like(img_)
    for i in range(pad_t, img_.shape[0], bh):
        for j in range(pad_l, img_.shape[1], bw):
            blk = img_[i - oh : i + bh + oh, j - ow : j + bw + ow]
            out[i : i + bh, j : j + bw] = fun(blk, *args, **kwargs)[
                oh : oh + bh, ow : ow + bw
            ]
    H, W = out.shape
    return out[pad_t : H - pad_b, pad_l : W - pad_r]


def _uniform3(x: np.ndarray) -> np.ndarray:
    """3×3 uniform filter, reflect boundary (scipy uniform_filter(size=3))."""
    return _box_sum(x, 3, 3) / 9.0


def goldstein_patch(arr: np.ndarray, alpha: float = 0.5) -> np.ndarray:
    """Goldstein base filter on one patch: spectral weighting
    H = smooth(|Z|)^alpha (process.py:2084-2091)."""
    Z = np.fft.fftshift(np.fft.fft2(arr))
    H = _uniform3(np.abs(Z)) ** alpha
    return np.fft.ifft2(np.fft.ifftshift(H * Z))


def goldstein_chunk(chunk: np.ndarray, alpha: float = 0.5, overlap: int = 14) -> np.ndarray:
    """Goldstein over one chunk: unit-modulus phase, overlapped
    block_process of the base filter (process.py:2093-2101)."""
    chunk_ = np.exp(1j * np.angle(chunk))
    b = 32 - overlap // 2
    o = overlap // 2
    return block_process(chunk_, (b, b), (o, o), goldstein_patch, alpha=alpha)


def eigh_2x2(c11: np.ndarray, c22: np.ndarray, c12: np.ndarray):
    """Closed-form eigenvalues/vectors of per-pixel 2×2 hermitian
    matrices [[c11, c12], [c12*, c22]] (math of process.py:1796-1850)."""
    tr = c11 + c22
    det = c11 * c22 - (c12 * np.conj(c12)).real
    delta = np.sqrt(np.maximum((tr / 2) ** 2 - det, 0))
    l1 = tr / 2 + delta
    l2 = tr / 2 - delta
    # eigenvector for l1: (c12, l1 - c11) normalized; when that vector
    # degenerates (c12 == 0 and l1 == c11, i.e. a diagonal matrix with
    # c11 >= c22) the true eigenvector is (1, 0) — substituting it keeps
    # alpha = arccos|v1a| correct (review finding: the zero vector gave
    # alpha = pi/2 for a pure first-channel scatterer)
    v1a = np.asarray(c12, dtype=complex).copy()
    v1b = (l1 - c11).astype(complex)
    nrm = np.sqrt((v1a * np.conj(v1a)).real + (v1b * np.conj(v1b)).real)
    degenerate = nrm == 0
    v1a = np.where(degenerate, 1.0 + 0j, v1a)
    nrm = np.where(degenerate, 1.0, nrm)
    return l1, l2, v1a / nrm, v1b / nrm


def h_alpha(c11: np.ndarray, c22: np.ndarray, c12: np.ndarray):
    """Dual-pol entropy / mean-alpha decomposition (process.py:1853-1940
    math): p_i = λ_i/Σλ, H = -Σ p_i log2(p_i) (log base 2 of #channels),
    alpha_i from eigenvector first components, ᾱ = Σ p_i α_i."""
    l1, l2, v1a, v1b = eigh_2x2(c11, c22, c12)
    tot = l1 + l2
    tot = np.where(tot == 0, 1, tot)
    p1 = np.clip(l1 / tot, 1e-12, 1)
    p2 = np.clip(l2 / tot, 1e-12, 1)
    H = -(p1 * np.log2(p1) + p2 * np.log2(p2))
    a1 = np.arccos(np.clip(np.abs(v1a), 0, 1))
    # second eigenvector is orthogonal: |v2a| = |v1b|
    a2 = np.arccos(np.clip(np.abs(v1b), 0, 1))
    alpha = p1 * a1 + p2 * a2
    return H, alpha
