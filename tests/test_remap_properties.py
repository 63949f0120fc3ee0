"""Property-based tests (hypothesis) for the remap kernel family and
the hamming banding schemes — invariants that must hold for ANY input,
beyond the fixed-seed parity tests."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from eo_tools_spark.operators.geocode import KERNELS, kernel_margin, remap

KNAMES = sorted(KERNELS)


@settings(max_examples=40, deadline=None)
@given(
    kernel=st.sampled_from(KNAMES),
    h=st.integers(3, 12),
    w=st.integers(3, 12),
    seed=st.integers(0, 2**31 - 1),
)
def test_constant_image_invariant(kernel, h, w, seed):
    """Kernels form a partition of unity → a constant image remaps to
    the same constant at EVERY in-bounds coordinate (incl. the border
    clamp band and exact halves)."""
    rng = np.random.default_rng(seed)
    img = np.full((h, w), 2.5)
    rows = np.concatenate([rng.uniform(0, h - 1e-9, 25), [0.0, h - 1.0, 0.5]])
    cols = np.concatenate([rng.uniform(0, w - 1e-9, 25), [0.0, w - 1.0, 0.5]])
    out = remap(img, rows, cols, kernel)
    np.testing.assert_allclose(out, 2.5, rtol=1e-10)


@settings(max_examples=30, deadline=None)
@given(
    kernel=st.sampled_from(KNAMES),
    seed=st.integers(0, 2**31 - 1),
)
def test_integer_grid_is_identity(kernel, seed):
    """Every kernel interpolates: at integer coordinates the output is
    exactly the source pixel."""
    rng = np.random.default_rng(seed)
    img = rng.normal(size=(7, 9))
    rows, cols = np.meshgrid(np.arange(7.0), np.arange(9.0), indexing="ij")
    out = remap(img, rows, cols, kernel)
    # cubic kernels sum zero-weight neighbor taps → ~1e-15 float noise
    np.testing.assert_allclose(out, img, rtol=1e-9, atol=1e-12)


@settings(max_examples=30, deadline=None)
@given(
    kernel=st.sampled_from(KNAMES),
    seed=st.integers(0, 2**31 - 1),
)
def test_range_bound_for_positive_kernels(kernel, seed):
    """nearest/bilinear are convex combinations → output within
    [min, max] of the image; cubic kernels may overshoot but stay
    bounded by the kernel's l1 mass (≲ 2× data range)."""
    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 1, (8, 8))
    rows = rng.uniform(0, 7, 50)
    cols = rng.uniform(0, 7, 50)
    out = remap(img, rows, cols, kernel)
    if kernel in ("nearest", "bilinear"):
        assert (out >= img.min() - 1e-12).all() and (out <= img.max() + 1e-12).all()
    else:
        assert (np.abs(out) <= 2.0 * np.abs(img).max() + 1e-9).all()


def test_kernel_margins():
    assert [kernel_margin(k) for k in ("nearest", "bilinear", "bicubic", "bicubic6")] == [0, 0, 1, 2]


# ------------------------- hamming banding: candidate completeness

def _band_keys(h: int, max_hamming: int) -> set:
    """Reimplementation of hamming_band_cols' key arithmetic in Python
    (the SQL and this must agree by construction of the same formula)."""
    c = max_hamming + 1
    width = 64 // c
    if width >= 12:
        return {(i, (h >> (i * width)) & ((1 << width) - 1)) for i in range(c)}
    c = max_hamming + 2
    width = 64 // c
    mask = (1 << width) - 1
    keys = set()
    band = 0
    for i in range(c):
        for j in range(i + 1, c):
            keys.add((band, (((h >> (i * width)) & mask) << width) | ((h >> (j * width)) & mask)))
            band += 1
    return keys


@settings(max_examples=200, deadline=None)
@given(
    h=st.integers(0, 2**64 - 1),
    k=st.integers(1, 8),
    flips=st.lists(st.integers(0, 63), max_size=8, unique=True),
)
def test_pigeonhole_candidate_completeness(h, k, flips):
    """ANY pair within hamming distance k must share ≥1 band key — the
    deterministic recall guarantee both banding schemes rely on."""
    if len(flips) > k:
        flips = flips[:k]
    h2 = h
    for b in flips:
        h2 ^= 1 << b
    assert _band_keys(h, k) & _band_keys(h2, k), (h, h2, k)
