"""Fused dual-pol PolSAR product stage vs the dense reference-order
oracle (polsar_cov_dual, process.py:2000-2021; h_alpha_dual,
process.py:1820-1940)."""

import numpy as np
import pytest

from eo_tools_spark.functions import raster as R
from eo_tools_spark.operators.polsar import polsar_products
from eo_tools_spark.operators.tiles import raster_to_tiles, tiles_to_raster


def make_pair(seed=9, n=64, nan_block=True):
    rng = np.random.default_rng(seed)
    vv = (rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n))).astype(np.complex64)
    vh = (0.5 * vv + 0.8 * (rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n)))).astype(np.complex64)
    if nan_block:
        vv[10:14, 20:25] = np.nan + 1j * np.nan  # invalid samples
    return vv, vh


def dense_oracle(vv, vh, box_az, box_rg, mlt_az, mlt_rg):
    """Reference operation order: presum (NaN kept) → mask from c12 →
    nan_to_num → plain boxcar (reflect edges) → erosion mask."""
    c11 = R.presum((vv * np.conj(vv)).real.astype(np.float32), mlt_az, mlt_rg)
    c22 = R.presum((vh * np.conj(vh)).real.astype(np.float32), mlt_az, mlt_rg)
    c12 = R.presum((vv * np.conj(vh)).astype(np.complex64), mlt_az, mlt_rg)
    msk = ~np.isnan(c12)
    c11 = R.boxcar(np.nan_to_num(c11), box_az, box_rg)
    c22 = R.boxcar(np.nan_to_num(c22), box_az, box_rg)
    c12 = R.boxcar(np.nan_to_num(c12), box_az, box_rg)
    # erosion: window fully valid (reflect edge handling = _box_sum's)
    keep = R._box_sum(msk.astype(np.float64), box_az, box_rg) >= box_az * box_rg - 0.5
    c11 = np.where(keep, c11, np.nan).astype(np.float32)
    c22 = np.where(keep, c22, np.nan).astype(np.float32)
    c12 = np.where(keep, c12, np.nan + 1j * np.nan).astype(np.complex64)
    return c11, c22, c12


class TestPolsarProducts:
    @pytest.mark.parametrize("mlt", [(1, 1), (2, 2)])
    def test_covariance_matches_dense_oracle(self, spark, mlt):
        vv, vh = make_pair()
        tv = raster_to_tiles(spark, vv, "vv", 32)
        th_ = raster_to_tiles(spark, vh, "vh", 32)
        out = polsar_products(tv, th_, 5, 5, *mlt)
        got = {
            rid: tiles_to_raster(out.where(out.raster_id == rid), 32 // mlt[0] if mlt[0] > 1 else 32)
            for rid in ("c11", "c22", "c12")
        }
        e11, e22, e12 = dense_oracle(vv, vh, 5, 5, *mlt)
        np.testing.assert_allclose(got["c11"], e11, rtol=1e-4, atol=1e-5, equal_nan=True)
        np.testing.assert_allclose(got["c22"], e22, rtol=1e-4, atol=1e-5, equal_nan=True)
        np.testing.assert_allclose(got["c12"], e12, rtol=1e-4, atol=1e-5, equal_nan=True)
        # the NaN block must have propagated through the erosion mask
        assert np.isnan(got["c11"]).any()

    def test_h_alpha_channel(self, spark):
        vv, vh = make_pair(nan_block=False)
        tv = raster_to_tiles(spark, vv, "vv", 32)
        th_ = raster_to_tiles(spark, vh, "vh", 32)
        out = polsar_products(tv, th_, 5, 5, h_alpha=True)
        ha = tiles_to_raster(out.where(out.raster_id == "halpha"), 32)
        e11, e22, e12 = dense_oracle(vv, vh, 5, 5, 1, 1)
        He, Ae = R.h_alpha(e11.astype(np.float64), e22.astype(np.float64), e12.astype(np.complex128))
        np.testing.assert_allclose(ha.real, He, rtol=1e-4, atol=1e-5, equal_nan=True)
        np.testing.assert_allclose(ha.imag, Ae, rtol=1e-4, atol=1e-5, equal_nan=True)
        # physical range: H in [0,1], alpha in [0, pi/2]
        assert np.nanmax(ha.real) <= 1.0 + 1e-6 and np.nanmin(ha.real) >= -1e-6
        assert np.nanmax(ha.imag) <= np.pi / 2 + 1e-6

    def test_two_exchanges_total(self, spark):
        from eo_tools_spark.plans.skew import explain_str

        vv, vh = make_pair(nan_block=False)
        tv = raster_to_tiles(spark, vv, "vv", 32)
        th_ = raster_to_tiles(spark, vh, "vh", 32)
        plan = explain_str(polsar_products(tv, th_, 5, 5, h_alpha=True))
        # product equi-join + ONE halo groupBy (+ their input prep):
        # the whole dual-pol pipeline in <= 3 exchanges
        assert plan.count("Exchange") <= 3, plan
