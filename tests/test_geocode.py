"""Geocoding kernel vs the reference's analytic oracle
(/root/reference/tests/test_s1_core.py:202-217) + LUT/remap contracts."""

import numpy as np
import pytest

from eo_tools_spark.operators.geocode import (
    geocode_dem_tiles,
    lla_to_ecef,
    radar_index_mask,
    range_doppler,
    remap,
)


def toy_orbit():
    positions = np.vstack(
        (np.linspace(-10, 10, 10), np.full(10, 0), np.full(10, 10))
    ).T
    velocities = np.vstack((np.ones(10), np.zeros(10), np.zeros(10))).T
    return positions, velocities


class TestRangeDoppler:
    def test_analytic_oracle(self):
        """The reference's pinned values: az [4.5, 6.75], range [10, 5]."""
        P, V = toy_orbit()
        i_zd, r_zd, _, _, _ = range_doppler(
            np.array([0.0, 5.0]), np.array([0.0, 0.0]), np.array([0.0, 5.0]), P, V
        )
        np.testing.assert_allclose(i_zd, [4.5, 6.75], rtol=1e-5, atol=1e-8)
        np.testing.assert_allclose(r_zd, [10.0, 5.0], rtol=1e-5, atol=1e-8)

    def test_nan_input_and_no_root(self):
        P, V = toy_orbit()
        # x=1e6 → target far beyond orbit span → no zero-doppler crossing
        i_zd, r_zd, _, _, _ = range_doppler(
            np.array([np.nan, 1e6]), np.array([0.0, 0.0]), np.array([0.0, 0.0]), P, V
        )
        assert np.isnan(i_zd).all() and np.isnan(r_zd).all()

    def test_large_batch_matches_scalar(self):
        """Vectorized bisection == per-pixel bisection."""
        P, V = toy_orbit()
        rng = np.random.default_rng(0)
        xs = rng.uniform(-8, 8, 500)
        ys = rng.uniform(-3, 3, 500)
        zs = rng.uniform(0, 5, 500)
        az, rg, _, _, _ = range_doppler(xs, ys, zs, P, V)
        for k in [0, 17, 123, 499]:
            az1, rg1, _, _, _ = range_doppler(
                np.array([xs[k]]), np.array([ys[k]]), np.array([zs[k]]), P, V
            )
            assert az[k] == pytest.approx(az1[0], abs=1e-7)
            assert rg[k] == pytest.approx(rg1[0], rel=1e-9)


class TestECEF:
    def test_known_points(self):
        # equator/prime meridian at h=0 → (a, 0, 0)
        x, y, z = lla_to_ecef(0.0, 0.0, 0.0)
        assert x == pytest.approx(6378137.0)
        assert y == pytest.approx(0.0, abs=1e-9)
        assert z == pytest.approx(0.0, abs=1e-9)
        # north pole → z = b (semi-minor)
        x, y, z = lla_to_ecef(90.0, 0.0, 0.0)
        assert z == pytest.approx(6356752.3142, abs=0.01)
        assert abs(x) < 1e-6

    def test_altitude_radial(self):
        x0, y0, z0 = lla_to_ecef(45.0, 7.0, 0.0)
        x1, y1, z1 = lla_to_ecef(45.0, 7.0, 1000.0)
        d = np.sqrt((x1 - x0) ** 2 + (y1 - y0) ** 2 + (z1 - z0) ** 2)
        assert d == pytest.approx(1000.0, rel=1e-9)


class TestLUT:
    def test_geocode_dem_tiles_shapes_finite(self, spark):
        """LUT shape == DEM grid shape, finite where a solution exists
        (shape/finiteness contract, tests/test_s1_core.py:337-410)."""
        P, V = toy_orbit()
        # fake 'DEM' whose ECEF ends up near the toy orbit: use tiny
        # lat/lon box and re-center ECEF by subtracting the first point.
        th = tw = 8
        elev = np.zeros((th, tw), dtype=np.float32)
        rows = [("T1", 0.0, 0.0, 0.001, 0.001, bytearray(elev.tobytes()), th, tw)]
        dem = spark.createDataFrame(
            rows,
            "dem_tile_id string, minx double, miny double, maxx double, "
            "maxy double, elev binary, th int, tw int",
        )
        # real-orbit variant: orbit passing near the (0,0) ECEF point
        x0, y0, z0 = lla_to_ecef(0.0005, 0.0005, 0.0)
        Pr = np.vstack(
            (x0 + np.linspace(-1000, 1000, 10), np.full(10, y0), np.full(10, z0 + 700e3))
        ).T
        Vr = np.vstack((np.full(10, 222.2), np.zeros(10), np.zeros(10))).T
        lut = geocode_dem_tiles(dem, Pr, Vr).toPandas()
        assert len(lut) == 1
        az = np.frombuffer(lut.iloc[0].az, dtype=np.float64).reshape(th, tw)
        rg = np.frombuffer(lut.iloc[0].rg, dtype=np.float64).reshape(th, tw)
        assert az.shape == (th, tw) == rg.shape
        assert np.isfinite(az).all() and np.isfinite(rg).all()
        assert (rg > 690e3).all() and (rg < 710e3).all()  # ~orbit height

    def test_radar_index_mask(self):
        az = np.array([-1.0, 0.0, 5.0, 10.0])
        rg = np.array([2.0, 2.0, 2.0, 2.0])
        az_m, rg_m = radar_index_mask(az, rg, naz=10, nrg=4)
        assert np.isnan(az_m[0]) and np.isnan(az_m[3])
        assert az_m[1] == 0.0 and az_m[2] == 5.0


class TestRemap:
    def test_identity_bilinear(self):
        img = np.arange(30, dtype=float).reshape(5, 6)
        rows, cols = np.meshgrid(np.arange(5.0), np.arange(6.0), indexing="ij")
        out = remap(img, rows, cols)
        np.testing.assert_allclose(out, img)

    def test_inbounds_no_nan(self):
        """tests/test_s1_util.py:10-22 contract."""
        rng = np.random.default_rng(1)
        img = rng.normal(size=(20, 20))
        rows = rng.uniform(0, 19, (7, 7))
        cols = rng.uniform(0, 19, (7, 7))
        for kernel in ("nearest", "bilinear"):
            out = remap(img, rows, cols, kernel)
            assert out.shape == (7, 7)
            assert not np.isnan(out).any()

    def test_out_of_bounds_nan(self):
        img = np.ones((4, 4))
        out = remap(img, np.array([[10.0]]), np.array([[1.0]]))
        assert np.isnan(out[0, 0])

    def test_bilinear_midpoint(self):
        img = np.array([[0.0, 2.0], [4.0, 6.0]])
        out = remap(img, np.array([[0.5]]), np.array([[0.5]]))
        assert out[0, 0] == pytest.approx(3.0)

    def test_complex_remap(self):
        img = (np.arange(16) + 1j * np.arange(16)).reshape(4, 4)
        out = remap(img, np.array([[1.5]]), np.array([[1.5]]))
        expected = img[1:3, 1:3].mean()
        assert out[0, 0] == pytest.approx(expected)
