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

    def test_endpoint_roots_reference_early_exit(self):
        """Reference parity at the orbit-span edges (core.py:1340-1346):
        a zero-Doppler root AT t=0 or t=nb early-exits with i_zd at the
        endpoint and r_zd = dx = dy = dz = 0 (the reference `continue`s
        before writing the deltas; r=0 later maps to a far-negative
        range index that radar_index_mask discards) — NOT the true
        slant range."""
        P, V = toy_orbit()
        # sat x runs -10..10; targets exactly under the first/last node
        i_zd, r_zd, dx, dy, dz = range_doppler(
            np.array([-10.0, 10.0, 0.0]),
            np.array([0.0, 0.0, 0.0]),
            np.array([0.0, 0.0, 0.0]),
            P, V,
        )
        np.testing.assert_allclose(i_zd, [0.0, 9.0, 4.5], atol=1e-8)
        assert r_zd[0] == 0.0 and r_zd[1] == 0.0
        assert dx[0] == dy[0] == dz[0] == 0.0
        assert dx[1] == dy[1] == dz[1] == 0.0
        assert r_zd[2] == pytest.approx(10.0, rel=1e-5)  # interior unaffected

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
        out = remap(img, np.array([[1.5]]), np.array([[1.5]]), "bilinear")
        expected = img[1:3, 1:3].mean()
        assert out[0, 0] == pytest.approx(expected)


# Scalar transcription of the reference gather loop
# (/root/reference/eo_tools/S1/util.py:150-213) — the parity oracle for
# the vectorized remap, all four kernels.

def _ref_ker(kernel, x):
    ax = abs(x)
    if kernel == "nearest":
        return 1.0 if ax < 0.5 else (0.5 if ax == 0.5 else 0.0)
    if kernel == "bilinear":
        return 1.0 - ax if ax < 1 else 0.0
    if kernel == "bicubic":
        if ax < 1:
            return 1.5 * ax**3 - 2.5 * ax**2 + 1
        if ax < 2:
            return -0.5 * ax**3 + 2.5 * ax**2 - 4 * ax + 2
        return 0.0
    # bicubic6 (Keys81)
    ax2, ax3 = ax**2, ax**3
    if ax < 1:
        return 4 * ax3 / 3 - 7 * ax2 / 3 + 1
    if ax < 2:
        return -7 * ax3 / 12 + 3 * ax2 - 59 * ax / 12 + 15 / 6
    if ax < 3:
        return ax3 / 12 - 2 * ax2 / 3 + 21 * ax / 12 - 3 / 2
    return 0.0


def _ref_remap(img, rr, cc, kernel):
    H = {"nearest": 0, "bilinear": 0, "bicubic": 1, "bicubic6": 2}[kernel]
    out = np.full(rr.shape, np.nan)
    h, w = img.shape
    for idx in range(rr.size):
        r, c = rr.flat[idx], cc.flat[idx]
        if np.isnan(r) or np.isnan(c):
            continue
        if not (0 <= r < h and 0 <= c < w):
            continue
        val = 0.0
        for i in range(int(np.floor(r)) - H, int(np.ceil(r)) + H + 1):
            for j in range(int(np.floor(c)) - H, int(np.ceil(c)) + H + 1):
                i2 = min(max(0, i), h - 1)
                j2 = min(max(0, j), w - 1)
                val += _ref_ker(kernel, r - i) * _ref_ker(kernel, c - j) * img[i2, j2]
        out.flat[idx] = val
    return out


ALL_KERNELS = ["nearest", "bilinear", "bicubic", "bicubic6"]


class TestRemapReferenceParity:
    @pytest.mark.parametrize("kernel", ALL_KERNELS)
    def test_matches_reference_loop(self, kernel):
        """Bit-parity with the reference gather across random interior,
        border-clamp (coords in (h-1, h)), exact-half, and integer
        coordinates."""
        rng = np.random.default_rng(7)
        img = rng.normal(size=(9, 11))
        rows = np.concatenate([
            rng.uniform(0, 8, 40),          # interior
            rng.uniform(8, 9 - 1e-9, 8),    # border-clamp band (h-1, h)
            np.array([0.5, 3.5, 8.5]),      # exact halves (nearest tie)
            np.array([0.0, 4.0, 8.0]),      # integer grid
            np.array([-0.1, 9.0, np.nan]),  # out of bounds / NaN
        ])
        cols = np.concatenate([
            rng.uniform(0, 10, 40),
            rng.uniform(10, 11 - 1e-9, 8),
            np.array([2.5, 0.5, 10.5]),
            np.array([0.0, 5.0, 10.0]),
            np.array([1.0, 1.0, 1.0]),
        ])
        got = remap(img, rows, cols, kernel)
        exp = _ref_remap(img, rows, cols, kernel)
        # 1e-12: numpy vector pow vs scalar pow differ by ~1 ulp
        np.testing.assert_allclose(got, exp, rtol=0, atol=1e-12, equal_nan=True)

    @pytest.mark.parametrize("kernel", ALL_KERNELS)
    def test_inbounds_no_nan_all_kernels(self, kernel):
        """Reference contract tests/test_s1_util.py:10-22: in-bounds
        coords never produce NaN, any kernel."""
        rng = np.random.default_rng(3)
        img = rng.random((64, 32)) + 1j * rng.random((64, 32))
        rr = rng.random((40, 50)) * 63
        cc = rng.random((40, 50)) * 31
        out = remap(img, rr, cc, kernel=kernel)
        assert out.shape == rr.shape
        assert not np.isnan(out).any()

    @pytest.mark.parametrize("kernel", ["bicubic", "bicubic6"])
    def test_partition_of_unity(self, kernel):
        """Keys kernels sum to 1 → a constant image stays constant
        everywhere in-bounds (incl. the border-clamp band)."""
        img = np.full((6, 6), 3.25)
        rng = np.random.default_rng(11)
        rows = rng.uniform(0, 6 - 1e-9, 200)
        cols = rng.uniform(0, 6 - 1e-9, 200)
        out = remap(img, rows, cols, kernel)
        np.testing.assert_allclose(out, 3.25, rtol=1e-12)

    def test_default_kernel_is_bicubic(self):
        """The reference defaults to bicubic (util.py:157)."""
        rng = np.random.default_rng(5)
        img = rng.normal(size=(8, 8))
        rows = rng.uniform(1, 6, 10)
        cols = rng.uniform(1, 6, 10)
        np.testing.assert_array_equal(
            remap(img, rows, cols), remap(img, rows, cols, "bicubic")
        )

    def test_unknown_kernel_raises(self):
        with pytest.raises(ValueError):
            remap(np.ones((2, 2)), np.zeros(1), np.zeros(1), "lanczos")

    def test_integer_coord_next_to_nan_not_contaminated(self):
        """The uniform-tap loop's EXTRA tap (integer coords) must be
        excluded, not zero-weighted: 0·NaN would poison the sum. The
        reference window (floor..ceil collapses) never touches the
        neighbor at all."""
        img = np.ones((4, 4))
        img[2, 2] = np.nan
        for kernel in ("nearest", "bilinear"):
            out = remap(img, np.array([1.0]), np.array([2.0]), kernel)
            assert out[0] == pytest.approx(1.0), kernel

    @pytest.mark.parametrize("kernel", ALL_KERNELS)
    def test_nan_image_parity_with_reference(self, kernel):
        """NaN-masked images (the standard output of apply_valid_mask):
        in-window NaN propagation must match the reference loop exactly
        — including zero-weight in-window taps, which DO poison the sum
        in the reference (0·NaN = NaN in its numba loop)."""
        rng = np.random.default_rng(13)
        img = rng.normal(size=(10, 10))
        img[0, :] = np.nan        # masked border lines
        img[:, 7] = np.nan        # masked column
        img[5, 5] = np.nan        # interior hole
        rows = np.concatenate([
            rng.uniform(0, 9, 30),
            np.arange(10, dtype=float),    # integer coords
            np.array([4.0, 5.0, 6.0]),     # integers near the hole
        ])
        cols = np.concatenate([
            rng.uniform(0, 9, 30),
            np.arange(10, dtype=float),
            np.array([5.0, 4.0, 5.0]),
        ])
        got = remap(img, rows, cols, kernel)
        exp = _ref_remap(img, rows, cols, kernel)
        np.testing.assert_allclose(got, exp, rtol=0, atol=1e-12, equal_nan=True)


class TestSar2GeoTiles:
    """Distributed LUT gather join == global remap (sar2geo/align,
    process.py:1461-1549), all kernels, borders + OOB + NaN coords."""

    @pytest.mark.parametrize("kernel", ["nearest", "bilinear", "bicubic", "bicubic6"])
    def test_matches_global_remap(self, spark, kernel):
        from eo_tools_spark.operators.geocode import sar2geo_tiles
        from eo_tools_spark.operators.tiles import raster_to_tiles

        rng = np.random.default_rng(17)
        naz, nrg, tile = 96, 128, 32
        img = (rng.normal(size=(naz, nrg)) + 1j * rng.normal(size=(naz, nrg))).astype(np.complex64)
        sar = raster_to_tiles(spark, img, "sar", tile)

        luts = []
        expected = {}
        for i, (alo, ahi, clo, chi) in enumerate(
            [(0.0, 20.0, 0.0, 30.0),        # touches global top-left border
             (40.0, 95.0, 60.0, 127.0),     # touches bottom-right (clamp band)
             (10.0, 80.0, 5.0, 120.0)]      # wide span → many SAR tiles
        ):
            th, tw = 7, 9
            az = rng.uniform(alo, ahi, (th, tw))
            rg = rng.uniform(clo, chi, (th, tw))
            az[0, 0] = np.nan                  # NaN coord
            rg[1, 1] = nrg + 5.0               # global OOB
            az[2, 2] = -0.5                    # negative OOB
            tid = f"lut{i}"
            expected[tid] = remap(img, az, rg, kernel).astype(np.complex64)
            luts.append((tid, az.tobytes(), rg.tobytes(), th, tw))
        lut_df = spark.createDataFrame(
            luts, "dem_tile_id string, az binary, rg binary, th int, tw int"
        )

        out = {
            r.dem_tile_id: np.frombuffer(bytes(r.data), dtype=np.complex64).reshape(r.th, r.tw)
            for r in sar2geo_tiles(lut_df, sar, naz, nrg, tile, kernel).collect()
        }
        assert set(out) == set(expected)
        for tid in expected:
            np.testing.assert_allclose(
                out[tid], expected[tid], rtol=1e-6, atol=1e-6, equal_nan=True
            )

    def test_all_oob_lut_tile_produces_no_row(self, spark):
        from eo_tools_spark.operators.geocode import sar2geo_tiles
        from eo_tools_spark.operators.tiles import raster_to_tiles

        rng = np.random.default_rng(3)
        img = rng.normal(size=(32, 32)).astype(np.float32)
        sar = raster_to_tiles(spark, img, "sar", 16)
        az = np.full((4, 4), 100.0)
        rg = np.full((4, 4), 100.0)
        lut_df = spark.createDataFrame(
            [("dead", az.tobytes(), rg.tobytes(), 4, 4)],
            "dem_tile_id string, az binary, rg binary, th int, tw int",
        )
        assert sar2geo_tiles(lut_df, sar, 32, 32, 16, "bilinear").count() == 0

    def test_patch_budget_split_is_bit_identical(self, spark):
        """A pathologically warped LUT (transpose — every LUT tile
        references the FULL image diagonal band) under a patch budget:
        output bit-identical to the unbudgeted gather, while the split
        pre-pass provably bounds every sub-gather's referenced bbox
        (VERDICT r2 #3: round-2 code assembled one patch per LUT tile
        bounded only by the LUT's values)."""
        from eo_tools_spark.operators.geocode import (
            _referenced_bbox,
            _split_warped_lut,
            sar2geo_tiles,
        )
        from eo_tools_spark.operators.tiles import raster_to_tiles

        rng = np.random.default_rng(11)
        naz = nrg = 64
        tile = 16
        img = (rng.normal(size=(naz, nrg)) + 1j * rng.normal(size=(naz, nrg))).astype(np.complex64)
        sar = raster_to_tiles(spark, img, "sar", tile)
        # transpose warp: LUT pixel (i, j) reads SAR (j, i) — each LUT
        # tile's referenced bbox is ~the whole transposed extent
        g = np.mgrid[0:naz, 0:nrg].astype(float)
        az, rg_ = g[1].copy(), g[0].copy()
        rows = []
        for ty in range(naz // 32):
            for tx in range(nrg // 32):
                rows.append(
                    (f"{ty}_{tx}",
                     az[ty * 32 : (ty + 1) * 32, tx * 32 : (tx + 1) * 32].tobytes(),
                     rg_[ty * 32 : (ty + 1) * 32, tx * 32 : (tx + 1) * 32].tobytes(),
                     32, 32)
                )
        lut_df = spark.createDataFrame(
            rows, "dem_tile_id string, az binary, rg binary, th int, tw int"
        )

        budget = 16 * 16 * 4  # each sub-gather ≤ 4 SAR-tile areas
        free = {
            r.dem_tile_id: bytes(r.data)
            for r in sar2geo_tiles(lut_df, sar, naz, nrg, tile, "bicubic").collect()
        }
        capped = {
            r.dem_tile_id: bytes(r.data)
            for r in sar2geo_tiles(
                lut_df, sar, naz, nrg, tile, "bicubic", max_patch_pixels=budget
            ).collect()
        }
        assert free == capped  # bit-identical bytes, same tile set

        # the split really happened AND every sub-tile fits the budget
        parts = _split_warped_lut(lut_df, naz, nrg, 1, budget).collect()
        assert len(parts) > len(rows)
        for p in parts:
            a = np.frombuffer(bytes(p.az), dtype=np.float64).reshape(p.th, p.tw)
            r = np.frombuffer(bytes(p.rg), dtype=np.float64).reshape(p.th, p.tw)
            bbox = _referenced_bbox(a, r, naz, nrg, 1)
            a0, a1, c0, c1 = bbox
            assert (a1 - a0 + 1) * (c1 - c0 + 1) <= budget

    def test_patch_budget_rejects_reserved_hash_in_id(self, spark):
        """'#' is reserved for the sub-tile suffix when a budget is set
        — an id carrying it must fail loudly, not be mis-reassembled."""
        from eo_tools_spark.operators.geocode import sar2geo_tiles
        from eo_tools_spark.operators.tiles import raster_to_tiles

        img = np.zeros((32, 32), dtype=np.float32)
        sar = raster_to_tiles(spark, img, "sar", 16)
        az = np.mgrid[0:4, 0:4][0].astype(float)
        lut_df = spark.createDataFrame(
            [("bad#id", az.tobytes(), az.T.copy().tobytes(), 4, 4)],
            "dem_tile_id string, az binary, rg binary, th int, tw int",
        )
        with pytest.raises(Exception, match="reserved"):
            sar2geo_tiles(
                lut_df, sar, 32, 32, 16, "bilinear", out_kind="f4",
                max_patch_pixels=10_000,
            ).collect()

    def test_patch_budget_too_small_fails_loudly(self, spark):
        from eo_tools_spark.operators.geocode import sar2geo_tiles
        from eo_tools_spark.operators.tiles import raster_to_tiles

        img = np.zeros((32, 32), dtype=np.float32)
        sar = raster_to_tiles(spark, img, "sar", 16)
        az = np.array([[5.0]])
        rg = np.array([[5.0]])
        lut_df = spark.createDataFrame(
            [("one", az.tobytes(), rg.tobytes(), 1, 1)],
            "dem_tile_id string, az binary, rg binary, th int, tw int",
        )
        with pytest.raises(Exception, match="max_patch_pixels"):
            sar2geo_tiles(
                lut_df, sar, 32, 32, 16, "bicubic6", out_kind="f4",
                max_patch_pixels=4,
            ).collect()

    def test_patch_budget_no_split_skips_reassembly(self, spark):
        """Setting the budget as insurance on a smooth LUT must not pay
        the reassembly pass: the build-time probe sees zero split tiles
        and the plan carries no groupBy-paste (applyInPandas) stage —
        only the cogroup gather. A warped LUT under the same budget DOES
        carry it."""
        from eo_tools_spark.operators.geocode import sar2geo_tiles
        from eo_tools_spark.operators.tiles import raster_to_tiles
        from eo_tools_spark.plans.skew import explain_str

        naz = nrg = 32
        tile = 16
        img = np.arange(naz * nrg, dtype=np.float32).reshape(naz, nrg)
        sar = raster_to_tiles(spark, img, "sar", tile)
        g = np.mgrid[0:16, 0:16].astype(float)
        smooth = spark.createDataFrame(
            [("s", g[0].tobytes(), g[1].tobytes(), 16, 16)],
            "dem_tile_id string, az binary, rg binary, th int, tw int",
        )
        out = sar2geo_tiles(
            smooth, sar, naz, nrg, tile, "bilinear", out_kind="f4",
            max_patch_pixels=18 * 18,
        )
        plan = explain_str(out)
        assert "FlatMapCoGroupsInPandas" in plan, plan
        assert "FlatMapGroupsInPandas" not in plan, plan

        # same LUT under a budget smaller than its referenced bbox →
        # the probe detects split tiles and the paste stage is planned
        out_w = sar2geo_tiles(
            smooth, sar, naz, nrg, tile, "bilinear", out_kind="f4",
            max_patch_pixels=6 * 18,
        )
        assert "FlatMapGroupsInPandas" in explain_str(out_w)


class TestDemUpsampling:
    """load_dem_coords on-read bilinear upsampling (core.py:1153-1176,
    reference default dem_upsampling=1.8)."""

    def test_shapes_and_linear_exact(self, spark):
        from eo_tools_spark.operators.geocode import upsample_dem_tiles

        th = tw = 10
        yy, xx = np.mgrid[0:th, 0:tw].astype(np.float64)
        elev = (3.0 * xx + 2.0 * yy + 5.0).astype(np.float32)
        dem = spark.createDataFrame(
            [("T1", 0.0, 0.0, 1.0, 1.0, elev.tobytes(), th, tw)],
            "dem_tile_id string, minx double, miny double, maxx double, "
            "maxy double, elev binary, th int, tw int",
        )
        out = upsample_dem_tiles(dem, 1.8).collect()[0]
        assert (out.th, out.tw) == (int(10 * 1.8), int(10 * 1.8)) == (18, 18)
        up = np.frombuffer(bytes(out.elev), dtype=np.float32).reshape(18, 18)
        # bilinear under the center convention reproduces a linear ramp
        # exactly in the interior (clamped half-pixel borders excluded)
        y = (np.arange(18) + 0.5) * 10 / 18 - 0.5
        x = (np.arange(18) + 0.5) * 10 / 18 - 0.5
        exp = 3.0 * x[None, :] + 2.0 * y[:, None] + 5.0
        np.testing.assert_allclose(up[1:-1, 1:-1], exp[1:-1, 1:-1], rtol=1e-6)

    def test_bbox_registration_matches_geocode_convention(self, spark):
        """The output bbox is adjusted so geocode_dem_tiles' node-based
        linspace lands EXACTLY on the resampled sample positions
        (engine analog of the reference's affine rescale,
        core.py:1168-1171): elevation linear in lon must satisfy
        elev[j] == ramp(linspace(minx', maxx', nw)[j]) in the interior."""
        from eo_tools_spark.operators.geocode import upsample_dem_tiles

        th = tw = 10
        minx, maxx, miny, maxy = 5.0, 6.8, 40.0, 41.8
        lons = np.linspace(minx, maxx, tw)
        lats = np.linspace(maxy, miny, th)  # north-up
        elev = (100.0 * lons[None, :] + 7.0 * lats[:, None]).astype(np.float32)
        dem = spark.createDataFrame(
            [("T1", minx, miny, maxx, maxy, elev.tobytes(), th, tw)],
            "dem_tile_id string, minx double, miny double, maxx double, "
            "maxy double, elev binary, th int, tw int",
        )
        out = upsample_dem_tiles(dem, 1.8).collect()[0]
        up = np.frombuffer(bytes(out.elev), dtype=np.float32).reshape(out.th, out.tw)
        lons2 = np.linspace(out.minx, out.maxx, out.tw)
        lats2 = np.linspace(out.maxy, out.miny, out.th)
        exp = 100.0 * lons2[None, :] + 7.0 * lats2[:, None]
        np.testing.assert_allclose(up[1:-1, 1:-1], exp[1:-1, 1:-1], rtol=1e-6)

    def test_factor_one_passthrough(self, spark):
        from eo_tools_spark.operators.geocode import upsample_dem_tiles

        elev = np.zeros((4, 4), dtype=np.float32)
        dem = spark.createDataFrame(
            [("T1", 0.0, 0.0, 1.0, 1.0, elev.tobytes(), 4, 4)],
            "dem_tile_id string, minx double, miny double, maxx double, "
            "maxy double, elev binary, th int, tw int",
        )
        assert upsample_dem_tiles(dem, 1) is dem

    def test_degenerate_tile_raises_clearly(self, spark):
        """A 1-sample-wide DEM tile has undefined node spacing — the
        operator must fail with a clear error, not ZeroDivisionError
        (ADVICE r2)."""
        import pytest

        from eo_tools_spark.operators.geocode import upsample_dem_tiles

        elev = np.zeros((1, 4), dtype=np.float32)
        dem = spark.createDataFrame(
            [("T1", 0.0, 0.0, 1.0, 0.0, elev.tobytes(), 1, 4)],
            "dem_tile_id string, minx double, miny double, maxx double, "
            "maxy double, elev binary, th int, tw int",
        )
        with pytest.raises(Exception, match="at least 2x2"):
            upsample_dem_tiles(dem, 1.8).collect()
        # downsampling factors could emit 1-sample axes — rejected
        with pytest.raises(ValueError, match="factor must be >= 1"):
            upsample_dem_tiles(dem, 0.4)

    def test_feeds_geocode(self, spark):
        """Upsampled tiles run through geocode_dem_tiles unchanged —
        the reference's default chain (upsample → lat/lon grid → LUT)."""
        from eo_tools_spark.operators.geocode import upsample_dem_tiles

        th = tw = 8
        elev = np.zeros((th, tw), dtype=np.float32)
        dem = spark.createDataFrame(
            [("T1", 0.0, 0.0, 0.001, 0.001, elev.tobytes(), th, tw)],
            "dem_tile_id string, minx double, miny double, maxx double, "
            "maxy double, elev binary, th int, tw int",
        )
        x0, y0, z0 = lla_to_ecef(0.0005, 0.0005, 0.0)
        Pr = np.vstack(
            (x0 + np.linspace(-1000, 1000, 10), np.full(10, y0), np.full(10, z0 + 700e3))
        ).T
        Vr = np.vstack((np.full(10, 222.2), np.zeros(10), np.zeros(10))).T
        lut = geocode_dem_tiles(upsample_dem_tiles(dem, 1.8), Pr, Vr).toPandas()
        nh = int(th * 1.8)
        az = np.frombuffer(lut.iloc[0].az, dtype=np.float64).reshape(nh, nh)
        assert np.isfinite(az).all()
