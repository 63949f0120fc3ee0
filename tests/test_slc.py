"""SLC ingestion semantics vs reference fixtures
(/root/reference/tests/test_s1_core.py)."""

import numpy as np
import pytest

from eo_tools_spark.operators.slc import (
    amplitude,
    apply_valid_mask,
    calibrate,
    deramp_phase,
    nearest_poly_index,
    phase,
    read_window,
    s2_reflectance,
    sigma_calibration_grid,
    window_first_line,
    burst_read_masked,
)


class TestWindowAddressing:
    def test_partial_rebase_fixture(self):
        # tests/test_s1_core.py:60-76: burst 4, min_burst 3, lpb 1500 → 1500
        assert window_first_line(4, 3, 1500) == 1500
        # full product (min_burst 1): burst 1 → 0
        assert window_first_line(1, 1, 1507) == 0

    def test_read_window(self):
        arr = np.arange(40).reshape(10, 4)
        win = read_window(arr, 4, 3)
        np.testing.assert_array_equal(win, arr[4:7])


class TestValidMask:
    def test_mask_semantics(self):
        # test_s1_core.py:79-138 semantics
        arr = np.ones((4, 6), dtype=np.complex64)
        first = np.array([1, 0, -1, 2])
        last = np.array([4, 5, -1, 3])
        out = apply_valid_mask(arr, first, last)
        assert np.isnan(out[0, 0].real) and not np.isnan(out[0, 1].real)
        assert not np.isnan(out[0, 4].real) and np.isnan(out[0, 5].real)
        assert not np.isnan(out[1]).any()
        assert np.isnan(out[2]).all()  # -1 line fully invalid
        assert np.isnan(out[3, 1].real) and not np.isnan(out[3, 2].real)


class TestCalibration:
    def test_beta_constant(self):
        arr = np.full((2, 2), 474.0, dtype=np.complex64)
        out = calibrate(arr, 237.0)  # fixture beta_nought value
        np.testing.assert_allclose(out.real, 2.0)

    def test_sigma_identity_fixture(self):
        # the exact 2x3 case of tests/test_s1_core.py:170-199
        grid = sigma_calibration_grid(
            cal_lines=np.array([0, 1]),
            cal_pixels=np.array([0, 1, 2]),
            cal_values=np.array([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]]),
            first_line=0, naz=2, nrg=3,
        )
        np.testing.assert_allclose(grid, [[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]])

    def test_sigma_interpolates_between(self):
        grid = sigma_calibration_grid(
            np.array([0, 2]), np.array([0, 2]),
            np.array([[0.0, 2.0], [4.0, 6.0]]), 0, 3, 3,
        )
        assert grid[1, 1] == pytest.approx(3.0)  # center bilinear


class TestProjections:
    def test_amp_phase(self):
        z = np.array([3 + 4j, 1j])
        np.testing.assert_allclose(amplitude(z), [5.0, 1.0])
        np.testing.assert_allclose(phase(z), [np.arctan2(4, 3), np.pi / 2])

    def test_s2_reflectance(self):
        dn = np.array([0.0, 1000.0, 11000.0])
        # baseline >= 4: offset -1000, QV 10000 (S2.py:198-202 shape)
        out = s2_reflectance(dn, -1000.0, 10000.0, True)
        np.testing.assert_allclose(out, [0.0, 0.0, 1.0])  # clip at 0
        out2 = s2_reflectance(dn, -1000.0, 10000.0, False)
        np.testing.assert_allclose(out2, [0.0, 0.1, 1.1])
        assert out.dtype == np.float32


class TestDeramp:
    def test_phase_zero_at_reference(self):
        kt = np.array([0.5, 1.0])
        eta_ref = np.array([2.0, 3.0])
        ph = deramp_phase(np.array([2.0 / 0.002]), np.array([0, 1]), kt, eta_ref, 0.002)
        assert ph[0, 0] == pytest.approx(0.0)  # eta == eta_ref → zero phase

    def test_deramp_reramp_identity(self):
        rng = np.random.default_rng(0)
        arr = (rng.normal(size=(8, 5)) + 1j * rng.normal(size=(8, 5))).astype(np.complex64)
        kt = rng.uniform(0.5, 2, 5)
        eta_ref = rng.uniform(0, 1, 5)
        ph = deramp_phase(np.arange(8.0), np.arange(5), kt, eta_ref, 0.002)
        roundtrip = (arr * np.exp(1j * ph)) * np.exp(-1j * ph)
        np.testing.assert_allclose(roundtrip, arr, rtol=1e-5)

    def test_nearest_poly(self):
        assert nearest_poly_index(np.array([0.0, 10.0, 20.0]), 12.0) == 1
        assert nearest_poly_index(np.array([0.0, 10.0, 20.0]), 19.0) == 2


class TestDistributedBurstRead(object):
    def test_burst_read_masked(self, spark):
        lpb, nrg = 4, 6
        rng = np.random.default_rng(1)
        # strip holds 3 bursts (min_burst=2 → bursts 2,3,4)
        strip = (rng.normal(size=(3 * lpb, nrg)) + 1j * rng.normal(size=(3 * lpb, nrg))).astype(np.complex64)
        first = [1, 0, -1, 2]
        last = [4, 5, -1, 3]
        rows = [
            ("P1", "IW1", b, 2, bytearray(strip.tobytes()), nrg, first, last)
            for b in (2, 3, 4)
        ]
        df = spark.createDataFrame(
            rows,
            "product_id string, subswath string, burst int, min_burst int, "
            "data binary, nrg int, first_valid array<int>, last_valid array<int>",
        )
        out = {r.burst: r for r in burst_read_masked(df, lpb).collect()}
        for b in (2, 3, 4):
            got = np.frombuffer(bytes(out[b].data), dtype=np.complex64).reshape(lpb, nrg)
            exp = apply_valid_mask(
                strip[(b - 2) * lpb : (b - 1) * lpb], np.array(first), np.array(last)
            )
            np.testing.assert_allclose(got, exp, equal_nan=True)


class TestDerampConstants:
    """Toy-annotation oracle for the full kt/η_ref derivation
    (reference core.py:554-634) — analytic-values style, like the
    range-doppler test."""

    C0 = 299792458.0

    def toy_annotation(self, fm=(-2000.0, 0.0, 0.0), dc=(60.0, 0.0, 0.0)):
        # straight-line orbit, constant velocity 7000 m/s along x
        t = np.arange(-400.0, 500.0, 100.0)
        pos = np.stack([7000.0 * t, np.zeros_like(t), np.full_like(t, 7e5)], 1)
        vel = np.stack([np.full_like(t, 7000.0), np.zeros_like(t), np.zeros_like(t)], 1)
        return dict(
            sv_t=t, sv_pos=pos, sv_vel=vel,
            t0_az=0.0, lines_per_burst=100,
            azimuth_time_interval=0.002,
            range_sampling_rate=6.4e7,
            slant_range_time=5.3e-3,
            nrg=64,
            azimuth_steering_rate_deg=1.59,
            radar_frequency=5.405e9,
            fm_times=np.array([-50.0, 0.1, 90.0]),
            fm_coeffs=np.array([[1.0, 1.0, 1.0], list(fm), [9.0, 9.0, 9.0]]),
            dc_times=np.array([-50.0, 0.1, 90.0]),
            dc_coeffs=np.array([[1.0, 1.0, 1.0], list(dc), [9.0, 9.0, 9.0]]),
        )

    def test_analytic_constants(self):
        from eo_tools_spark.operators.slc import deramp_constants

        ann = self.toy_annotation()
        kt, eta_ref, eta = deramp_constants(**ann)
        # constant-velocity orbit → ks exactly analytic (core.py:580-585)
        ks = (2 * 7000.0 / self.C0) * 5.405e9 * np.radians(1.59)
        A, D = -2000.0, 60.0
        np.testing.assert_allclose(kt, A * ks / (A - ks), rtol=1e-12)
        # η_ref = −D/A − D/A (reference's η_mid has NO minus sign,
        # core.py:630-633)
        np.testing.assert_allclose(eta_ref, -2 * D / A, rtol=1e-12)
        # η grid: linspace(−T/2, T/2, naz), T = az_dt·naz
        T = 0.002 * 100
        assert eta[0] == pytest.approx(-T / 2) and eta[-1] == pytest.approx(T / 2)
        assert len(eta) == 100

    def test_range_dependent_kt(self):
        from eo_tools_spark.operators.slc import deramp_constants

        ann = self.toy_annotation(fm=(-2000.0, -3.0e4, 2.0e6), dc=(60.0, 1e3, -5e4))
        kt, eta_ref, _ = deramp_constants(**ann)
        ks = (2 * 7000.0 / self.C0) * 5.405e9 * np.radians(1.59)
        rg_dt = 1.0 / 6.4e7
        j = 17
        d = j * rg_dt
        ka = -2000.0 + -3.0e4 * d + 2.0e6 * d**2
        fdc = 60.0 + 1e3 * d + -5e4 * d**2
        d_mid = 0.5 * 64 * rg_dt
        ka_m = -2000.0 + -3.0e4 * d_mid + 2.0e6 * d_mid**2
        fdc_m = 60.0 + 1e3 * d_mid + -5e4 * d_mid**2
        assert kt[j] == pytest.approx(ka * ks / (ka - ks), rel=1e-12)
        assert eta_ref[j] == pytest.approx(-fdc / ka - fdc_m / ka_m, rel=1e-12)

    def test_nearest_poly_selection_uses_t_mid(self):
        from eo_tools_spark.operators.slc import deramp_constants

        ann = self.toy_annotation()
        # t_mid = 0.1 s → middle rows (times −50, 0.1, 90) selected;
        # moving the burst to start at 80 s selects the 90 s rows
        ann2 = dict(ann, t0_az=80.0)
        kt2, _, _ = deramp_constants(**ann2)
        ks = (2 * 7000.0 / self.C0) * 5.405e9 * np.radians(1.59)
        np.testing.assert_allclose(kt2[0], 9.0 * ks / (9.0 - ks), rtol=1e-12)

    def test_deramp_flattens_synthetic_tops_ramp(self):
        from eo_tools_spark.operators.slc import deramp_constants

        ann = self.toy_annotation(fm=(-2000.0, -3.0e4, 0.0), dc=(60.0, 1e3, 0.0))
        kt, eta_ref, eta = deramp_constants(**ann)
        ramp = np.pi * kt[None, :] * (eta[:, None] - eta_ref[None, :]) ** 2
        sig = np.exp(1j * ramp)  # a pure TOPS-ramped signal
        from eo_tools_spark.operators.slc import tops_deramp_phase

        phi = tops_deramp_phase(**ann)
        flat = sig * np.exp(1j * phi)
        np.testing.assert_allclose(np.angle(flat), 0.0, atol=1e-9)


class TestDistributedDeramp:
    def test_deramp_reramp_roundtrip_spark(self, spark):
        """deramp→reramp over table rows is the identity (complex64
        tolerance) — the e2e chain the reference runs at
        process.py:2357-2427."""
        from eo_tools_spark.operators.slc import deramp_bursts

        naz, nrg = 20, 16
        rng = np.random.default_rng(2)
        ann = TestDerampConstants().toy_annotation()
        ann["lines_per_burst"] = naz
        ann["nrg"] = nrg
        bursts = []
        arrs = {}
        for b in (1, 2):
            a = (rng.normal(size=(naz, nrg)) + 1j * rng.normal(size=(naz, nrg))).astype(np.complex64)
            arrs[b] = a
            bursts.append(("P1", "IW2", b, bytearray(a.tobytes()), naz, nrg, float(b - 1) * naz * 0.002))
        df = spark.createDataFrame(
            bursts,
            "product_id string, subswath string, burst int, data binary, "
            "naz int, nrg int, t0_az double",
        )
        side = {k: v for k, v in ann.items()
                if k not in ("t0_az", "lines_per_burst", "nrg")}
        dr = deramp_bursts(df, side, direction=1)
        rt = {r.burst: r for r in deramp_bursts(dr, side, direction=-1).collect()}
        for b in (1, 2):
            got = np.frombuffer(bytes(rt[b].data), dtype=np.complex64).reshape(naz, nrg)
            np.testing.assert_allclose(got, arrs[b], rtol=1e-5, atol=1e-6)

    def test_deramp_actually_changes_phase(self, spark):
        from eo_tools_spark.operators.slc import deramp_bursts

        naz, nrg = 12, 8
        ann = TestDerampConstants().toy_annotation()
        a = np.ones((naz, nrg), dtype=np.complex64)
        df = spark.createDataFrame(
            [("P1", "IW1", 1, bytearray(a.tobytes()), naz, nrg, 0.0)],
            "product_id string, subswath string, burst int, data binary, "
            "naz int, nrg int, t0_az double",
        )
        side = {k: v for k, v in ann.items()
                if k not in ("t0_az", "lines_per_burst", "nrg")}
        out = deramp_bursts(df, side, direction=1).collect()[0]
        got = np.frombuffer(bytes(out.data), dtype=np.complex64).reshape(naz, nrg)
        assert np.abs(np.angle(got)).max() > 0.01
        np.testing.assert_allclose(np.abs(got), 1.0, rtol=1e-5)
