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
