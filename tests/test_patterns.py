"""Pattern dispatch parity with the reference's filename-pattern batch
wrappers (/root/reference/eo_tools/S1/process.py:2129-2220): iterate the
six {vh,vv}×{iw1..3} patterns, apply only where inputs exist, skip the
rest, and tag outputs with the out prefix."""

import numpy as np

from eo_tools_spark.operators.patterns import (
    PATTERNS,
    apply_to_patterns_for_pair,
    apply_to_patterns_for_single,
    present_rasters,
)
from eo_tools_spark.operators.tiles import (
    raster_to_tiles,
    tiles_interferogram,
    tiles_map,
    tiles_to_raster,
)

TILE = 32


def _scene(seed, h=64, w=64):
    rng = np.random.default_rng(seed)
    return (rng.normal(size=(h, w)) + 1j * rng.normal(size=(h, w))).astype(
        np.complex64
    )


def _stack(spark, ids_and_arrays):
    out = None
    for rid, arr in ids_and_arrays:
        t = raster_to_tiles(spark, arr, rid, TILE)
        out = t if out is None else out.unionByName(t)
    return out


class TestPatternGrid:
    def test_patterns_match_reference_order(self):
        # process.py:2158-2160: pol outer loop, iw inner loop
        assert PATTERNS == (
            "vh_iw1", "vh_iw2", "vh_iw3", "vv_iw1", "vv_iw2", "vv_iw3",
        )


class TestForPair:
    def test_applies_only_where_both_inputs_exist(self, spark):
        # prm exists for vh_iw1, vh_iw2, vv_iw3; sec only for vh_iw1,
        # vv_iw3 → exactly those two patterns produce output
        arrs = {p: _scene(i) for i, p in enumerate(PATTERNS)}
        tiles = _stack(
            spark,
            [(f"prm_{p}", arrs[p]) for p in ("vh_iw1", "vh_iw2", "vv_iw3")]
            + [(f"sec_{p}", _scene(10 + i)) for i, p in enumerate(("vh_iw1", "vv_iw3"))],
        )
        out = apply_to_patterns_for_pair(
            tiles_interferogram, tiles, "prm", "sec", "ifg", 1, 1
        )
        got = present_rasters(out)
        assert got == {"ifg_vh_iw1", "ifg_vv_iw3"}

    def test_pair_values_match_direct_call(self, spark):
        prm, sec = _scene(1), _scene(2)
        tiles = _stack(spark, [("prm_vh_iw2", prm), ("sec_vh_iw2", sec)])
        out = apply_to_patterns_for_pair(
            tiles_interferogram, tiles, "prm", "sec", "ifg", 1, 1
        )
        direct = tiles_interferogram(
            tiles.filter("raster_id = 'prm_vh_iw2'"),
            tiles.filter("raster_id = 'sec_vh_iw2'"),
            1, 1,
        )
        np.testing.assert_array_equal(
            tiles_to_raster(out, TILE), tiles_to_raster(direct, TILE)
        )

    def test_no_pattern_matches_returns_none(self, spark):
        tiles = _stack(spark, [("other_vh_iw1", _scene(3))])
        assert (
            apply_to_patterns_for_pair(
                tiles_interferogram, tiles, "prm", "sec", "ifg", 1, 1
            )
            is None
        )


class TestForSingle:
    def test_applies_per_present_pattern_and_retags(self, spark):
        a, b = _scene(4), _scene(5)
        tiles = _stack(spark, [("slc_vh_iw1", a), ("slc_vv_iw2", b)])
        out = apply_to_patterns_for_single(
            tiles_map, tiles, "slc", "amp", np.abs, "f4", "tmp"
        )
        assert present_rasters(out) == {"amp_vh_iw1", "amp_vv_iw2"}
        got = tiles_to_raster(out.filter("raster_id = 'amp_vh_iw1'"), TILE)
        np.testing.assert_allclose(got, np.abs(a), rtol=1e-6)

    def test_skips_missing_single(self, spark):
        tiles = _stack(spark, [("slc_vv_iw3", _scene(6))])
        out = apply_to_patterns_for_single(
            tiles_map, tiles, "slc", "amp", np.abs, "f4", "tmp"
        )
        assert present_rasters(out) == {"amp_vv_iw3"}
