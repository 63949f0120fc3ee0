"""STAC search + partial-download planning: the reference's client-side
semantics (validation contracts, filters, output schema, manifest
shape) with the network as a seam
(/root/reference/eo_tools/S1/download.py:29-111, 114-243, 276-443)."""

import numpy as np
import pytest

from eo_tools_spark.geo.wkb import box_to_wkb
from eo_tools_spark.sources import stac


def ring(x0, y0, x1, y1):
    return np.array(
        [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], dtype=np.float64
    )

AOI = ring(0.0, 0.0, 10.0, 10.0)


class TestNormalizePolarizations:
    def test_full_and_order(self):
        # download.py:307: canonical (vv, vh) order regardless of input
        assert stac.normalize_polarizations("full") == ["vv", "vh"]
        assert stac.normalize_polarizations(["vh", "vv"]) == ["vv", "vh"]
        assert stac.normalize_polarizations("VH") == ["vh"]

    def test_invalid_pol(self):
        with pytest.raises(ValueError, match="Invalid polarization"):
            stac.normalize_polarizations("hh")
        with pytest.raises(ValueError, match="string or an iterable"):
            stac.normalize_polarizations(42)
        with pytest.raises(ValueError):
            stac.normalize_polarizations([])


class TestSearchContracts:
    def _items(self, spark):
        rows = [
            ("P1", "2020-01-01 00:00:00", 44, "ascending", box_to_wkb(1, 1, 3, 3)),
            ("P2", "2020-06-01 00:00:00", 44, "descending", box_to_wkb(5, 5, 8, 8)),
            ("P3", "2021-01-01 00:00:00", 95, "ascending", box_to_wkb(20, 20, 30, 30)),
        ]
        return spark.createDataFrame(
            rows,
            "id string, start_time_s string, relative_orbit int, "
            "orbit_state string, footprint binary",
        ).selectExpr(
            "id", "CAST(start_time_s AS TIMESTAMP) AS start_time",
            "relative_orbit", "orbit_state", "footprint",
        )

    def test_requires_datetime_or_ids(self, spark):
        with pytest.raises(ValueError, match="At least one of datetime or ids"):
            stac.stac_search(self._items(spark), AOI)

    def test_ids_must_be_nonempty_strings(self, spark):
        items = self._items(spark)
        for bad in ("P1", [], [1, 2]):
            with pytest.raises(ValueError, match="non-empty sequence"):
                stac.stac_search(items, AOI, ids=bad)

    def test_intersects_and_datetime_range(self, spark):
        items = self._items(spark)
        # AOI covers P1+P2 footprints; P3 is outside
        got = stac.stac_search(items, AOI, datetime="2019-01-01/2022-01-01")
        ids = {r["id"] for r in got.collect()}
        assert ids == {"P1", "P2"}
        # half-open interval (pystac '..' convention)
        got = stac.stac_search(items, AOI, datetime="2020-03-01/..")
        assert {r["id"] for r in got.collect()} == {"P2"}
        # output schema mirrors the reference GeoDataFrame columns
        assert got.columns[:4] == [
            "id", "startTimeFromAscendingNode", "relativeOrbitNumber",
            "orbitDirection",
        ]

    def test_ids_filter(self, spark):
        got = stac.stac_search(self._items(spark), AOI, ids=["P2", "P3"])
        assert {r["id"] for r in got.collect()} == {"P2"}


class TestPlanPartialDownloads:
    def _bursts(self, spark):
        # P1/IW1 bursts 2,3,5 intersect; P1/IW2 burst 1; P2/IW1 none
        rows = [
            ("P1", "IW1", 2, box_to_wkb(1, 1, 2, 2)),
            ("P1", "IW1", 3, box_to_wkb(2, 2, 3, 3)),
            ("P1", "IW1", 5, box_to_wkb(4, 4, 5, 5)),
            ("P1", "IW1", 9, box_to_wkb(90, 80, 91, 81)),
            ("P1", "IW2", 1, box_to_wkb(6, 6, 7, 7)),
            ("P2", "IW1", 4, box_to_wkb(40, 40, 41, 41)),
        ]
        return spark.createDataFrame(
            rows, "product_id string, subswath string, burst int, footprint binary"
        )

    def test_jobs_line_windows_and_gap_fill(self, spark):
        jobs = stac.plan_partial_downloads(
            self._bursts(spark), AOI, lines_per_burst=1500, pol="vv"
        ).collect()
        by = {(r["product_id"], r["subswath"]): r for r in jobs}
        assert set(by) == {("P1", "IW1"), ("P1", "IW2")}
        r = by[("P1", "IW1")]
        # bursts 2..5 by range (gap burst 4 included), download.py:411-415
        assert (r["min_burst"], r["max_burst"]) == (2, 5)
        assert r["line_start"] == 1500 * 1
        assert r["number_of_lines"] == 1500 * 4
        assert all(j["pol"] == "vv" for j in jobs)

    def test_full_pol_doubles_jobs_in_vv_vh_order(self, spark):
        jobs = stac.plan_partial_downloads(
            self._bursts(spark), AOI, lines_per_burst=1500, pol="full"
        )
        assert jobs.count() == 4  # 2 subswaths × 2 pols
        assert {r["pol"] for r in jobs.collect()} == {"vv", "vh"}

    def test_empty_selection_raises_reference_error(self, spark):
        far = ring(170.0, 80.0, 171.0, 81.0)
        with pytest.raises(RuntimeError, match="list of bursts to process is empty"):
            stac.plan_partial_downloads(
                self._bursts(spark), far, lines_per_burst=1500
            )

    def test_assets_join_and_manifest(self, spark):
        assets = spark.createDataFrame(
            [
                ("P1", "IW1", "vv", "s3://b/P1.SAFE/measurement/s1a-iw1-slc-vv-p1.tiff"),
                ("P1", "IW2", "vv", "s3://b/P1.SAFE/measurement/s1a-iw2-slc-vv-p1.tiff"),
            ],
            "product_id string, subswath string, pol string, href string",
        )
        jobs = stac.plan_partial_downloads(
            self._bursts(spark), AOI, lines_per_burst=1500, pol="vv",
            assets=assets,
        )
        info = stac.partial_manifest(jobs, "P1")
        assert info["product_id"] == "P1"
        assert info["aoi_file"] == "partial_aoi.geojson"
        e = info["subsets"]["iw1"]["vv"]
        # download.py:428-435 entry shape, file = measurement/<basename>
        assert e == {
            "file": "measurement/s1a-iw1-slc-vv-p1.tiff",
            "min_burst": 2, "max_burst": 5,
            "line_start": 1500, "number_of_lines": 6000,
            "lines_per_burst": 1500,
        }

    def test_per_product_lines_per_burst_frame(self, spark):
        lpb = spark.createDataFrame(
            [("P1", "IW1", 1200), ("P1", "IW2", 1800)],
            "product_id string, subswath string, lines_per_burst int",
        )
        jobs = stac.plan_partial_downloads(
            self._bursts(spark), AOI, lines_per_burst=lpb, pol="vv"
        ).collect()
        by = {(r["product_id"], r["subswath"]): r for r in jobs}
        assert by[("P1", "IW1")]["line_start"] == 1200
        assert by[("P1", "IW2")]["line_start"] == 0
        assert by[("P1", "IW2")]["number_of_lines"] == 1800

    def test_run_requires_fetcher_seam(self, spark):
        jobs = stac.plan_partial_downloads(
            self._bursts(spark), AOI, lines_per_burst=1500, pol="vv"
        )
        with pytest.raises(NotImplementedError, match="fetcher"):
            stac.run_partial_downloads(jobs)
        seen = []
        n = stac.run_partial_downloads(jobs, fetcher=seen.append)
        assert n == 2 and len(seen) == 2
        assert {j["subswath"] for j in seen} == {"IW1", "IW2"}


class TestGeojsonSidecar:
    def test_partial_aoi_geojson_shape(self):
        doc = stac.partial_aoi_geojson(AOI)
        import json as _json

        parsed = _json.loads(doc)
        assert parsed["type"] == "FeatureCollection"
        geom = parsed["features"][0]["geometry"]
        assert geom["type"] == "Polygon"
        assert geom["coordinates"][0][0] == [0.0, 0.0]
        assert doc.endswith("\n")

    def test_validate_rejects_non_polygon(self):
        with pytest.raises(ValueError, match="must not be an empty"):
            stac.validate_single_ring(np.zeros((2, 2)), "shp")
        with pytest.raises(ValueError, match="single polygon ring"):
            stac.validate_single_ring("not a ring", "shp")
