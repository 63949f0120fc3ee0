"""Annotation / calibration / orbit XML ETL vs golden reference values
(mirrors /root/reference/tests/test_s1_core.py:23-34 fixture numbers:
start_time 2023-09-04T06:37:31.072288, lines_per_burst 1507,
samples_per_burst 23055, burst_count 9, beta_nought 237.0)."""

import numpy as np
import pytest

from eo_tools_spark.sources.annotation import (
    location_grid_burst_count,
    parse_annotation,
    parse_annotation_table,
    parse_calibration,
    parse_orbit_eof,
    xml_to_dict,
)


def annotation_xml(burst_count=9, lines_per_burst=1507):
    bursts = "\n".join(
        f"""<burst>
          <azimuthTime>2023-09-04T06:37:{31 + b}.072288</azimuthTime>
          <firstValidSample count="4">-1 0 1 2</firstValidSample>
          <lastValidSample count="4">-1 5 6 7</lastValidSample>
        </burst>"""
        for b in range(burst_count)
    )
    points = "\n".join(
        f"""<geolocationGridPoint>
          <line>{ln * lines_per_burst}</line><pixel>{px}</pixel>
          <latitude>{40.0 + 0.1 * ln}</latitude><longitude>{2.0 + 0.2 * px / 23054}</longitude>
        </geolocationGridPoint>"""
        for ln in range(burst_count + 1)
        for px in (0, 23054)
    )
    return f"""<?xml version="1.0"?>
    <product>
      <adsHeader><startTime>2023-09-04T06:37:31.072288</startTime></adsHeader>
      <generalAnnotation>
        <productInformation>
          <rangeSamplingRate>6.4345241e7</rangeSamplingRate>
          <azimuthSteeringRate>1.590368784</azimuthSteeringRate>
          <radarFrequency>5.40500045433435e9</radarFrequency>
        </productInformation>
        <azimuthFmRateList count="2">
          <azimuthFmRate>
            <azimuthTime>2023-09-04T06:37:30.000000</azimuthTime>
            <azimuthFmRatePolynomial count="3">-2325.499 450781.3 -7.659135e7</azimuthFmRatePolynomial>
          </azimuthFmRate>
          <azimuthFmRate>
            <azimuthTime>2023-09-04T06:37:45.000000</azimuthTime>
            <azimuthFmRatePolynomial count="3">-2325.2 450700.1 -7.66e7</azimuthFmRatePolynomial>
          </azimuthFmRate>
        </azimuthFmRateList>
      </generalAnnotation>
      <imageAnnotation>
        <imageInformation>
          <azimuthTimeInterval>2.055556280538332e-3</azimuthTimeInterval>
          <slantRangeTime>5.337232734606481e-3</slantRangeTime>
          <numberOfSamples>23055</numberOfSamples>
        </imageInformation>
      </imageAnnotation>
      <dopplerCentroid>
        <dcEstimateList count="2">
          <dcEstimate>
            <azimuthTime>2023-09-04T06:37:29.000000</azimuthTime>
            <dataDcPolynomial count="3">-20.03 72425.49 -1.0509e7</dataDcPolynomial>
          </dcEstimate>
          <dcEstimate>
            <azimuthTime>2023-09-04T06:37:44.000000</azimuthTime>
            <dataDcPolynomial count="3">-19.9 72400.0 -1.05e7</dataDcPolynomial>
          </dcEstimate>
        </dcEstimateList>
      </dopplerCentroid>
      <swathTiming>
        <linesPerBurst>{lines_per_burst}</linesPerBurst>
        <samplesPerBurst>23055</samplesPerBurst>
        <burstList count="{burst_count}">
        {bursts}
        </burstList>
      </swathTiming>
      <geolocationGrid>
        <geolocationGridPointList count="{2 * (burst_count + 1)}">
        {points}
        </geolocationGridPointList>
      </geolocationGrid>
    </product>"""


def calibration_xml():
    return """<?xml version="1.0"?>
    <calibration>
      <calibrationVectorList count="3">
        <calibrationVector>
          <line>0</line>
          <pixel count="3">0 10 20</pixel>
          <sigmaNought count="3">4.0 5.0 6.0</sigmaNought>
          <betaNought count="3">2.370000e+02 2.370000e+02 2.370000e+02</betaNought>
        </calibrationVector>
        <calibrationVector>
          <line>100</line>
          <pixel count="3">0 10 20</pixel>
          <sigmaNought count="3">7.0 8.0 9.0</sigmaNought>
          <betaNought count="3">2.370000e+02 2.370000e+02 2.370000e+02</betaNought>
        </calibrationVector>
        <calibrationVector>
          <line>200</line>
          <pixel count="3">0 10 20</pixel>
          <sigmaNought count="3">1.0 2.0 3.0</sigmaNought>
          <betaNought count="3">2.370000e+02 2.370000e+02 2.370000e+02</betaNought>
        </calibrationVector>
      </calibrationVectorList>
    </calibration>"""


def orbit_eof_xml():
    osvs = "\n".join(
        f"""<OSV>
          <UTC>UTC=2023-09-04T06:3{5 + i // 6}:{(i * 10) % 60:02d}.000000</UTC>
          <X unit="m">{7e6 + 1000 * i}</X><Y unit="m">{100.0 * i}</Y><Z unit="m">{50.0 * i}</Z>
          <VX unit="m/s">{7000.0}</VX><VY unit="m/s">{10.0 * i}</VY><VZ unit="m/s">{5.0}</VZ>
        </OSV>"""
        for i in range(10)
    )
    return f"""<?xml version="1.0"?>
    <Earth_Explorer_File>
      <Data_Block type="xml">
        <List_of_OSVs count="10">
        {osvs}
        </List_of_OSVs>
      </Data_Block>
    </Earth_Explorer_File>"""


class TestXmlToDict:
    def test_xmltodict_conventions(self):
        d = xml_to_dict('<a x="1"><b>t</b><c n="2">v</c><b>u</b></a>')
        assert d["a"]["@x"] == "1"
        assert d["a"]["b"] == ["t", "u"]  # repeated tags → list
        assert d["a"]["c"] == {"@n": "2", "#text": "v"}

    def test_single_child_stays_scalar(self):
        d = xml_to_dict("<a><b>only</b></a>")
        assert d["a"]["b"] == "only"


class TestAnnotationGolden:
    def test_swath_init_fixture_values(self):
        """test_s1_core.py:23-34 golden values."""
        a = parse_annotation(annotation_xml())
        assert a["start_time"] == "2023-09-04T06:37:31.072288"
        assert a["lines_per_burst"] == 1507
        assert a["samples_per_burst"] == 23055
        assert a["burst_count"] == 9

    def test_valid_sample_arrays_typed(self):
        a = parse_annotation(annotation_xml())
        assert len(a["bursts"]) == 9
        b1 = a["bursts"][0]
        assert b1["burst"] == 1
        assert b1["first_valid"] == [-1, 0, 1, 2]
        assert b1["last_valid"] == [-1, 5, 6, 7]

    def test_poly_tables(self):
        a = parse_annotation(annotation_xml())
        assert [p["coeffs"] for p in a["fm_rate"]][0] == [-2325.499, 450781.3, -7.659135e7]
        assert a["dc_estimate"][1]["coeffs"] == [-19.9, 72400.0, -1.05e7]

    def test_deramp_scalar_inputs(self):
        a = parse_annotation(annotation_xml())
        assert a["azimuth_time_interval"] == pytest.approx(2.055556280538332e-3)
        assert a["slant_range_time"] == pytest.approx(5.337232734606481e-3)
        assert a["range_sampling_rate"] == pytest.approx(6.4345241e7)
        assert a["azimuth_steering_rate"] == pytest.approx(1.590368784)
        assert a["radar_frequency"] == pytest.approx(5.40500045433435e9)
        assert a["number_of_samples"] == 23055

    def test_geolocation_grid_burst_count(self):
        """auxils.py:66-73: bursts = distinct line values − 1."""
        a = parse_annotation(annotation_xml(burst_count=9))
        assert location_grid_burst_count(a["geolocation_grid"]) == 9
        assert len(a["geolocation_grid"]) == 20
        p = a["geolocation_grid"][0]
        assert (p["line"], p["pixel"]) == (0, 0)
        assert p["lat"] == pytest.approx(40.0) and p["lon"] == pytest.approx(2.0)


class TestCalibrationGolden:
    def test_beta_nought_fixture(self):
        c = parse_calibration(calibration_xml())
        assert c["beta_nought"] == 2.37e2  # test_s1_core.py:33 golden

    def test_sigma_grid(self):
        c = parse_calibration(calibration_xml())
        assert c["lines"] == [0, 100, 200]
        assert c["pixels"] == [0, 10, 20]
        assert c["sigma"][1] == [7.0, 8.0, 9.0]

    def test_sigma_grid_feeds_calibration_operator(self):
        from eo_tools_spark.operators.slc import sigma_calibration_grid

        c = parse_calibration(calibration_xml())
        grid = sigma_calibration_grid(
            np.array(c["lines"]), np.array(c["pixels"]), np.array(c["sigma"]),
            first_line=0, naz=3, nrg=3,
        )
        # exact at grid nodes
        assert grid[0, 0] == pytest.approx(4.0)


class TestOrbitEOF:
    def test_state_vector_parse(self):
        sv = parse_orbit_eof(orbit_eof_xml())
        assert sv["t"][0] == 0.0
        assert sv["t"][1] == pytest.approx(10.0)  # UTC= prefix stripped
        assert sv["x"][3] == pytest.approx(7e6 + 3000)
        assert sv["vx"][0] == pytest.approx(7000.0)
        assert len(sv["t"]) == 10

    def test_feeds_deramp_constants(self):
        """ETL output plugs straight into the deramp chain — closing the
        'kernel, not operator' gap from round 1."""
        from eo_tools_spark.operators.slc import deramp_constants, iso_burst_t0

        a = parse_annotation(annotation_xml())
        sv = parse_orbit_eof(orbit_eof_xml())
        t0_az = iso_burst_t0(a["bursts"][0]["azimuth_time"], sv["t0"])
        kt, eta_ref, eta = deramp_constants(
            sv_t=sv["t"],
            sv_pos=np.stack([sv["x"], sv["y"], sv["z"]], 1),
            sv_vel=np.stack([sv["vx"], sv["vy"], sv["vz"]], 1),
            t0_az=t0_az,
            lines_per_burst=a["lines_per_burst"],
            azimuth_time_interval=a["azimuth_time_interval"],
            range_sampling_rate=a["range_sampling_rate"],
            slant_range_time=a["slant_range_time"],
            nrg=a["number_of_samples"],
            azimuth_steering_rate_deg=a["azimuth_steering_rate"],
            radar_frequency=a["radar_frequency"],
            fm_times=np.array(
                [iso_burst_t0(p["azimuth_time"], sv["t0"]) for p in a["fm_rate"]]
            ),
            fm_coeffs=np.array([p["coeffs"] for p in a["fm_rate"]]),
            dc_times=np.array(
                [iso_burst_t0(p["azimuth_time"], sv["t0"]) for p in a["dc_estimate"]]
            ),
            dc_coeffs=np.array([p["coeffs"] for p in a["dc_estimate"]]),
        )
        assert kt.shape == (23055,) and eta_ref.shape == (23055,)
        assert np.isfinite(kt).all() and np.isfinite(eta_ref).all()
        assert len(eta) == 1507
        # ka < 0, ks > 0 → kt = ka·ks/(ka−ks) must be positive
        assert (kt > 0).all()


class TestSparkAnnotationETL:
    def test_distributed_parse(self, spark):
        xmls = [
            ("P1", "IW1", annotation_xml(burst_count=3, lines_per_burst=100)),
            ("P1", "IW2", annotation_xml(burst_count=4, lines_per_burst=100)),
            ("P2", "IW1", annotation_xml(burst_count=2, lines_per_burst=50)),
        ]
        df = spark.createDataFrame(xmls, "product_id string, subswath string, xml string")
        summary, bursts, polys = parse_annotation_table(df)
        s = {(r.product_id, r.subswath): r for r in summary.collect()}
        assert s[("P1", "IW2")].burst_count == 4
        assert s[("P2", "IW1")].lines_per_burst == 50
        assert s[("P1", "IW1")].samples_per_burst == 23055
        b = bursts.toPandas()
        assert len(b) == 3 + 4 + 2
        assert (
            b[(b.product_id == "P1") & (b.subswath == "IW2")]["burst"].tolist()
            == [1, 2, 3, 4]
        )
        p = polys.toPandas()
        # 2 fm + 2 dc per annotation
        assert len(p) == 3 * 4
        assert set(p["kind"]) == {"fm_rate", "dc_estimate"}


class TestBurstPolygons:
    """parse_subswath_geometry semantics (auxils.py:78-121): grid →
    per-burst quads, corner order [TR, TL, BL, BR], (lon, lat) coords."""

    def test_quads_from_fixture_grid(self):
        from eo_tools_spark.sources.annotation import burst_polygons

        a = parse_annotation(annotation_xml(burst_count=3, lines_per_burst=100))
        quads = burst_polygons(a["geolocation_grid"])
        assert set(quads) == {1, 2, 3}
        # fixture grid: 2 points/line at pixels (0, 23054); line ln has
        # lat 40+0.1·ln, lon 2+0.2·px/23054 → TR=(lon(px0),lat(l_{b-1})),
        # TL=(lon(px23054),lat(l_{b-1})), BL/BR on line b
        for b, q in quads.items():
            lat_top = 40.0 + 0.1 * (b - 1)
            lat_bot = 40.0 + 0.1 * b
            assert q[0] == pytest.approx((2.0, lat_top))          # TR
            assert q[1] == pytest.approx((2.2, lat_top))          # TL
            assert q[2] == pytest.approx((2.2, lat_bot))          # BL
            assert q[3] == pytest.approx((2.0, lat_bot))          # BR

    def test_reference_stride_21(self):
        """The reference's exact hardcoded indices (tr 0, tl 20, bl 41,
        br 21, stride 21) fall out of the generalized formula at
        P=21 points/line."""
        from eo_tools_spark.sources.annotation import burst_polygons

        grid = []
        for ln in range(3):          # 2 bursts
            for px in range(21):
                grid.append(
                    {"line": ln * 1500, "pixel": px * 1000,
                     "lat": 40.0 + ln, "lon": float(px)}
                )
        quads = burst_polygons(grid)
        assert quads[1][0] == (0.0, 40.0)    # idx 0  (TR)
        assert quads[1][1] == (20.0, 40.0)   # idx 20 (TL)
        assert quads[1][2] == (20.0, 41.0)   # idx 41 (BL)
        assert quads[1][3] == (0.0, 41.0)    # idx 21 (BR)
        assert quads[2][0] == (0.0, 41.0)    # idx 21 (stride 21)

    def test_feeds_footprint_wkb(self):
        """Quads plug into the engine's WKB footprint tables (the
        get_burst_geometry consumer path)."""
        from eo_tools_spark.geo.wkb import polygon_to_wkb, wkb_to_coords
        from eo_tools_spark.sources.annotation import burst_polygons

        a = parse_annotation(annotation_xml(burst_count=2, lines_per_burst=100))
        quads = burst_polygons(a["geolocation_grid"])
        wkb = polygon_to_wkb(quads[1])
        rings = wkb_to_coords(wkb)
        assert len(rings) == 1 and len(rings[0]) >= 4
