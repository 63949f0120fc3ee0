"""Orbit-file selection semantics (the reference's getOSV contract,
/root/reference/eo_tools/S1/core.py:228-240, over the public
Copernicus auxiliary filename convention): validity coverage, mission
match, POE-over-RES preference, latest generation wins, and the
reference's no-orbit RuntimeError."""

from datetime import datetime

import pytest

from eo_tools_spark.sources.orbits import (
    fetch_orbit,
    parse_orbit_name,
    select_orbit_file,
)


def eof(mission="S1A", otype="POEORB", gen="20200105T120000",
        vstart="20200101T225942", vstop="20200103T005942"):
    return (
        f"{mission}_OPER_AUX_{otype}_OPOD_{gen}_V{vstart}_{vstop}.EOF"
    )

ACQ = (datetime(2020, 1, 2, 6, 0, 0), datetime(2020, 1, 2, 6, 0, 25))


class TestParse:
    def test_fields(self):
        p = parse_orbit_name(eof())
        assert p["mission"] == "S1A"
        assert p["type"] == "POEORB"
        assert p["validity_start"] == datetime(2020, 1, 1, 22, 59, 42)
        assert p["validity_stop"] == datetime(2020, 1, 3, 0, 59, 42)

    def test_non_orbit_names_ignored(self):
        assert parse_orbit_name("manifest.safe") is None
        assert parse_orbit_name("S1A_IW_SLC__1SDV_20200102.zip") is None

    def test_path_prefix_and_zip_suffix(self):
        assert parse_orbit_name("/orb/" + eof().replace(".EOF", ".zip"))


class TestSelect:
    def test_prefers_precise_over_restituted(self):
        names = [
            eof(otype="RESORB", gen="20200102T070000",
                vstart="20200102T054500", vstop="20200102T073000"),
            eof(otype="POEORB"),
        ]
        assert "POEORB" in select_orbit_file(names, "S1A", *ACQ)

    def test_falls_back_to_restituted(self):
        names = [
            eof(otype="RESORB", gen="20200102T070000",
                vstart="20200102T054500", vstop="20200102T073000"),
            # precise file does NOT cover the acquisition
            eof(otype="POEORB", vstart="20191225T000000",
                vstop="20191227T000000"),
        ]
        assert "RESORB" in select_orbit_file(names, "S1A", *ACQ)

    def test_latest_generation_wins(self):
        old = eof(gen="20200104T120000")
        new = eof(gen="20200110T120000")
        assert select_orbit_file([old, new], "S1A", *ACQ) == new
        assert select_orbit_file([new, old], "S1A", *ACQ) == new

    def test_mission_and_coverage_filters(self):
        names = [
            eof(mission="S1B"),                       # wrong mission
            eof(vstart="20200102T060010",             # starts after acq
                vstop="20200103T000000"),
        ]
        with pytest.raises(RuntimeError, match="No orbit file available"):
            select_orbit_file(names, "S1A", *ACQ)

    def test_osv_type_restriction(self):
        names = [eof(otype="POEORB")]
        with pytest.raises(RuntimeError, match="No orbit file available"):
            select_orbit_file(names, "S1A", *ACQ, osv_types=("RESORB",))


class TestFetchSeam:
    def test_requires_seams(self):
        with pytest.raises(NotImplementedError, match="lister"):
            fetch_orbit("S1A", *ACQ)

    def test_end_to_end_with_fake_catalog(self):
        osv = (
            "<Earth_Explorer_File><Data_Block><List_of_OSVs>"
            "<OSV><UTC>UTC=2020-01-02T05:59:42</UTC>"
            "<X>1.0</X><Y>2.0</Y><Z>3.0</Z>"
            "<VX>4.0</VX><VY>5.0</VY><VZ>6.0</VZ></OSV>"
            "<OSV><UTC>UTC=2020-01-02T05:59:52</UTC>"
            "<X>1.5</X><Y>2.5</Y><Z>3.5</Z>"
            "<VX>4.5</VX><VY>5.5</VY><VZ>6.5</VZ></OSV>"
            "</List_of_OSVs></Data_Block></Earth_Explorer_File>"
        )
        fetched = []

        def fetcher(name):
            fetched.append(name)
            return osv.encode()

        sv = fetch_orbit(
            "S1A", *ACQ, lister=lambda: [eof()], fetcher=fetcher
        )
        assert fetched == [eof()]
        assert sv["t"].tolist() == [0.0, 10.0]
        assert sv["x"].tolist() == [1.0, 1.5]
        assert sv["vz"].tolist() == [6.0, 6.5]
