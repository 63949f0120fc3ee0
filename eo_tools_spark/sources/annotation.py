"""Annotation / calibration / orbit XML ETL → typed side tables.

The reference reads Sentinel-1 annotation XML with xmltodict
(/root/reference/eo_tools/S1/core.py:1078-1083 read_metadata) and picks
fields out of the nested dict (core.py:184-212 swath init,
core.py:206-212 + 652-672 calibration vectors, core.py:228-262 EOF
orbit parse, /root/reference/eo_tools/auxils.py:58-97 geolocation
grid). This module re-implements that ETL with the stdlib only
(``xml_to_dict`` mirrors xmltodict's conventions: ``@attr`` keys,
``#text`` for text alongside attributes, repeated tags → lists), then
exposes the typed rows the engine's operators consume (deramp_constants
inputs, valid-sample masks, calibration grids, orbit state vectors,
geolocation-grid burst quads).

Scale shape: one annotation XML is ~1 MB per (product, subswath, pol) —
side data, not pixel data. ``parse_annotation_table`` runs the parse
distributed (mapInPandas over a table of XML strings) so a 10^6-product
catalog ETLs in one narrow pass; the per-product outputs are small
typed rows that broadcast into the pixel pipelines.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from datetime import datetime, timezone
from typing import Iterator

import numpy as np


# --------------------------------------------------- xmltodict-compatible

def _elem_to_obj(e: ET.Element):
    children = list(e)
    attrs = {f"@{k}": v for k, v in e.attrib.items()}
    if not children:
        text = e.text
        if attrs:
            if text is not None and text.strip():
                attrs["#text"] = text
            return attrs
        return text
    d = dict(attrs)
    for c in children:
        v = _elem_to_obj(c)
        if c.tag in d:
            if not isinstance(d[c.tag], list):
                d[c.tag] = [d[c.tag]]
            d[c.tag].append(v)
        else:
            d[c.tag] = v
    return d


def xml_to_dict(text: str) -> dict:
    """Parse XML into the dict shape xmltodict produces (the shape all
    reference code paths index into): attributes as ``@name``, element
    text as ``#text`` when attributes are present, repeated sibling tags
    collapsed into lists, single occurrences kept scalar."""
    root = ET.fromstring(text)
    return {root.tag: _elem_to_obj(root)}


def _as_list(x) -> list:
    return x if isinstance(x, list) else [x]


def _text(x) -> str:
    """Field value whether or not the element carried attributes."""
    return x["#text"] if isinstance(x, dict) else x


def iso_seconds(ts: str, t0: datetime | None = None) -> float:
    """ISO timestamp → seconds (since t0 when given, else epoch) — the
    isoparse + total_seconds() convention of core.py:571-575."""
    t = datetime.fromisoformat(ts)
    if t.tzinfo is None:
        t = t.replace(tzinfo=timezone.utc)
    if t0 is None:
        t0 = datetime(1970, 1, 1, tzinfo=timezone.utc)
    elif t0.tzinfo is None:
        t0 = t0.replace(tzinfo=timezone.utc)
    return (t - t0).total_seconds()


# ------------------------------------------------------------ annotation

def parse_annotation(text: str) -> dict:
    """Annotation XML → typed dict of everything the engine consumes.

    Field paths match the reference exactly:
    - swathTiming scalars (core.py:186-189)
    - burst list: azimuthTime, firstValidSample/lastValidSample int
      arrays (core.py:704-725 masking inputs)
    - imageInformation / productInformation scalars — the
      deramp_constants inputs (core.py:554-576)
    - azimuthFmRateList + dcEstimateList polynomial tables
      (core.py:586-623)
    - geolocationGridPointList (auxils.py:58-73 semantics)
    """
    meta = xml_to_dict(text)
    product = meta["product"]
    st = product["swathTiming"]
    img = product["imageAnnotation"]["imageInformation"]
    gen = product["generalAnnotation"]["productInformation"]

    bursts = []
    for i, b in enumerate(_as_list(st["burstList"]["burst"]), start=1):
        bursts.append(
            {
                "burst": i,
                "azimuth_time": b["azimuthTime"],
                "first_valid": [int(v) for v in _text(b["firstValidSample"]).split()],
                "last_valid": [int(v) for v in _text(b["lastValidSample"]).split()],
            }
        )

    def poly_rows(items, poly_key):
        rows = []
        for it in _as_list(items):
            rows.append(
                {
                    "azimuth_time": it["azimuthTime"],
                    "coeffs": [float(c) for c in _text(it[poly_key]).split(" ")],
                }
            )
        return rows

    fm = poly_rows(
        product["generalAnnotation"]["azimuthFmRateList"]["azimuthFmRate"],
        "azimuthFmRatePolynomial",
    )
    dc = poly_rows(
        product["dopplerCentroid"]["dcEstimateList"]["dcEstimate"],
        "dataDcPolynomial",
    )

    grid = []
    gl = product.get("geolocationGrid")
    if gl:
        for p in _as_list(gl["geolocationGridPointList"]["geolocationGridPoint"]):
            grid.append(
                {
                    "line": int(_text(p["line"])),
                    "pixel": int(_text(p["pixel"])),
                    "lat": float(_text(p["latitude"])),
                    "lon": float(_text(p["longitude"])),
                }
            )

    return {
        "start_time": product["adsHeader"]["startTime"],
        "lines_per_burst": int(_text(st["linesPerBurst"])),
        "samples_per_burst": int(_text(st["samplesPerBurst"])),
        "burst_count": int(st["burstList"]["@count"]),
        "azimuth_time_interval": float(_text(img["azimuthTimeInterval"])),
        "slant_range_time": float(_text(img["slantRangeTime"])),
        "number_of_samples": int(_text(img["numberOfSamples"])),
        "range_sampling_rate": float(_text(gen["rangeSamplingRate"])),
        "azimuth_steering_rate": float(_text(gen["azimuthSteeringRate"])),
        "radar_frequency": float(_text(gen["radarFrequency"])),
        "bursts": bursts,
        "fm_rate": fm,
        "dc_estimate": dc,
        "geolocation_grid": grid,
    }


def parse_calibration(text: str) -> dict:
    """Calibration XML → beta_nought scalar + sigma grid
    (core.py:206-212: beta = first value of calvec[0].betaNought;
    core.py:652-668: rows = vector lines, cols = calvec[0].pixel,
    grid = per-vector sigmaNought values)."""
    cal = xml_to_dict(text)["calibration"]
    vecs = _as_list(cal["calibrationVectorList"]["calibrationVector"])
    beta = float(_text(vecs[0]["betaNought"]).split(" ")[0])
    pixels = [int(p) for p in _text(vecs[0]["pixel"]).split(" ")]
    lines = [int(_text(v["line"])) for v in vecs]
    sigma = [[float(s) for s in _text(v["sigmaNought"]).split(" ")] for v in vecs]
    return {
        "beta_nought": beta,
        "lines": lines,
        "pixels": pixels,
        "sigma": sigma,
    }


def parse_orbit_eof(text: str) -> dict:
    """EOF orbit XML → state-vector arrays, the exact reference layout
    (core.py:241-262): Earth_Explorer_File → Data_Block → List_of_OSVs →
    OSV rows; UTC fields carry a 'UTC=' prefix stripped via [4:]; t is
    seconds since the FIRST OSV's UTC."""
    d = xml_to_dict(text)
    osvs = _as_list(
        d["Earth_Explorer_File"]["Data_Block"]["List_of_OSVs"]["OSV"]
    )
    t0 = datetime.fromisoformat(_text(osvs[0]["UTC"])[4:])
    out = {
        "t0": t0,
        "t": np.array([iso_seconds(_text(o["UTC"])[4:], t0) for o in osvs]),
    }
    for k in ("x", "y", "z", "vx", "vy", "vz"):
        out[k] = np.array([float(_text(o[k.upper()])) for o in osvs])
    return out


def location_grid_burst_count(grid: list[dict]) -> int:
    """auxils.py:66-73: number of bursts = distinct line values − 1."""
    return len({p["line"] for p in grid}) - 1


def burst_polygons(grid: list[dict]) -> dict[int, list[tuple[float, float]]]:
    """Geolocation grid → per-burst footprint quads — the reference's
    parse_subswath_geometry (auxils.py:78-121), generalized from its
    hardcoded 21 points/line to the grid's actual stride.

    Corner indices per burst b (1-based), with P points per line
    (reference: tr=0, tl=20, bl=41, br=21, stride 21):
    tr=(b−1)·P, tl=(b−1)·P+P−1, bl=b·P+P−1, br=b·P; corner order
    [top-right, top-left, bottom-left, bottom-right], coordinates as
    (lon, lat) (auxils.py:80-84 swaps (lat, lon) → (lon, lat)).
    Rows must be in annotation order (line-major) — parse_annotation
    preserves document order.
    """
    if not grid:
        return {}
    lines = sorted({p["line"] for p in grid})
    n_bursts = len(lines) - 1
    per_line = len(grid) // len(lines)
    coords = [(p["lon"], p["lat"]) for p in grid]

    out: dict[int, list[tuple[float, float]]] = {}
    for b in range(1, n_bursts + 1):
        tr = (b - 1) * per_line
        tl = (b - 1) * per_line + per_line - 1
        bl = b * per_line + per_line - 1
        br = b * per_line
        out[b] = [coords[tr], coords[tl], coords[bl], coords[br]]
    return out


# ------------------------------------------------------ Spark ETL wrapper

ANNOTATION_SUMMARY_COLUMNS = [
    "product_id", "subswath", "start_time", "lines_per_burst",
    "samples_per_burst", "burst_count", "azimuth_time_interval",
    "slant_range_time", "number_of_samples", "range_sampling_rate",
    "azimuth_steering_rate", "radar_frequency",
]


def parse_annotation_table(xml_df):
    """Distributed annotation ETL: rows (product_id, subswath, xml) →
    (summary_df, bursts_df, polys_df).

    One narrow mapInPandas pass per output table — no shuffle; the XML
    payload never leaves its partition. Outputs are the typed side
    tables the operators consume (deramp, masking, pairing).

    Cost note: each output you MATERIALIZE runs its own parse of the
    XML (three passes if you collect all three). The parse is ~ms per
    ~MB annotation, so even a 10^6-product catalog pays minutes per
    pass; if that matters, persist() the source frame (the parse is
    CPU-bound, the XML read dominates) or materialize only the tables
    you need."""
    import pandas as pd
    from pyspark.sql.types import (
        ArrayType, DoubleType, IntegerType, StringType, StructField, StructType,
    )

    summary_schema = StructType(
        [
            StructField("product_id", StringType()),
            StructField("subswath", StringType()),
            StructField("start_time", StringType()),
            StructField("lines_per_burst", IntegerType()),
            StructField("samples_per_burst", IntegerType()),
            StructField("burst_count", IntegerType()),
            StructField("azimuth_time_interval", DoubleType()),
            StructField("slant_range_time", DoubleType()),
            StructField("number_of_samples", IntegerType()),
            StructField("range_sampling_rate", DoubleType()),
            StructField("azimuth_steering_rate", DoubleType()),
            StructField("radar_frequency", DoubleType()),
        ]
    )

    def summarize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                a = parse_annotation(r.xml)
                rows.append(
                    (r.product_id, r.subswath, a["start_time"],
                     a["lines_per_burst"], a["samples_per_burst"],
                     a["burst_count"], a["azimuth_time_interval"],
                     a["slant_range_time"], a["number_of_samples"],
                     a["range_sampling_rate"], a["azimuth_steering_rate"],
                     a["radar_frequency"])
                )
            yield pd.DataFrame(rows, columns=ANNOTATION_SUMMARY_COLUMNS)

    bursts_schema = StructType(
        [
            StructField("product_id", StringType()),
            StructField("subswath", StringType()),
            StructField("burst", IntegerType()),
            StructField("azimuth_time", StringType()),
            StructField("first_valid", ArrayType(IntegerType())),
            StructField("last_valid", ArrayType(IntegerType())),
        ]
    )

    def burst_rows(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                for b in parse_annotation(r.xml)["bursts"]:
                    rows.append(
                        (r.product_id, r.subswath, b["burst"], b["azimuth_time"],
                         b["first_valid"], b["last_valid"])
                    )
            yield pd.DataFrame(
                rows,
                columns=["product_id", "subswath", "burst", "azimuth_time",
                         "first_valid", "last_valid"],
            )

    polys_schema = StructType(
        [
            StructField("product_id", StringType()),
            StructField("subswath", StringType()),
            StructField("kind", StringType()),  # fm_rate | dc_estimate
            StructField("azimuth_time", StringType()),
            StructField("coeffs", ArrayType(DoubleType())),
        ]
    )

    def poly_rows(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                a = parse_annotation(r.xml)
                for kind in ("fm_rate", "dc_estimate"):
                    for p in a[kind]:
                        rows.append(
                            (r.product_id, r.subswath, kind,
                             p["azimuth_time"], p["coeffs"])
                        )
            yield pd.DataFrame(
                rows,
                columns=["product_id", "subswath", "kind", "azimuth_time", "coeffs"],
            )

    src = xml_df.select("product_id", "subswath", "xml")
    return (
        src.mapInPandas(summarize, schema=summary_schema),
        src.mapInPandas(burst_rows, schema=bursts_schema),
        src.mapInPandas(poly_rows, schema=polys_schema),
    )
