"""Geocoding core: DEM pixel → (azimuth, range) radar coordinates.

The reference solves the zero-Doppler equation per pixel in a numba
prange loop (/root/reference/eo_tools/S1/core.py:1292-1374). Here the
bisection runs VECTORIZED over whole pixel batches (numpy, inside
mapInPandas over DEM tiles) — the Spark-first equivalent: orbit state
vectors are a broadcast table; each DEM tile is one Arrow row; output is
the LUT (az, rg per DEM pixel) that drives the resample gather join.

Numeric contract (pinned by the analytic oracle,
/root/reference/tests/test_s1_core.py:202-217): linear interpolation of
positions/velocities between integer orbit indices, Doppler
fc = -(v·d)/|d|, bisection to |fc| < tol, NaN where no sign change.

ECEF transform: WGS84 closed form (core.py:1214-1289 math).
Remap (LUT gather): nearest / bilinear / bicubic (reference default) /
bicubic6, NaN outside the source grid, border clamp
(/root/reference/eo_tools/S1/util.py:100-213 contract: in-bounds coords
produce no NaN, tests/test_s1_util.py:10-22).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563
WGS84_E2 = WGS84_F * (2 - WGS84_F)


def lla_to_ecef(lat_deg, lon_deg, alt):
    """WGS84 geodetic → ECEF (vectorized)."""
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    lon = np.radians(np.asarray(lon_deg, dtype=np.float64))
    alt = np.asarray(alt, dtype=np.float64)
    sin_lat, cos_lat = np.sin(lat), np.cos(lat)
    n = WGS84_A / np.sqrt(1 - WGS84_E2 * sin_lat**2)
    x = (n + alt) * cos_lat * np.cos(lon)
    y = (n + alt) * cos_lat * np.sin(lon)
    z = (n * (1 - WGS84_E2) + alt) * sin_lat
    return x, y, z


def _doppler(t, x, y, z, P, V):
    """Doppler frequency at fractional orbit index t (vectorized over
    pixels). Linear SV interpolation — the reference's exact scheme."""
    t0 = np.floor(t).astype(np.int64)
    t1 = np.ceil(t).astype(np.int64)
    f = t - t0
    px = P[t0, 0] + f * (P[t1, 0] - P[t0, 0])
    py = P[t0, 1] + f * (P[t1, 1] - P[t0, 1])
    pz = P[t0, 2] + f * (P[t1, 2] - P[t0, 2])
    vx = V[t0, 0] + f * (V[t1, 0] - V[t0, 0])
    vy = V[t0, 1] + f * (V[t1, 1] - V[t0, 1])
    vz = V[t0, 2] + f * (V[t1, 2] - V[t0, 2])
    dx, dy, dz = x - px, y - py, z - pz
    d2 = dx * dx + dy * dy + dz * dz
    fc = -(vx * dx + vy * dy + vz * dz) / np.sqrt(d2)
    return fc, dx, dy, dz


def range_doppler(xx, yy, zz, positions, velocities, tol=1e-8, maxiter=10000):
    """Vectorized zero-Doppler solve. Returns (i_zd, r_zd, dx, dy, dz);
    NaN where the Doppler sign does not change over the orbit span."""
    x = np.asarray(xx, dtype=np.float64).ravel()
    y = np.asarray(yy, dtype=np.float64).ravel()
    z = np.asarray(zz, dtype=np.float64).ravel()
    P = np.asarray(positions, dtype=np.float64)
    V = np.asarray(velocities, dtype=np.float64)
    n = len(x)
    nb = len(P) - 1

    valid = ~np.isnan(x)
    a = np.zeros(n)
    b = np.full(n, float(nb))
    fa, _, _, _ = _doppler(a, x, y, z, P, V)
    fb, _, _, _ = _doppler(b, x, y, z, P, V)
    no_root = np.sign(fa * fb) > 0
    # endpoint roots early-exit BEFORE the bisection, exactly like the
    # reference (core.py:1340-1346): |fa|<tol → (i=0, r=0), else
    # |fb|<tol → (i=nb, r=0); the reference `continue`s without ever
    # writing dx/dy/dz, so those stay 0 for endpoint rows — r=0 maps to
    # a far-negative range index that radar_index_mask discards
    root_a = valid & ~no_root & (np.abs(fa) < tol)
    root_b = valid & ~no_root & ~root_a & (np.abs(fb) < tol)
    endpoint = root_a | root_b
    live = valid & ~no_root & ~endpoint

    c = (a + b) / 2.0
    fc, _, _, _ = _doppler(np.clip(c, 0, nb), x, y, z, P, V)
    it = 0
    while it < maxiter:
        act = live & (np.abs(fc) > tol)
        if not act.any():
            break
        it += 1
        left = act & (fa * fc < 0)
        right = act & ~left
        b[left] = c[left]
        fb[left] = fc[left]
        a[right] = c[right]
        fa[right] = fc[right]
        c = np.where(act, (a + b) / 2.0, c)
        fc_new, _, _, _ = _doppler(np.clip(c, 0, nb), x, y, z, P, V)
        fc = np.where(act, fc_new, fc)

    c = np.where(root_a, 0.0, c)
    c = np.where(root_b, float(nb), c)
    _, dx, dy, dz = _doppler(np.clip(c, 0, nb), x, y, z, P, V)
    r = np.sqrt(dx * dx + dy * dy + dz * dz)
    r = np.where(endpoint, 0.0, r)
    for d in (dx, dy, dz):
        d[endpoint] = 0.0
    bad = ~valid | no_root
    i_zd = np.where(bad, np.nan, c)
    r_zd = np.where(bad, np.nan, r)
    return i_zd, r_zd, np.where(bad, np.nan, dx), np.where(bad, np.nan, dy), np.where(bad, np.nan, dz)


# ------------------------------------------------- LUT over DEM tiles

LUT_SCHEMA = StructType(
    [
        StructField("dem_tile_id", StringType()),
        StructField("az", BinaryType()),   # float64 (th*tw)
        StructField("rg", BinaryType()),
        StructField("th", IntegerType()),
        StructField("tw", IntegerType()),
    ]
)


def geocode_dem_tiles(
    dem_tiles: DataFrame,
    positions: np.ndarray,
    velocities: np.ndarray,
    slant_range_to_index=None,
) -> DataFrame:
    """Per DEM tile: (lat, lon, alt grids) → LUT (az, rg) arrays.

    dem_tiles rows: (dem_tile_id, minx, miny, maxx, maxy, elev:binary
    float32 th×tw, th, tw). Orbit arrays are broadcast (tiny).
    ``slant_range_to_index``: optional range→index conversion
    (r - r0)/dr from annotation constants (core.py:484-488)."""
    spark = dem_tiles.sparkSession
    bc = spark.sparkContext.broadcast((positions, velocities))

    def geocode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        P, V = bc.value
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                th, tw = int(r.th), int(r.tw)
                elev = np.frombuffer(bytes(r.elev), dtype=np.float32).reshape(th, tw)
                lons = np.linspace(r.minx, r.maxx, tw)
                lats = np.linspace(r.maxy, r.miny, th)  # north-up raster
                lon_g, lat_g = np.meshgrid(lons, lats)
                x, y, z = lla_to_ecef(lat_g.ravel(), lon_g.ravel(), elev.ravel().astype(np.float64))
                az, rg, _, _, _ = range_doppler(x, y, z, P, V)
                if slant_range_to_index is not None:
                    rg = slant_range_to_index(rg)
                out.append((r.dem_tile_id, az.tobytes(), rg.tobytes(), th, tw))
            yield pd.DataFrame(out, columns=[f.name for f in LUT_SCHEMA.fields])

    return dem_tiles.mapInPandas(geocode, schema=LUT_SCHEMA)


def upsample_dem_tiles(dem_tiles: DataFrame, factor: float) -> DataFrame:
    """DEM on-read upsampling (reference DEFAULT path: dem_upsampling
    = 1.8, process.py:93 + core.py:1153-1176): per DEM tile, bilinear-
    resample the elevation grid to (int(th·f), int(tw·f)) — rasterio
    out_shape + Resampling.bilinear semantics. Narrow mapInPandas, no
    shuffle; feeds geocode_dem_tiles.

    Semantics notes:
    - A DEM tile here is the analog of ONE reference DEM FILE
      (retrieve_dem writes one self-contained raster per burst-range
      union; load_dem_coords upsamples that single file). Edge clamping
      therefore matches rasterio's behavior at file borders EXACTLY —
      this is per-file resampling, NOT a halo stencil over blocks of a
      larger raster. If you tile one DEM into several rows, upsample
      before tiling.
    - Coordinate registration: the resample uses GDAL's pixel-CENTER
      convention; geocode_dem_tiles assigns lat/lon with a node-based
      linspace over the bbox. The bbox of each output row is ADJUSTED
      so the node linspace lands exactly on the resampled sample
      positions (the sample position is linear in the output index, so
      a node grid through its endpoints reproduces it exactly) — the
      engine equivalent of the reference's affine-transform rescale
      (core.py:1168-1171).
    """
    if factor == 1:
        return dem_tiles
    if factor < 1:
        # a downsampling factor can emit 1-sample axes whose bbox node
        # spacing is undefined — this is an UPsampler (reference default
        # dem_upsampling=1.8, never <1)
        raise ValueError(f"dem upsampling factor must be >= 1, got {factor}")
    schema = dem_tiles.schema

    def up(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from eo_tools_spark.functions.imaging import resize_bilinear_float

        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                d = r._asdict()
                th, tw = int(d["th"]), int(d["tw"])
                if th < 2 or tw < 2:
                    # bbox node spacing (maxx-minx)/(tw-1) is undefined
                    # for a 1-sample axis — no resample is meaningful
                    raise ValueError(
                        f"upsample_dem_tiles: DEM tile {d.get('dem_tile_id')!r} "
                        f"is {th}x{tw}; tiles must be at least 2x2"
                    )
                elev = np.frombuffer(bytes(d["elev"]), dtype=np.float32).reshape(th, tw)
                nh, nw = int(th * factor), int(tw * factor)
                d["elev"] = resize_bilinear_float(elev, nh, nw).astype(np.float32).tobytes()
                # sample position of output index j (input px units):
                # s_j = (j+0.5)·n/out − 0.5; remap bbox so that
                # linspace(min', max', out) == coords(s_0 .. s_out-1)
                dx = (d["maxx"] - d["minx"]) / (tw - 1)
                dy = (d["maxy"] - d["miny"]) / (th - 1)
                sx0 = 0.5 * tw / nw - 0.5
                sx1 = (nw - 0.5) * tw / nw - 0.5
                sy0 = 0.5 * th / nh - 0.5
                sy1 = (nh - 0.5) * th / nh - 0.5
                minx = d["minx"]
                maxy = d["maxy"]  # north-up: row 0 at maxy
                d["minx"] = minx + sx0 * dx
                d["maxx"] = minx + sx1 * dx
                d["maxy"] = maxy - sy0 * dy
                d["miny"] = maxy - sy1 * dy
                d["th"], d["tw"] = nh, nw
                out.append(d)
            # explicit columns: a 0-row batch would otherwise yield a
            # ZERO-column frame that can't match the mapInPandas schema
            yield pd.DataFrame(out, columns=[f.name for f in schema.fields])

    return dem_tiles.mapInPandas(up, schema=schema)


def radar_index_mask(az: np.ndarray, rg: np.ndarray, naz: int, nrg: int):
    """Validity mask: NaN outside [0, naz) × [0, nrg)
    (core.py:490-495 semantics)."""
    bad = ~((az >= 0) & (az < naz) & (rg >= 0) & (rg < nrg))
    return np.where(bad, np.nan, az), np.where(bad, np.nan, rg)


# ----------------------------------------------------------- remap
#
# Kernel family + semantics match /root/reference/eo_tools/S1/util.py:
# kernels at 100-147 (nearest / linear / Keys 4-pt cubic / Keys81 6-pt
# cubic), gather loop at 150-213: in-bounds test r∈[0,h) (NOT [0,h-1]),
# support window [floor-H, ceil+H] with margins H = 0/0/1/2, and
# nearest-neighbor CLAMP at image borders (i2 = clip(i, 0, h-1)) — so
# coordinates in (h-1, h) resolve via border extension, not NaN. The
# numba prange loop becomes a fully vectorized numpy tap-sum (the same
# math, (2H+2)² gathers per pixel), run inside Arrow batches.


def _ker_near(x: np.ndarray) -> np.ndarray:
    ax = np.abs(x)
    return np.where(ax < 0.5, 1.0, np.where(ax == 0.5, 0.5, 0.0))


def _ker_lin(x: np.ndarray) -> np.ndarray:
    ax = np.abs(x)
    return np.where(ax < 1, 1.0 - ax, 0.0)


def _ker_cub(x: np.ndarray) -> np.ndarray:
    ax = np.abs(x)
    return np.where(
        ax < 1,
        1.5 * ax**3 - 2.5 * ax**2 + 1,
        np.where(ax < 2, -0.5 * ax**3 + 2.5 * ax**2 - 4 * ax + 2, 0.0),
    )


def _ker_cub6(x: np.ndarray) -> np.ndarray:
    """6-point cubic (Keys 1981), exact reference coefficients
    (util.py:130-147)."""
    ax = np.abs(x)
    ax2 = ax**2
    ax3 = ax**3
    return np.where(
        ax < 1,
        4 * ax3 / 3 - 7 * ax2 / 3 + 1,
        np.where(
            ax < 2,
            -7 * ax3 / 12 + 3 * ax2 - 59 * ax / 12 + 15 / 6,
            np.where(ax < 3, ax3 / 12 - 2 * ax2 / 3 + 21 * ax / 12 - 3 / 2, 0.0),
        ),
    )


#: kernel name → (weight function, half-margin H in pixels). H also
#: sizes the halo a tile gather must fetch beyond its LUT bbox.
KERNELS = {
    "nearest": (_ker_near, 0),
    "bilinear": (_ker_lin, 0),
    "bicubic": (_ker_cub, 1),
    "bicubic6": (_ker_cub6, 2),
}


def kernel_margin(kernel: str) -> int:
    """Extra source pixels needed on each side of a gather window."""
    if kernel not in KERNELS:
        raise ValueError(f"unknown kernel {kernel!r}")
    return KERNELS[kernel][1]


def _remap_real(img: np.ndarray, r: np.ndarray, c: np.ndarray, kernel: str) -> np.ndarray:
    ker, H = KERNELS[kernel]
    h, w = img.shape
    out = np.full(r.shape, np.nan, dtype=np.float64)
    ok = (
        ~np.isnan(r) & ~np.isnan(c)
        & (r >= 0) & (r < h) & (c >= 0) & (c < w)
    )
    rr, cc = r[ok], c[ok]
    r0 = np.floor(rr) - H
    c0 = np.floor(cc) - H
    # reference window is [floor-H, ceil+H]; the uniform 2H+2-tap loop
    # adds one extra tap at integer coordinates. Its weight is 0, but
    # 0·NaN = NaN, so it must be EXCLUDED (masked), not just zeroed —
    # while zero-weight taps INSIDE the window keep the reference's NaN
    # propagation (the reference multiplies them too).
    r_hi = np.ceil(rr) + H
    c_hi = np.ceil(cc) + H
    val = np.zeros(rr.shape, dtype=np.float64)
    img64 = img.astype(np.float64, copy=False)
    for ki in range(2 * H + 2):
        i = r0 + ki
        wi = ker(rr - i)
        in_i = i <= r_hi
        i2 = np.clip(i, 0, h - 1).astype(np.int64)
        for kj in range(2 * H + 2):
            j = c0 + kj
            wj = ker(cc - j)
            j2 = np.clip(j, 0, w - 1).astype(np.int64)
            val += np.where(in_i & (j <= c_hi), wi * wj * img64[i2, j2], 0.0)
    out[ok] = val
    return out


def _referenced_bbox(az, rg, naz, nrg, H):
    """Global-border-clipped (a0, a1, c0, c1) of the SAR pixels an LUT
    block references (incl. kernel margin H), or None if no valid
    coordinate."""
    ok = ~np.isnan(az) & ~np.isnan(rg)
    ok &= (az >= 0) & (az < naz) & (rg >= 0) & (rg < nrg)
    if not ok.any():
        return None
    a0 = max(int(np.floor(az[ok].min())) - H, 0)
    a1 = min(int(np.ceil(az[ok].max())) + H, naz - 1)
    c0 = max(int(np.floor(rg[ok].min())) - H, 0)
    c1 = min(int(np.ceil(rg[ok].max())) + H, nrg - 1)
    return a0, a1, c0, c1


def _lut_any_needs_split(
    lut: DataFrame, naz: int, nrg: int, H: int, max_patch_pixels: int
) -> bool:
    """Build-time probe for the patch budget: does ANY LUT tile's
    referenced bbox exceed it? Decodes az/rg once (unavoidable — the
    answer depends on the values) but ships only the ids of offending
    tiles, never re-serialized payloads, and also validates the
    '#'-free id invariant eagerly. A tile needs splitting iff its
    TOP-LEVEL bbox is over budget — recursion only decides how far to
    split, not whether."""
    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType([StructField("dem_tile_id", StringType())])

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hits = []
            for r in pdf.itertuples():
                if "#" in r.dem_tile_id:
                    raise ValueError(
                        f"sar2geo_tiles: dem_tile_id {r.dem_tile_id!r} contains "
                        "'#' — reserved for the patch-budget sub-tile suffix"
                    )
                th, tw = int(r.th), int(r.tw)
                az = np.frombuffer(bytes(r.az), dtype=np.float64).reshape(th, tw)
                rg = np.frombuffer(bytes(r.rg), dtype=np.float64).reshape(th, tw)
                bbox = _referenced_bbox(az, rg, naz, nrg, H)
                if bbox is None:
                    continue
                a0, a1, c0, c1 = bbox
                if (a1 - a0 + 1) * (c1 - c0 + 1) > max_patch_pixels:
                    hits.append((r.dem_tile_id,))
            yield pd.DataFrame(hits, columns=["dem_tile_id"])

    return (
        lut.select("dem_tile_id", "az", "rg", "th", "tw")
        .mapInPandas(probe, schema=schema)
        .limit(1)
        .count()
        > 0
    )


def _split_warped_lut(
    lut: DataFrame, naz: int, nrg: int, H: int, max_patch_pixels: int
) -> DataFrame:
    """Patch-memory guard: recursively halve LUT tiles whose referenced
    (az, rg) bbox exceeds ``max_patch_pixels`` along their longer LUT
    axis, so no single gather task ever assembles a patch bigger than
    the budget (a strongly warped LUT — e.g. a rotation — can reference
    an area orders of magnitude larger than the tile; VERDICT r2 #3).

    Sub-tiles carry ``{id}#{r0}:{c0}:{TH}:{TW}`` ids (offset + ORIGINAL
    shape) that _reassemble_split_tiles pastes back — output is
    bit-identical to the unsplit gather because each sub-patch keeps the
    full kernel margin H and global-border clipping. Fails loudly when
    even a single LUT pixel's (2H+2)² support exceeds the budget."""
    schema = lut.schema

    def split(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                if "#" in r.dem_tile_id:
                    raise ValueError(
                        f"sar2geo_tiles: dem_tile_id {r.dem_tile_id!r} contains "
                        "'#' — reserved for the patch-budget sub-tile suffix"
                    )
                th, tw = int(r.th), int(r.tw)
                az = np.frombuffer(bytes(r.az), dtype=np.float64).reshape(th, tw)
                rg = np.frombuffer(bytes(r.rg), dtype=np.float64).reshape(th, tw)
                stack = [(0, 0, az, rg)]
                parts = []
                while stack:
                    r0, c0, a, g = stack.pop()
                    bbox = _referenced_bbox(a, g, naz, nrg, H)
                    if bbox is None:
                        continue
                    a0, a1, c0b, c1b = bbox
                    if (a1 - a0 + 1) * (c1b - c0b + 1) <= max_patch_pixels:
                        parts.append((r0, c0, a, g))
                    elif a.shape[0] == 1 and a.shape[1] == 1:
                        raise ValueError(
                            f"sar2geo_tiles: LUT tile {r.dem_tile_id!r} pixel "
                            f"({r0},{c0}) needs a {(a1-a0+1)}x{(c1b-c0b+1)} patch "
                            f"> max_patch_pixels={max_patch_pixels}; raise the "
                            "budget (it must cover one kernel support)"
                        )
                    elif a.shape[0] >= a.shape[1]:
                        m = a.shape[0] // 2
                        stack.append((r0, c0, a[:m], g[:m]))
                        stack.append((r0 + m, c0, a[m:], g[m:]))
                    else:
                        m = a.shape[1] // 2
                        stack.append((r0, c0, a[:, :m], g[:, :m]))
                        stack.append((r0, c0 + m, a[:, m:], g[:, m:]))
                if len(parts) == 1 and parts[0][0] == 0 and parts[0][1] == 0 \
                        and parts[0][2].shape == (th, tw):
                    rows.append((r.dem_tile_id, bytes(r.az), bytes(r.rg), th, tw))
                    continue
                for r0, c0, a, g in parts:
                    rows.append(
                        (f"{r.dem_tile_id}#{r0}:{c0}:{th}:{tw}",
                         np.ascontiguousarray(a).tobytes(),
                         np.ascontiguousarray(g).tobytes(),
                         a.shape[0], a.shape[1])
                    )
            yield pd.DataFrame(
                rows, columns=["dem_tile_id", "az", "rg", "th", "tw"]
            )

    return lut.mapInPandas(split, schema=schema)


def _reassemble_split_tiles(out: DataFrame) -> DataFrame:
    """Paste ``{id}#{r0}:{c0}:{TH}:{TW}`` sub-tiles back into full
    (TH, TW) tiles; pass unsplit rows through untouched. Sub-regions no
    part produced (fully OOB) stay NaN — identical to the unsplit
    gather's NaN at those pixels."""
    from pyspark.sql import functions as F

    from eo_tools_spark.operators.tiles import _DTYPES

    out = out.withColumn(
        "_base", F.split(F.col("dem_tile_id"), "#").getItem(0)
    )
    schema = StructType(
        [
            StructField("dem_tile_id", StringType()),
            StructField("data", BinaryType()),
            StructField("th", IntegerType()),
            StructField("tw", IntegerType()),
            StructField("kind", StringType()),
        ]
    )

    def paste(key, pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 1 and "#" not in pdf.iloc[0].dem_tile_id:
            return pdf[["dem_tile_id", "data", "th", "tw", "kind"]]
        kind = pdf.iloc[0].kind
        dt = _DTYPES[kind]
        suffix = pdf.iloc[0].dem_tile_id.split("#", 1)[1]
        TH, TW = (int(v) for v in suffix.split(":")[2:4])
        nanv = (np.nan + 1j * np.nan) if kind == "c8" else np.nan
        canvas = np.full((TH, TW), nanv, dtype=dt)
        for r in pdf.itertuples():
            r0, c0 = (int(v) for v in r.dem_tile_id.split("#", 1)[1].split(":")[:2])
            th, tw = int(r.th), int(r.tw)
            canvas[r0 : r0 + th, c0 : c0 + tw] = np.frombuffer(
                bytes(r.data), dtype=dt
            ).reshape(th, tw)
        return pd.DataFrame(
            [(key[0], canvas.tobytes(), TH, TW, kind)],
            columns=["dem_tile_id", "data", "th", "tw", "kind"],
        )

    return out.groupBy("_base").applyInPandas(paste, schema=schema)


def sar2geo_tiles(
    lut: DataFrame,
    sar_tiles: DataFrame,
    naz: int,
    nrg: int,
    tile: int,
    kernel: str = "bicubic",
    out_kind: str = "c8",
    raster_id: str | None = None,
    max_patch_pixels: int | None = None,
) -> DataFrame:
    """Distributed LUT gather join (sar2geo/align semantics,
    /root/reference/eo_tools/S1/process.py:1461-1549 + core.py:921-934):
    every geo-grid LUT tile gathers the SAR pixels its (az, rg) values
    reference, kernel-resampled with the reference's remap (incl. the
    halo margin H = kernel_margin(kernel) around the referenced range,
    util.py:176-186).

    Plan shape (the join IS data-dependent — which SAR tiles an output
    tile needs depends on the LUT VALUES, not its position):
    1. one narrow pass over LUT tiles emits (dem_tile_id, ty, tx)
       needed-tile keys from the az/rg min/max ± H (tiny output,
       ~1-6 keys per LUT tile for near-identity LUTs);
    2. equi-join those keys with the SAR tile table (shuffle on the
       tile key — the only big exchange);
    3. cogroup by dem_tile_id with the LUT rows (LUT bytes are NOT
       replicated per SAR tile) and remap each output tile against its
       assembled local patch. Global-border clamp is preserved: the
       patch is clipped to [0, naz)×[0, nrg), so patch edges coincide
       with image edges exactly where clamping can occur.

    ``lut`` rows: LUT_SCHEMA (az/rg float64 bytes, th, tw).
    ``sar_tiles`` rows: tiles.TILE_SCHEMA with nominal size ``tile``.
    Output: (dem_tile_id, data, th, tw, kind).

    ``max_patch_pixels`` bounds the per-task local patch: geocoding LUTs
    are smooth, so the referenced bbox is near-tile-sized in practice —
    but a strongly warped LUT tile (rotation, fold) can reference an
    area orders of magnitude larger than the tile and balloon one task.
    With a budget set, such tiles are recursively halved until every
    sub-gather fits (bit-identical output, reassembled after the
    gather; fails loudly if one pixel's kernel support alone exceeds
    the budget). dem_tile_id must not contain '#' when a budget is set
    (reserved for the sub-tile suffix). A build-time probe (one narrow
    pass over the LUT) checks whether anything actually split: on a
    smooth LUT the budget is free insurance — the original frame is
    used and the reassembly shuffle is not planned at all.
    """
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.types import IntegerType

    from eo_tools_spark.operators.tiles import _decode, _DTYPES

    H = kernel_margin(kernel)
    split_applied = False
    if max_patch_pixels is not None:
        # Build-time probe: does any LUT tile actually need splitting?
        # Bbox-only — decodes az/rg but never re-serializes payloads —
        # and validates the '#'-free id invariant eagerly. In the
        # common smooth-LUT case nothing splits, so the gather skips
        # both the split kernel and the reassembly's full-output
        # shuffle + Arrow round-trip; when splitting IS needed the
        # probe's cost is one narrow LUT pass on top of the real work.
        split_applied = _lut_any_needs_split(lut, naz, nrg, H, max_patch_pixels)
        if split_applied:
            # the split frame feeds TWO consumers of the final job (the
            # keys pass under the join, and the cogroup side) — without
            # a persist the split kernel AND the upstream LUT build
            # (zero-Doppler bisection) run twice. Handle rides the
            # returned frame per the winnow_candidates convention.
            lut = _split_warped_lut(lut, naz, nrg, H, max_patch_pixels).persist()

    key_schema = StructType(
        [
            StructField("dem_tile_id", StringType()),
            StructField("ty", IntegerType()),
            StructField("tx", IntegerType()),
        ]
    )

    def keys(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                az = np.frombuffer(bytes(r.az), dtype=np.float64)
                rg = np.frombuffer(bytes(r.rg), dtype=np.float64)
                bbox = _referenced_bbox(az, rg, naz, nrg, H)
                if bbox is None:
                    continue
                a0, a1, c0, c1 = bbox
                for ty in range(a0 // tile, a1 // tile + 1):
                    for tx in range(c0 // tile, c1 // tile + 1):
                        rows.append((r.dem_tile_id, ty, tx))
            yield pd.DataFrame(rows, columns=["dem_tile_id", "ty", "tx"])

    # one gather targets ONE raster: filter when told which, and guard
    # at execution otherwise (a multi-raster tile table joined on bare
    # (ty, tx) would silently interleave pixels from different rasters)
    if raster_id is not None:
        sar_tiles = sar_tiles.where(F.col("raster_id") == raster_id)
    need = lut.select("dem_tile_id", "az", "rg").mapInPandas(keys, schema=key_schema)
    picked = need.join(sar_tiles, ["ty", "tx"])

    out_schema = StructType(
        [
            StructField("dem_tile_id", StringType()),
            StructField("data", BinaryType()),
            StructField("th", IntegerType()),
            StructField("tw", IntegerType()),
            StructField("kind", StringType()),
        ]
    )

    def gather(key, sar_pdf: pd.DataFrame, lut_pdf: pd.DataFrame) -> pd.DataFrame:
        if lut_pdf.empty or sar_pdf.empty:
            return pd.DataFrame(columns=[f.name for f in out_schema.fields])
        rids = sar_pdf["raster_id"].unique()
        if len(rids) > 1:
            raise ValueError(
                f"sar2geo_tiles: tile table holds {len(rids)} rasters "
                f"({sorted(rids)[:4]}...); pass raster_id= to pick one"
            )
        lr = lut_pdf.iloc[0]
        th, tw = int(lr.th), int(lr.tw)
        az = np.frombuffer(bytes(lr.az), dtype=np.float64).reshape(th, tw)
        rg = np.frombuffer(bytes(lr.rg), dtype=np.float64).reshape(th, tw)
        # local patch bounds (global-border clipped, see docstring) —
        # the SAME predicate/margin as keys() and the split pre-pass
        # (_referenced_bbox), or split sub-tiles would desync from
        # their gathered patches
        ok = ~np.isnan(az) & ~np.isnan(rg)
        ok &= (az >= 0) & (az < naz) & (rg >= 0) & (rg < nrg)
        a0, a1, c0, c1 = _referenced_bbox(az, rg, naz, nrg, H)
        kind = sar_pdf.iloc[0].kind
        nanv = (np.nan + 1j * np.nan) if kind == "c8" else np.nan
        patch = np.full(
            (a1 - a0 + 1, c1 - c0 + 1),
            nanv,
            dtype=np.complex128 if kind == "c8" else np.float64,
        )
        for r in sar_pdf.itertuples():
            blk = _decode(bytes(r.data), int(r.th), int(r.tw), r.kind)
            y0, x0 = int(r.ty) * tile, int(r.tx) * tile
            ys = slice(max(a0 - y0, 0), min(a1 + 1 - y0, int(r.th)))
            xs = slice(max(c0 - x0, 0), min(c1 + 1 - x0, int(r.tw)))
            if ys.start >= ys.stop or xs.start >= xs.stop:
                continue
            patch[y0 + ys.start - a0 : y0 + ys.stop - a0,
                  x0 + xs.start - c0 : x0 + xs.stop - c0] = blk[ys, xs]
        # shift coords into patch space; remap's in-bounds test must
        # still reject global OOB, so NaN them first
        az_l = np.where(ok, az, np.nan) - a0
        rg_l = np.where(ok, rg, np.nan) - c0
        out = remap(patch, az_l, rg_l, kernel)
        return pd.DataFrame(
            [(key[0], out.astype(_DTYPES[out_kind]).tobytes(), th, tw, out_kind)],
            columns=[f.name for f in out_schema.fields],
        )

    out = (
        picked.groupBy("dem_tile_id")
        .cogroup(lut.groupBy("dem_tile_id"))
        .applyInPandas(gather, schema=out_schema)
    )
    if split_applied:
        out = _reassemble_split_tiles(out)
        # caller may unpersist the split-LUT frame once consumed
        out._eo_persisted = lut
    return out


def remap(img: np.ndarray, rows: np.ndarray, cols: np.ndarray, kernel: str = "bicubic") -> np.ndarray:
    """Gather-resample ``img`` at fractional (rows, cols); NaN outside
    [0,h)×[0,w); border pixels clamp (reference util.py:150-213).
    Kernels: nearest, bilinear, bicubic (default, as in the reference),
    bicubic6. Complex images resample real/imag independently
    (util.py:162-166)."""
    if kernel not in KERNELS:
        raise ValueError(f"unknown kernel {kernel!r}")
    out_shape = rows.shape
    r = np.asarray(rows, dtype=np.float64).ravel()
    c = np.asarray(cols, dtype=np.float64).ravel()
    if np.iscomplexobj(img):
        out = _remap_real(img.real, r, c, kernel) + 1j * _remap_real(img.imag, r, c, kernel)
    else:
        out = _remap_real(img, r, c, kernel)
    return out.reshape(out_shape)
