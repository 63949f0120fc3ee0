"""Top-level InSAR composition — the engine's analog of the reference's
`process_insar` product stage (/root/reference/eo_tools/process.py:47-222:
align secondary → interferogram / coherence / amplitude), composed from
the distributed primitives:

    coreg LUT tiles ──► align_secondary_tiles (sar2geo gather join)
                               │
    primary tiles ──┬──────────┴──► tiles_interferogram
                    └──► tiles_coherence (fused single halo exchange)

Everything stays in the tile model (TILE_SCHEMA rows) end to end — no
driver-side arrays. The caller brings the coregistration LUT (from
geocode_dem_tiles + coregister, or any (az, rg) source) tiled on the
PRIMARY grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

import numpy as np

from eo_tools_spark.operators.geocode import sar2geo_tiles
from eo_tools_spark.operators.tiles import (
    TILE_SCHEMA,
    tiles_coherence,
    tiles_goldstein,
    tiles_interferogram,
    tiles_map,
)


def align_secondary_tiles(
    sec_tiles: DataFrame,
    lut_tiles: DataFrame,
    naz: int,
    nrg: int,
    tile: int,
    kernel: str = "bicubic",
    raster_id: str = "aligned",
) -> DataFrame:
    """Resample the secondary into the primary grid through a coreg LUT
    tiled ON the primary grid (rows: ty, tx, az binary, rg binary, th,
    tw) — the distributed form of the reference's `align`
    (core.py:921-934) with the default bicubic kernel.

    Output: TILE_SCHEMA rows on the primary tiling (complex64)."""
    lut = lut_tiles.select(
        F.concat_ws("_", F.col("ty").cast("string"), F.col("tx").cast("string")).alias(
            "dem_tile_id"
        ),
        "az", "rg", "th", "tw",
    )
    out = sar2geo_tiles(lut, sec_tiles, naz, nrg, tile, kernel, out_kind="c8")
    split = F.split(F.col("dem_tile_id"), "_")
    return out.select(
        F.lit(raster_id).alias("raster_id"),
        split.getItem(0).cast("int").alias("ty"),
        split.getItem(1).cast("int").alias("tx"),
        "data", "th", "tw", "kind",
    )


def insar_products(
    prm_tiles: DataFrame,
    sec_tiles: DataFrame,
    lut_tiles: DataFrame,
    naz: int,
    nrg: int,
    tile: int,
    kernel: str = "bicubic",
    box_az: int = 5,
    box_rg: int = 5,
    mlt_az: int = 1,
    mlt_rg: int = 1,
    magnitude: bool = True,
    filter_ifg: bool = False,
    goldstein_alpha: float = 0.5,
    amplitude: bool = False,
) -> dict[str, DataFrame]:
    """Aligned-pair product stage: the `process.py:161-207 → 1591-1793`
    products, all-distributed. Returns {"aligned", "ifg", "coh"} plus
    "amp" when ``amplitude`` (|primary|, process.py:1611). ``filter_ifg``
    applies the Goldstein phase filter to the interferogram
    (process_insar's filter flag, process.py:124-127 → 2069-2126).
    Coherence uses the fused single-exchange path; the aligned frame is
    reused by the products (mark it `.persist()` upstream if several are
    materialized)."""
    aligned = align_secondary_tiles(sec_tiles, lut_tiles, naz, nrg, tile, kernel)
    ifg = tiles_interferogram(prm_tiles, aligned, mlt_az, mlt_rg)
    if filter_ifg:
        ifg = tiles_goldstein(ifg, alpha=goldstein_alpha)
    out = {
        "aligned": aligned,
        "ifg": ifg,
        "coh": tiles_coherence(
            prm_tiles, aligned, box_az, box_rg, mlt_az, mlt_rg, magnitude=magnitude
        ),
    }
    if amplitude:
        out["amp"] = tiles_map(prm_tiles, np.abs, "f4", "amp")
    return out


def geocode_and_merge(
    per_swath: list[tuple[DataFrame, DataFrame, int, int]],
    tile: int,
    kernel: str = "bicubic",
    out_kind: str = "f4",
    aoi=None,
    geo_origin: tuple[float, float] | None = None,
    geo_px: float | None = None,
) -> DataFrame:
    """Geocode-and-merge stage (`process.py:1305-1458`
    `geocode_and_merge_iw` semantics): per subswath, gather the SAR-
    geometry product into the SHARED geo grid through its LUT
    (`sar2geo`, process.py:1461-1549), then mosaic the subswaths with
    first-non-nodata priority in list order (rasterio merge 'first',
    process.py:1408-1456), then optionally NaN-clip to an AOI ring
    (process.py:1440-1453).

    ``per_swath``: [(sar_tiles, lut_tiles, naz, nrg), ...] — lut_tiles
    on the common GEO tiling (ty, tx, az, rg, th, tw), az/rg addressing
    that swath's own SAR grid. ``aoi`` + ``geo_origin``/``geo_px``
    georeference the clip. Output: one TILE_SCHEMA frame ('mosaic').
    """
    from eo_tools_spark.operators.tiles import tiles_clip_aoi, tiles_mosaic

    layers = []
    for pri, (sar_tiles, lut_tiles, naz, nrg) in enumerate(per_swath):
        geo = align_secondary_tiles(
            sar_tiles, lut_tiles, naz, nrg, tile, kernel, raster_id=f"sw{pri}"
        )
        if out_kind != "c8":
            # geocoded backscatter/coherence products are real rasters;
            # sar2geo_tiles resamples via the complex path, take .real
            geo = _to_real(geo, out_kind)
        layers.append(geo.withColumn("priority", F.lit(pri)))
    merged = layers[0]
    for extra in layers[1:]:
        merged = merged.unionByName(extra)
    mosaic = tiles_mosaic(merged)
    if aoi is not None:
        if geo_origin is None or geo_px is None:
            raise ValueError("aoi clip needs geo_origin and geo_px")
        mosaic = tiles_clip_aoi(mosaic, aoi, geo_origin[0], geo_origin[1], geo_px, tile)
    return mosaic


def _to_real(tiles: DataFrame, out_kind: str) -> DataFrame:
    return tiles_map(tiles, lambda a: a.real, out_kind, "geo")
