"""Polarization × subswath pattern dispatch — the engine's analog of the
reference's filename-pattern batch wrappers `apply_to_patterns_for_pair`
/ `apply_to_patterns_for_single`
(/root/reference/eo_tools/S1/process.py:2129-2220).

The reference iterates the six ``{vh,vv} × {iw1,iw2,iw3}`` patterns,
builds ``{prefix}_{pattern}.tif`` paths, and calls ``func`` for every
pattern whose input file(s) exist on disk, skipping the rest. In the
tile model there are no files: a "file" is the slice of a TILE_SCHEMA
frame with ``raster_id == f"{prefix}_{pattern}"``. Existence becomes a
single bounded metadata action (distinct raster_id — one short string
per raster, never tile payloads), and the per-pattern outputs come back
as ONE unioned frame tagged ``{out_prefix}_{pattern}``, ready for a
partitioned-by-raster_id sink.

Scale notes: the dispatch unions ≤6 branches of whatever plan ``func``
builds; each branch starts from a ``raster_id = literal`` filter that
pushes down to the source scan (partition pruning when the tile store is
partitioned by raster_id, which `sources/snapshots` layouts are). The
only driver-side data is the distinct raster_id list.
"""

from __future__ import annotations

import logging
from typing import Callable

from pyspark.sql import DataFrame, functions as F

log = logging.getLogger("eo_tools_spark.patterns")

#: the reference's fixed pattern grid (process.py:2158-2160, 2207-2209)
POLARIZATIONS = ("vh", "vv")
IW_INDICES = (1, 2, 3)
PATTERNS = tuple(f"{p}_iw{i}" for p in POLARIZATIONS for i in IW_INDICES)


def present_rasters(tiles: DataFrame) -> set[str]:
    """The set of raster_ids in ``tiles`` — the tile-model analog of
    ``os.path.exists`` over pattern files (process.py:2168-2175). One
    bounded action: only distinct short strings reach the driver."""
    return {
        r["raster_id"]
        for r in tiles.select("raster_id").distinct().collect()
    }


def _retag(out: DataFrame, raster_id: str) -> DataFrame:
    return out.withColumn("raster_id", F.lit(raster_id))


def apply_to_patterns_for_pair(
    func: Callable[..., DataFrame],
    tiles: DataFrame,
    prm_prefix: str,
    sec_prefix: str,
    out_prefix: str,
    *args,
    **kwargs,
) -> DataFrame | None:
    """Apply ``func(prm_tiles, sec_tiles, *args, **kwargs) -> TILE
    frame`` to every ``{pol}_iw{n}`` pattern whose primary AND secondary
    rasters are both present, exactly the reference's skip rule
    (process.py:2168: ``if os.path.exists(prm) and os.path.exists(sec)``).

    Returns the union of the per-pattern outputs, each retagged
    ``{out_prefix}_{pattern}``, or None when no pattern matched (the
    reference writes no file in that case)."""
    have = present_rasters(tiles)
    out: DataFrame | None = None
    for pattern in PATTERNS:
        prm_id = f"{prm_prefix}_{pattern}"
        sec_id = f"{sec_prefix}_{pattern}"
        if prm_id not in have or sec_id not in have:
            continue
        log.info("apply '%s' to %s and %s", getattr(func, "__name__", "func"),
                 prm_id, sec_id)
        branch = _retag(
            func(
                tiles.filter(F.col("raster_id") == prm_id),
                tiles.filter(F.col("raster_id") == sec_id),
                *args,
                **kwargs,
            ),
            f"{out_prefix}_{pattern}",
        )
        out = branch if out is None else out.unionByName(branch)
    return out


def apply_to_patterns_for_single(
    func: Callable[..., DataFrame],
    tiles: DataFrame,
    in_prefix: str,
    out_prefix: str,
    *args,
    **kwargs,
) -> DataFrame | None:
    """Single-input form (process.py:2178-2220): apply
    ``func(in_tiles, *args, **kwargs)`` to every pattern whose input
    raster exists; union of retagged outputs, or None if none exist."""
    have = present_rasters(tiles)
    out: DataFrame | None = None
    for pattern in PATTERNS:
        in_id = f"{in_prefix}_{pattern}"
        if in_id not in have:
            continue
        log.info("apply '%s' to %s", getattr(func, "__name__", "func"), in_id)
        branch = _retag(
            func(tiles.filter(F.col("raster_id") == in_id), *args, **kwargs),
            f"{out_prefix}_{pattern}",
        )
        out = branch if out is None else out.unionByName(branch)
    return out
