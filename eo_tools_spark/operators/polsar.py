"""Dual-pol PolSAR product stage — the engine's `polsar_cov_dual` /
`h_alpha_dual` (/root/reference/eo_tools/S1/process.py:1943-2066,
1820-1940), fully fused:

    vv ⋈ vh (one tile join) ──► c11/c22/c12 channels (presum fused)
                                        │
              ONE halo exchange ──► nan_to_num → boxcar → erosion mask
                                        └──► c11, c22, c12 [, H/alpha]

Reference operation ORDER preserved exactly (process.py:2000-2021):
presum the raw products (NaN kept), derive the validity mask from the
presummed c12, nan_to_num, plain boxcar, then NaN-out pixels whose
(box_az × box_rg) erosion window touched an invalid pixel. H/alpha
(h_alpha_dual, process.py:1820-1940) reuses the boxcar'd covariance in
the SAME kernel — 2 exchanges for the entire dual-pol pipeline.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from eo_tools_spark.functions import raster as R
from eo_tools_spark.operators.tiles import (
    TILE_SCHEMA,
    _DTYPES,
    _decode,
    _erode_padded,
    halo_map_multi_out,
)


def polsar_cov_products(
    vv_tiles: DataFrame, vh_tiles: DataFrame, mlt_az: int = 1, mlt_rg: int = 1
) -> DataFrame:
    """ONE vv⋈vh join emitting the three presummed covariance channels
    (c11=|vv|² f4, c22=|vh|² f4, c12=vv·conj(vh) c8) — NaN preserved
    for the downstream mask derivation (process.py:2000-2004)."""
    aj = vv_tiles.select(
        F.col("ty"), F.col("tx"),
        F.col("data").alias("da"), F.col("th"), F.col("tw"), F.col("kind").alias("ka"),
    )
    bj = vh_tiles.select(
        F.col("ty"), F.col("tx"), F.col("data").alias("db"), F.col("kind").alias("kb")
    )
    joined = aj.join(bj, ["ty", "tx"])

    def do(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples():
                vv = _decode(bytes(r.da), int(r.th), int(r.tw), r.ka)
                vh = _decode(bytes(r.db), int(r.th), int(r.tw), r.kb)
                chans = [
                    ("c11", (vv * np.conj(vv)).real.astype(np.float32), "f4"),
                    ("c22", (vh * np.conj(vh)).real.astype(np.float32), "f4"),
                    ("c12", (vv * np.conj(vh)).astype(np.complex64), "c8"),
                ]
                for rid, arr, kind in chans:
                    if mlt_az > 1 or mlt_rg > 1:
                        arr = R.presum(arr, mlt_az, mlt_rg).astype(_DTYPES[kind])
                    rows.append(
                        (rid, int(r.ty), int(r.tx), arr.tobytes(),
                         arr.shape[0], arr.shape[1], kind)
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in TILE_SCHEMA.fields])

    return joined.mapInPandas(do, schema=TILE_SCHEMA)


def _box_plain(pad: np.ndarray, th: int, tw: int, h: int, kaz: int, krg: int) -> np.ndarray:
    """Plain (non-NaN-restoring) boxcar of the center tile — the
    reference applies boxcar AFTER nan_to_num (process.py:2013-2016)."""
    lo_a, hi_a = R._win_bounds(kaz)
    lo_r, hi_r = R._win_bounds(krg)

    def sums(v):
        c = np.cumsum(np.cumsum(v, axis=0, dtype=np.float64), axis=1)
        c = np.pad(c, ((1, 0), (1, 0)))
        ys = np.arange(h, h + th)
        xs = np.arange(h, h + tw)
        y0, y1 = ys - lo_a, ys + hi_a + 1
        x0, x1 = xs - lo_r, xs + hi_r + 1
        return c[np.ix_(y1, x1)] - c[np.ix_(y0, x1)] - c[np.ix_(y1, x0)] + c[np.ix_(y0, x0)]

    k = float(kaz * krg)
    if np.iscomplexobj(pad):
        return (sums(pad.real) + 1j * sums(pad.imag)) / k
    return sums(pad) / k


def polsar_products(
    vv_tiles: DataFrame,
    vh_tiles: DataFrame,
    box_az: int = 5,
    box_rg: int = 5,
    mlt_az: int = 1,
    mlt_rg: int = 1,
    h_alpha: bool = False,
) -> DataFrame:
    """Full dual-pol product stage in TWO exchanges. Output tile frame
    holds raster_ids c11 (f4), c22 (f4), c12 (c8) and, when ``h_alpha``,
    'halpha' (c8, packed H + 1j·α — h_alpha_dual's entropy / mean-alpha
    from the boxcar'd covariance, process.py:1820-1940)."""
    prods = polsar_cov_products(vv_tiles, vh_tiles, mlt_az, mlt_rg)
    out_kinds = {"c11": "f4", "c22": "f4", "c12": "c8"}
    if h_alpha:
        out_kinds["halpha"] = "c8"

    def kern(ch: dict, th: int, tw: int, hh: int) -> dict:
        msk_pad = ~np.isnan(ch["c12"])  # mask BEFORE nan_to_num (2006)
        c11 = _box_plain(np.nan_to_num(ch["c11"]), th, tw, hh, box_az, box_rg).astype(np.float32)
        c22 = _box_plain(np.nan_to_num(ch["c22"]), th, tw, hh, box_az, box_rg).astype(np.float32)
        c12 = _box_plain(np.nan_to_num(ch["c12"]), th, tw, hh, box_az, box_rg).astype(np.complex64)
        keep = _erode_padded(msk_pad, th, tw, hh, box_az, box_rg)
        out = {
            "c11": np.where(keep, c11, np.nan),
            "c22": np.where(keep, c22, np.nan),
            "c12": np.where(keep, c12, np.nan + 1j * np.nan),
        }
        if h_alpha:
            H, alpha = R.h_alpha(out["c11"].astype(np.float64),
                                 out["c22"].astype(np.float64),
                                 out["c12"].astype(np.complex128))
            out["halpha"] = H + 1j * alpha
        return out

    return halo_map_multi_out(prods, max(box_az, box_rg), kern, out_kinds)
