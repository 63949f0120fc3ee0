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

import numpy as np
from pyspark.sql import DataFrame

from eo_tools_spark.functions import raster as R
from eo_tools_spark.operators.tiles import (
    _box_mean_padded,
    _erode_padded,
    halo_map_multi_out,
    product_join,
)


def polsar_cov_products(
    vv_tiles: DataFrame, vh_tiles: DataFrame, mlt_az: int = 1, mlt_rg: int = 1
) -> DataFrame:
    """ONE vv⋈vh join emitting the three presummed covariance channels
    (c11=|vv|² f4, c22=|vh|² f4, c12=vv·conj(vh) c8) — NaN preserved
    (unlike the coherence channels) for the downstream mask derivation
    (process.py:2000-2004)."""
    return product_join(
        vv_tiles, vh_tiles,
        [
            ("c11", lambda x, y: (x * np.conj(x)).real.astype(np.float32), "f4"),
            ("c22", lambda x, y: (y * np.conj(y)).real.astype(np.float32), "f4"),
            ("c12", lambda x, y: (x * np.conj(y)).astype(np.complex64), "c8"),
        ],
        mlt_az, mlt_rg,
    )


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
        # _box_mean_padded on NaN-free input == the reference's plain
        # boxcar-after-nan_to_num (its NaN mask is all-False → no-ops)
        c11 = _box_mean_padded(np.nan_to_num(ch["c11"]), th, tw, hh, box_az, box_rg).astype(np.float32)
        c22 = _box_mean_padded(np.nan_to_num(ch["c22"]), th, tw, hh, box_az, box_rg).astype(np.float32)
        c12 = _box_mean_padded(np.nan_to_num(ch["c12"]), th, tw, hh, box_az, box_rg).astype(np.complex64)
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
