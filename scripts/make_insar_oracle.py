#!/usr/bin/env python
"""Pin the InSAR / terrain driver-query fixtures (dist/oracle/*.parquet).

Protocol (same as make_image_oracle.py): the fixture scenes are pure
functions of the pixel index, so the dense rasters can be rebuilt in
numpy and pushed through the single-array oracle chain. This script

1. runs each Spark driver query,
2. VERIFIES the underlying rasters against the dense numpy oracle
   (remap → boxcar ifg → coherence; mosaic truth with first-priority
   overlap; simulate_terrain_gamma_dense summed over blocks) — aborts
   loudly on any mismatch,
3. re-runs each query at a different parallelism and asserts the output
   is IDENTICAL (bit-stable digests / folds — the property the driver's
   value-hash gate depends on),
4. writes the verified rows to dist/oracle/{name}.parquet for DuckDB.

Re-run whenever the fixture scene or any operator in the chains changes.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "dist", "oracle")


def verify_insar(spark) -> None:
    from eo_tools_spark.functions import raster as R
    from eo_tools_spark.operators.geocode import remap
    from eo_tools_spark.operators.insar import insar_products
    from eo_tools_spark.operators.tiles import tiles_to_raster
    from eo_tools_spark.sources.insar_fixture import (
        N_INSAR, T_INSAR, dense_pair, insar_pair_tiles,
    )

    prm, sec, az, rg = dense_pair()
    prm_t, sec_t, lut_t = insar_pair_tiles(spark)
    prods = insar_products(prm_t, sec_t, lut_t, N_INSAR, N_INSAR, T_INSAR)

    ali = tiles_to_raster(prods["aligned"], T_INSAR)
    exp_ali = remap(sec, az, rg, "bicubic").astype(np.complex64)
    np.testing.assert_allclose(ali, exp_ali, rtol=1e-5, atol=1e-6, equal_nan=True)

    ifg = tiles_to_raster(prods["ifg"], T_INSAR)
    exp_ifg = R.boxcar(R.interferogram(prm, exp_ali), 5, 5).astype(np.complex64)
    np.testing.assert_allclose(ifg, exp_ifg, rtol=1e-4, atol=1e-5, equal_nan=True)

    coh = tiles_to_raster(prods["coh"], T_INSAR)
    exp_coh = R.coherence(prm, exp_ali, 5, 5).astype(np.float32)
    np.testing.assert_allclose(coh, exp_coh, rtol=1e-4, atol=1e-5, equal_nan=True)

    interior = exp_coh[8:128, 8:128]
    assert np.nanmean(interior) > 0.5, "fixture pair should be coherent"
    print(f"insar_products: dense-oracle parity OK (mean interior coherence "
          f"{np.nanmean(interior):.3f})")


def verify_geocode_merge(spark) -> None:
    from eo_tools_spark.operators.geocode import remap
    from eo_tools_spark.operators.insar import geocode_and_merge
    from eo_tools_spark.operators.tiles import tiles_to_raster
    from eo_tools_spark.sources.insar_fixture import (
        G_GEO, SW_W, T_GEO, swath_field, swath_lut, swath_tiles,
    )

    per_swath = [
        (swath_tiles(spark, 0), swath_lut(spark, 0), G_GEO, SW_W),
        (swath_tiles(spark, 1), swath_lut(spark, 1), G_GEO, SW_W),
    ]
    mosaic = geocode_and_merge(per_swath, T_GEO, kernel="bicubic", out_kind="f4")
    got = tiles_to_raster(mosaic, T_GEO)

    # dense oracle: per swath, remap its raster through its LUT; merge
    # with first-non-NaN priority in list order
    ii, jj = np.mgrid[0:G_GEO, 0:G_GEO].astype(np.float64)
    layers = []
    for sw in (0, 1):
        x_off = 0 if sw == 0 else G_GEO - SW_W
        si, sj = np.mgrid[0:G_GEO, 0:SW_W].astype(np.float64)
        img = swath_field(sw)(si, sj).real.astype(np.float32)
        az = ii + 0.2 * np.sin(jj / 31.0)
        rg = jj - x_off + 0.1 * np.cos(ii / 27.0)
        bad = (jj < x_off) | (jj >= x_off + SW_W)
        az[bad] = np.nan
        rg[bad] = np.nan
        layers.append(remap(img, az, rg, "bicubic").astype(np.float32))
    exp = layers[0].copy()
    take = np.isnan(exp) & ~np.isnan(layers[1])
    exp[take] = layers[1][take]
    np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-6, equal_nan=True)
    assert not np.isnan(exp[:, : SW_W - 4]).all(), "swath A must cover left"
    print("geocode_merge: dense-oracle parity OK (unclipped mosaic)")

    # the PINNED query is the AOI-CLIPPED mosaic — verify that path too:
    # with geo_origin=(0, G_GEO), geo_px=1, pixel (r, c) sits at
    # (x, y) = (c + 0.5, G_GEO - 0.5 - r); the fixture ring is the
    # rectangle x∈[20,170], y∈[30,160]
    ring = np.array(
        [[20.0, 30.0], [170.0, 30.0], [170.0, 160.0], [20.0, 160.0], [20.0, 30.0]]
    )
    clipped = geocode_and_merge(
        per_swath, T_GEO, kernel="bicubic", out_kind="f4",
        aoi=ring, geo_origin=(0.0, float(G_GEO)), geo_px=1.0,
    )
    got_c = tiles_to_raster(clipped, T_GEO)
    rr, cc = np.mgrid[0:G_GEO, 0:G_GEO]
    x, y = cc + 0.5, G_GEO - 0.5 - rr
    inside = (x >= 20.0) & (x <= 170.0) & (y >= 30.0) & (y <= 160.0)
    exp_c = np.where(inside, exp, np.nan)
    np.testing.assert_allclose(got_c, exp_c, rtol=1e-5, atol=1e-6, equal_nan=True)
    n_finite = int(np.isfinite(got_c).sum())
    assert n_finite > 10000, f"clipped mosaic nearly empty ({n_finite} px)"
    print(f"geocode_merge: dense-oracle parity OK (clipped mosaic, {n_finite} finite px)")


def verify_terrain(spark) -> None:
    import pandas as pd

    from eo_tools_spark.operators.sar_geom import scatter_accumulate, scatter_to_dense
    from eo_tools_spark.sources.insar_fixture import (
        TERRAIN_NAZ, TERRAIN_NRG, terrain_contributions, terrain_gamma_dense_oracle,
    )

    contrib = terrain_contributions(spark)
    got = scatter_to_dense(
        scatter_accumulate(contrib).toPandas(), TERRAIN_NAZ, TERRAIN_NRG
    )
    exp = terrain_gamma_dense_oracle()
    np.testing.assert_allclose(got, exp, rtol=1e-9, equal_nan=True)
    n = int(np.isfinite(exp).sum())
    assert n > 1000, f"terrain fixture too sparse ({n} lit pixels)"
    print(f"terrain_gamma: dense-oracle parity OK ({n} lit pixels)")


def verify_coherence_tiles(spark) -> None:
    """tiles_coherence WITH multilook (the driver-gated standalone op,
    round-4 verdict task 5) vs the dense single-array chain."""
    from eo_tools_spark.functions import raster as R
    from eo_tools_spark.operators.tiles import tiles_coherence, tiles_to_raster
    from eo_tools_spark.sources.insar_fixture import (
        T_INSAR, dense_pair, insar_pair_tiles,
    )

    prm, sec, _, _ = dense_pair()
    prm_t, sec_t, _lut = insar_pair_tiles(spark)
    coh_t = tiles_coherence(prm_t, sec_t, box_az=5, box_rg=5, mlt_az=2, mlt_rg=2)
    got = tiles_to_raster(coh_t, T_INSAR // 2)
    exp = R.coherence(prm, sec, 5, 5, 2, 2).astype(np.float32)
    np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-5, equal_nan=True)
    interior = exp[4:100, 4:100]
    print(f"coherence_tiles: dense-oracle parity OK (mlt 2x2, mean interior "
          f"{np.nanmean(interior):.3f})")


def verify_polsar(spark) -> None:
    """polsar_products(h_alpha=True) vs the dense reference-order chain
    (tests/test_polsar.dense_oracle) + dense h_alpha on top."""
    import sys as _sys

    _sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests"))
    from test_polsar import dense_oracle

    from eo_tools_spark.functions import raster as R
    from eo_tools_spark.operators.polsar import polsar_products
    from eo_tools_spark.operators.tiles import tiles_to_raster
    from eo_tools_spark.sources.insar_fixture import (
        T_INSAR, dense_pair, insar_pair_tiles,
    )
    from pyspark.sql import functions as F

    vv, vh, _, _ = dense_pair()
    vv_t, vh_t, _lut = insar_pair_tiles(spark)
    prods = polsar_products(vv_t, vh_t, box_az=5, box_rg=5, mlt_az=2, mlt_rg=2,
                            h_alpha=True)
    e11, e22, e12 = dense_oracle(vv, vh, 5, 5, 2, 2)
    for rid, exp in (("c11", e11), ("c22", e22), ("c12", e12)):
        got = tiles_to_raster(prods.where(F.col("raster_id") == rid), T_INSAR // 2)
        np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-5, equal_nan=True)
    H, alpha = R.h_alpha(e11.astype(np.float64), e22.astype(np.float64),
                         e12.astype(np.complex128))
    exp_ha = (H + 1j * alpha).astype(np.complex64)
    got_ha = tiles_to_raster(prods.where(F.col("raster_id") == "halpha"), T_INSAR // 2)
    np.testing.assert_allclose(got_ha, exp_ha, rtol=1e-4, atol=1e-5, equal_nan=True)
    print("polsar_h_alpha: dense-oracle parity OK (c11/c22/c12/halpha, mlt 2x2)")


def verify_goldstein(spark) -> None:
    """tiles_goldstein vs per-tile dense replication: for each tile,
    slice its 32-px symmetric-padded neighborhood from the dense ifg
    and run goldstein_chunk — the reference's chunk-relative map_overlap
    semantics (process.py:2113), built with np.pad + slicing instead of
    the Spark halo join."""
    from eo_tools_spark.functions import raster as R
    from eo_tools_spark.operators.tiles import (
        tiles_goldstein, tiles_interferogram, tiles_to_raster,
    )
    from eo_tools_spark.sources.insar_fixture import (
        N_INSAR, T_INSAR, dense_pair, insar_pair_tiles,
    )

    prm, sec, _, _ = dense_pair()
    prm_t, sec_t, _lut = insar_pair_tiles(spark)
    got = tiles_to_raster(
        tiles_goldstein(tiles_interferogram(prm_t, sec_t), alpha=0.5), T_INSAR
    )

    ifg = R.interferogram(prm, sec).astype(np.complex64)
    padded = np.pad(ifg, 32, mode="symmetric")
    exp = np.empty_like(ifg)
    nt = N_INSAR // T_INSAR
    for ty in range(nt):
        for tx in range(nt):
            chunk = padded[
                ty * T_INSAR : (ty + 1) * T_INSAR + 64,
                tx * T_INSAR : (tx + 1) * T_INSAR + 64,
            ]
            out = R.goldstein_chunk(chunk, alpha=0.5)[32:-32, 32:-32]
            exp[
                ty * T_INSAR : (ty + 1) * T_INSAR,
                tx * T_INSAR : (tx + 1) * T_INSAR,
            ] = out.astype(np.complex64)
    np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-5)
    # sanity: the filter must actually denoise the fixture phase ramp
    assert np.abs(exp).sum() > 0
    print("goldstein_tiles: dense-oracle parity OK (per-tile chunk grid)")


def verify_s2_composite(spark) -> None:
    """s2_color_composite vs the dense recipe uint8(255·clip(b, 0, 1))
    per channel (S2.py:244-247), compared tile by tile."""
    from eo_tools_spark.operators.s2 import COMPOSITES, s2_color_composite
    from eo_tools_spark.sources.insar_fixture import (
        N_INSAR, S2_FIX_BANDS, T_INSAR, s2_band_dense, s2_band_tiles,
    )

    assert list(COMPOSITES["SWIR"]) == list(S2_FIX_BANDS)
    bands = {b: s2_band_tiles(spark, b) for b in S2_FIX_BANDS}
    rows = s2_color_composite(bands, name="SWIR").collect()
    nt = N_INSAR // T_INSAR
    assert len(rows) == nt * nt, f"expected {nt * nt} tiles, got {len(rows)}"

    dense = np.stack(
        [(255 * s2_band_dense(b).clip(0, 1)).astype(np.uint8) for b in S2_FIX_BANDS],
        axis=-1,
    )
    n_clip = int((s2_band_dense("B12") < 0).sum() + (s2_band_dense("B12") > 1).sum())
    assert n_clip > 100, "fixture must exercise the clip on both sides"
    for r in rows:
        got = np.frombuffer(bytes(r.data), dtype=np.uint8).reshape(r.th, r.tw, 3)
        exp = dense[
            r.ty * T_INSAR : (r.ty + 1) * T_INSAR,
            r.tx * T_INSAR : (r.tx + 1) * T_INSAR,
        ]
        np.testing.assert_array_equal(got, exp)
    print(f"s2_composite: dense-recipe parity OK ({len(rows)} tiles, "
          f"{n_clip} clipped px/band)")


def verify_coreg(spark) -> None:
    """coreg_project vs the dense reference-loop coregister() — covered
    sets equal, values allclose; the NaN hole must remove coverage."""
    from eo_tools_spark.operators.coreg import coreg_project, coregister
    from eo_tools_spark.sources.insar_fixture import (
        COREG_NAZ, COREG_NRG, coreg_nodes, coreg_nodes_dense,
    )

    azp, rgp, azs, rgs = coreg_nodes_dense()
    exp_az, exp_rg = coregister(azp, rgp, azs, rgs, COREG_NAZ, COREG_NRG)
    pdf = coreg_project(
        coreg_nodes(spark), COREG_NAZ, COREG_NRG, block=16
    ).toPandas()

    got_az = np.full((COREG_NAZ, COREG_NRG), np.nan)
    got_rg = np.full((COREG_NAZ, COREG_NRG), np.nan)
    got_az[pdf.apix, pdf.rpix] = pdf.az_s
    got_rg[pdf.apix, pdf.rpix] = pdf.rg_s
    assert (np.isnan(got_az) == np.isnan(exp_az)).all(), "coverage mismatch"
    np.testing.assert_allclose(got_az, exp_az, rtol=1e-12, equal_nan=True)
    np.testing.assert_allclose(got_rg, exp_rg, rtol=1e-12, equal_nan=True)
    n_cov = int(np.isfinite(exp_az).sum())
    n_all = COREG_NAZ * COREG_NRG
    assert 0 < n_cov < n_all, "fixture must cover some but not all pixels"
    print(f"coreg_offsets: dense-oracle parity OK ({n_cov}/{n_all} px covered)")


def main() -> None:
    from eo_tools_spark.session import get_spark
    import __spark_entry__ as entry

    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark("insar-oracle", cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    verify_insar(spark)
    verify_geocode_merge(spark)
    verify_terrain(spark)
    verify_coherence_tiles(spark)
    verify_polsar(spark)
    verify_goldstein(spark)
    verify_s2_composite(spark)
    verify_coreg(spark)

    queries = {
        "insar_products": entry.q_insar_products,
        "geocode_merge": entry.q_geocode_merge,
        "terrain_gamma": entry.q_terrain_gamma,
        "coherence_tiles": entry.q_coherence_tiles,
        "polsar_h_alpha": entry.q_polsar_h_alpha,
        "goldstein_tiles": entry.q_goldstein_tiles,
        "s2_composite": entry.q_s2_composite,
        "coreg_offsets": entry.q_coreg_offsets,
    }
    first = {}
    for name, q in queries.items():
        pdf = q(spark, "/root/testdata/sf0.01").toPandas()
        cols = sorted(pdf.columns)
        first[name] = pdf[cols].sort_values(cols).reset_index(drop=True)
    spark.stop()

    # bit-stability probe: different core count + shuffle partitioning
    spark2 = get_spark("insar-oracle-2", cores=3, shuffle_partitions=7)
    spark2.sparkContext.setLogLevel("ERROR")
    for name, q in queries.items():
        pdf = q(spark2, "/root/testdata/sf0.01").toPandas()
        cols = sorted(pdf.columns)
        again = pdf[cols].sort_values(cols).reset_index(drop=True)
        assert again.equals(first[name]), f"{name}: NOT bit-stable across parallelism"
        print(f"{name}: bit-stable across parallelism ({len(again)} rows)")
    spark2.stop()

    for name, pdf in first.items():
        path = os.path.join(OUT_DIR, f"{name}.parquet")
        pdf.to_parquet(path, index=False)
        print(f"pinned {path} ({len(pdf)} rows)")


if __name__ == "__main__":
    main()
