"""Density-driven adaptive cell splitting: same join results, bounded
boundary-cell row volume on hotspot data (north-rule skew handling)."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from eo_tools_spark.functions.spatial import cell_col
from eo_tools_spark.operators.spatial_join import (
    adaptive_cover,
    aoi_point_join,
    build_aoi_cover,
)


def hotspot_scenes(spark, n=40000, seed=11):
    """90% of rows in a 0.2°×0.2° hotspot straddling the AOI boundary —
    worst case for boundary-cell refine volume."""
    rng = np.random.default_rng(seed)
    hot = rng.random(n) < 0.9
    lon = np.where(hot, 10.45 + rng.random(n) * 0.2, rng.uniform(5, 15, n))
    lat = np.where(hot, 40.45 + rng.random(n) * 0.2, rng.uniform(35, 45, n))
    return spark.createDataFrame(
        pd.DataFrame({"scene_id": np.arange(n), "lon": lon, "lat": lat})
    )


AOI = {
    "a": np.array(
        [[10.0, 40.0], [10.5, 40.0], [10.5, 40.5], [10.0, 40.5], [10.0, 40.0]]
    )
}


def boundary_row_count(spark, scenes, cover_df):
    """Rows landing in boundary cover cells = PIP work volume."""
    res_set = sorted(
        {r.res for r in cover_df.select((F.col("cell") / (1 << 58)).cast("int").alias("res")).distinct().collect()}
    )
    with_cell = scenes.select(
        F.explode(F.array(*[cell_col("lon", "lat", r) for r in res_set])).alias("_cell")
    )
    return (
        with_cell.join(
            F.broadcast(cover_df.where("boundary").select("cell")),
            with_cell["_cell"] == F.col("cell"),
        ).count()
    )


def test_adaptive_split_reduces_refine_volume(spark):
    scenes = hotspot_scenes(spark)
    # coarse base: the geometric pick_res already bounds counts, the
    # density path kicks in when the base is coarse vs the data
    base = build_aoi_cover(spark, AOI, res=8)
    adap = adaptive_cover(scenes, AOI, base_res=8, max_rows_per_cell=2000, max_iters=4)

    vol_base = boundary_row_count(spark, scenes, base[0])
    vol_adap = boundary_row_count(spark, scenes, adap[0])
    assert vol_adap < vol_base * 0.7  # hotspot boundary cells got split

    # and the join result is IDENTICAL
    r_base = {r.scene_id for r in aoi_point_join(scenes, AOI, cover=base).collect()}
    r_adap = {r.scene_id for r in aoi_point_join(scenes, AOI, cover=adap).collect()}
    assert r_base == r_adap and len(r_base) > 1000


def test_adaptive_cover_partitions_aoi(spark):
    """Mixed-res cover stays a partition: no point matches two cells of
    the same AOI (exactly-once invariant)."""
    scenes = hotspot_scenes(spark, n=8000)
    adap_df, _ = adaptive_cover(scenes, AOI, base_res=8, max_rows_per_cell=500, max_iters=5)
    res_set = sorted(
        {r.res for r in adap_df.select((F.col("cell") / (1 << 58)).cast("int").alias("res")).distinct().collect()}
    )
    assert len(res_set) > 1  # actually mixed resolution
    with_cell = scenes.select(
        "scene_id",
        F.explode(F.array(*[cell_col("lon", "lat", r) for r in res_set])).alias("_cell"),
    )
    matches = (
        with_cell.join(F.broadcast(adap_df), with_cell["_cell"] == adap_df["cell"])
        .groupBy("scene_id", "aoi_id")
        .count()
    )
    assert matches.where("count > 1").isEmpty()


def test_cell_nesting_exact():
    """The one-scan rollup in adaptive_cover assumes exact quadtree
    nesting: a point's cell at res r is the parent of its cell at
    res r+1, for every res — including cell-edge coordinates."""
    from eo_tools_spark.geo.cells import cell_of_points

    rng = np.random.default_rng(4)
    lon = np.concatenate([rng.uniform(-180, 180, 2000), [0.0, -180.0, 90.0]])
    lat = np.concatenate([rng.uniform(-85, 85, 2000), [0.0, -45.0, 45.0]])
    mask29 = (1 << 29) - 1
    for r in range(4, 12):
        c0 = cell_of_points(lon, lat, r).astype(np.int64)
        c1 = cell_of_points(lon, lat, r + 1).astype(np.int64)
        ix1, iy1 = (c1 >> 29) & mask29, c1 & mask29
        parent = (np.int64(r) << 58) | ((ix1 >> 1) << 29) | (iy1 >> 1)
        np.testing.assert_array_equal(c0, parent)


def test_one_scan_rollup_matches_per_level_counts(spark):
    """Rolled-up counts == direct per-level counts (the thing the
    round-1 per-iteration rescan measured)."""
    from eo_tools_spark.geo.cells import cell_of_points

    scenes = hotspot_scenes(spark, n=20000)
    pdf = scenes.toPandas()
    cover, _ = adaptive_cover(
        scenes, AOI, base_res=8, max_rows_per_cell=1500, max_iters=3
    )
    rows = cover.collect()
    # every boundary cover cell's true point count must respect the
    # split rule: > cap only if it could not split further (res cap)
    for r in rows:
        if not r.boundary:
            continue
        res = int(r.cell) >> 58
        n = int(
            (cell_of_points(pdf.lon.to_numpy(), pdf.lat.to_numpy(), res) == r.cell).sum()
        )
        if n > 1500:
            assert res >= 8 + 3, (r.cell, res, n)


def test_mixed_base_res_no_double_count(spark):
    """Two overlapping AOIs with DIFFERENT base resolutions (pick_res):
    a scene inside both AOIs' boundary cells is counted by both rb-group
    scans — counts must be kept per group, or shared quadtree ancestors
    double and cells split below the cap (round-2 review finding)."""
    rng = np.random.default_rng(21)
    n = 1200
    # all scenes in a tight blob that straddles BOTH AOIs' boundaries
    lon = 10.4 + rng.random(n) * 0.01
    lat = 40.4 + rng.random(n) * 0.01
    scenes = spark.createDataFrame(
        pd.DataFrame({"scene_id": np.arange(n), "lon": lon, "lat": lat})
    )
    aois = {
        "big": np.array(
            [[10.0, 40.0], [11.4, 40.0], [11.4, 41.4], [10.0, 41.4], [10.0, 40.0]]
        ),
        "small": np.array(
            [[10.4, 40.4], [10.6, 40.4], [10.6, 40.6], [10.4, 40.6], [10.4, 40.4]]
        ),
    }
    # cap ABOVE the true count (1200 < 1500): nothing may split; the
    # double-count bug sees ~2400 in shared ancestors and splits anyway
    adap, _ = adaptive_cover(scenes, aois, max_rows_per_cell=1500, max_iters=3)
    base, _ = build_aoi_cover(spark, aois)
    assert adap.count() == base.count()
    # and the join through the adaptive cover still matches the base one
    a = aoi_point_join(scenes, aois, cover=(adap, None)).toPandas()
    b = aoi_point_join(scenes, aois, cover=(base, None)).toPandas()
    k = ["scene_id", "aoi_id"]
    assert a[k].sort_values(k).reset_index(drop=True).equals(
        b[k].sort_values(k).reset_index(drop=True)
    )


def test_flagship_join_adaptive_flag(spark):
    """aoi_point_join(adaptive=True) — the production wiring of the
    density-split cover (VERDICT r3 item 6): identical rows to the
    static-cover join, hot boundary cells landed at finer resolution,
    and the physical plan still broadcasts the cover and probes it with
    the multi-res explode (no shuffle of the scene side)."""
    scenes = hotspot_scenes(spark)
    static = aoi_point_join(scenes, AOI, res=8)
    adap = aoi_point_join(
        scenes, AOI, res=8, adaptive=True,
        max_rows_per_cell=2000, adaptive_max_iters=4,
    )
    r_static = {r.scene_id for r in static.collect()}
    r_adap = {r.scene_id for r in adap.collect()}
    assert r_static == r_adap and len(r_adap) > 1000

    # the split cover the join built must put the hotspot boundary at
    # finer resolution than the base: re-derive it (deterministic) and
    # check the hot cells' res
    cover_df, _ = adaptive_cover(
        scenes, AOI, base_res=8, max_rows_per_cell=2000, max_iters=4
    )
    hot_res = {
        int(r.cell) >> 58
        for r in cover_df.where("boundary").collect()
    }
    assert max(hot_res) > 8  # hot boundary cells split finer than base

    # plan shape: broadcast hash join (cover is the broadcast dim) and
    # the generate/explode of the multi-res cell array on the scene side
    plan = adap._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "Generate explode" in plan or "Expand" in plan
    # static single-res path must NOT pay the explode
    plan_static = static._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan_static
    assert "Generate explode" not in plan_static
