#!/usr/bin/env python
"""Benchmark harness.

Default mode: runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] (default 32) and prints
ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

`value` is the total wall time of the query set; `images_per_sec` is the
flagship spatial-join + tile-assignment throughput (BASELINE.json metric).

--scaling mode: re-runs the flagship job in two subprocesses at
local[8] and local[32] on the SAME input and writes throughput at both +
scaling efficiency to BENCH/BASELINE.md (the sandbox evidence protocol
for the north rule's two-cluster-size criterion).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    return float(base[2:]) if base.startswith("sf") else -1.0


def run_queries() -> dict:
    from pyspark.sql import functions as F

    from eo_tools_spark.functions.spatial import cell_col, tile_id_col
    from eo_tools_spark.operators.knn import knn_join
    from eo_tools_spark.operators.pairing import esd_phase_mean
    from eo_tools_spark.operators.range_join import bbox_intersect_join
    from eo_tools_spark.operators.spatial_join import aoi_point_join
    from eo_tools_spark.session import get_spark
    from eo_tools_spark.sources import derived

    spark = get_spark("bench", cores=CPUS, shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    scenes = derived.scenes_from_lineitem(spark, SF_DIR)
    n_scenes = scenes.count()  # warms the JVM + parquet footer cache

    timings: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.time()
        result = fn()
        timings[name] = round(time.time() - t0, 3)
        return result

    # q1 — flagship: spatial join + tile assignment over all scenes
    def q1():
        out = aoi_point_join(scenes, derived.aoi_rings()).withColumn(
            "dem_tile_id", tile_id_col("lon", "lat")
        )
        return out.count()

    n_joined = timed("q1_spatial_join_tile_assign", q1)

    # q2 — kNN scene→tile (hotspot half of scenes)
    def q2():
        import pandas as pd

        tiles = pd.DataFrame(
            [
                (f"T{ix:02d}{iy:02d}", 5.5 + ix, 35.5 + iy)
                for ix in range(10)
                for iy in range(10)
            ],
            columns=["dem_tile_id", "cx", "cy"],
        )
        hot = scenes.where(F.expr("scene_id % 2 = 0"))
        return knn_join(hot, tiles, k=3).count()

    timed("q2_knn_tile", q2)

    # q3 — cell index + per-cell counts (groupBy shuffle with hotspot skew)
    def q3():
        return (
            scenes.select(cell_col("lon", "lat", 12).alias("cell"))
            .groupBy("cell")
            .count()
            .count()
        )

    timed("q3_cell_rollup", q3)

    # q4 — bbox interval join: footprint boxes × 1° tile grid
    def q4():
        foot = scenes.select(
            "scene_id",
            (F.col("lon") - 0.15).alias("minx"),
            (F.col("lat") - 0.1).alias("miny"),
            (F.col("lon") + 0.15).alias("maxx"),
            (F.col("lat") + 0.1).alias("maxy"),
        )
        tiles = spark.range(64800).select(
            F.col("id").alias("tid"),
            (F.col("id") % 360 - 180).cast("double").alias("t_minx"),
            (F.floor(F.col("id") / 360) - 90).cast("double").alias("t_miny"),
            (F.col("id") % 360 - 179).cast("double").alias("t_maxx"),
            (F.floor(F.col("id") / 360) - 89).cast("double").alias("t_maxy"),
        )
        return bbox_intersect_join(foot, tiles, res=7).count()

    timed("q4_bbox_tile_join", q4)

    # q5 — ESD-style complex-mean aggregation
    def q5():
        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        df = li.select(
            "l_returnflag",
            (F.col("l_partkey") % 13 - 6).cast("double").alias("re"),
            (F.col("l_suppkey") % 7 - 3).cast("double").alias("im"),
        )
        return esd_phase_mean(df, ["l_returnflag"]).count()

    timed("q5_esd_phase_mean", q5)

    total = round(sum(timings.values()), 3)
    images_per_sec = round(n_scenes / timings["q1_spatial_join_tile_assign"], 1)
    result = {
        "metric": "spatial-join + tile-assignment throughput (images/sec)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _sf_from_dir(SF_DIR),
        "n_scenes": n_scenes,
        "n_joined": n_joined,
        "images_per_sec": images_per_sec,
        "cpus": CPUS,
    }
    spark.stop()
    return result


def run_scaling() -> None:
    """Run the flagship job at two parallelism levels in fresh JVMs."""
    results = {}
    for cpus in (8, 32):
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), SPARK_GRAFT_SHUFFLE=str(cpus))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            timeout=1800,
        )
        line = out.stdout.strip().splitlines()[-1]
        results[cpus] = json.loads(line)

    t8 = results[8]["images_per_sec"]
    t32 = results[32]["images_per_sec"]
    eff = (t32 / t8) / (32 / 8)
    os.makedirs(os.path.join(os.path.dirname(__file__), "BENCH"), exist_ok=True)
    path = os.path.join(os.path.dirname(__file__), "BENCH", "BASELINE.md")
    with open(path, "w") as f:
        f.write(
            "# BENCH results — two-parallelism scaling evidence\n\n"
            "Protocol (north rule, sandbox variant): identical flagship job "
            "(spatial join + tile assignment over the lineitem-derived scene "
            f"table at {SF_DIR}) at local[8] vs local[32] in fresh JVMs.\n\n"
            "| cores | images/sec | q1 sec | total sec |\n|---|---|---|---|\n"
            f"| 8 | {t8} | {results[8]['queries']['q1_spatial_join_tile_assign']} | {results[8]['value']} |\n"
            f"| 32 | {t32} | {results[32]['queries']['q1_spatial_join_tile_assign']} | {results[32]['value']} |\n\n"
            f"**Scaling efficiency (8→32 cores, 4×): {eff:.3f}** "
            f"(requirement ≥ 0.8)\n\n"
            f"Full JSON:\n```json\n{json.dumps(results, indent=2)}\n```\n"
        )
    print(json.dumps({"scaling_efficiency": round(eff, 3), "t8": t8, "t32": t32}))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        print(json.dumps(run_queries()))
