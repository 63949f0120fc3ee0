#!/usr/bin/env python
"""Skew-torture probe (round-5 verdict task 2).

Generates a PATHOLOGICAL corpus — 90% of rows inside ONE res-8 cell —
and measures, with and without the engine's skew mitigations:

  A. rows-per-task histogram of the per-cell shuffle every grouped
     per-cell processing stage pays, three layouts: unsalted
     `repartition(cell)`, the spatial `parent_cell_salt` (defeated by
     a hotspot finer than its child cells — measured and documented),
     and the point-mass-safe `row_salt`; p50/p99/max + ratios;
  B. salted_agg vs plain groupBy parity at this distribution (the
     mitigation must not change results) + the bounded row count
     entering the final shuffle (#keys × #salts, not #rows);
  C. adaptive_cover on the flagship join with the AOI boundary crossing
     the hotspot: max boundary-cell rows before/after the density
     split (max_iters deep enough to out-resolve the hotspot), plus
     row parity of the join itself.

Writes BENCH/SKEW.md and exits 1 unless p99/p50 <= 4 with mitigations
ON while the unmitigated layout concentrates >= 10x the median into
one task — the quantitative version of SURVEY §4's skew requirement.

Usage: python scripts/skew_probe.py [n_rows]   (default 60000 = sf0.1)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

RES = 8
SALT_BITS = 4
NPART = 64
# hotspot box inside one res-8 cell (cell spans [9.84,11.25]x[39.7,40.4])
HOT = (10.0, 40.0, 10.05, 40.05)


def make_corpus(spark, n: int):
    """90% of rows in the hotspot box, 10% world-uniform — pure
    Catalyst arithmetic (deterministic at any parallelism)."""
    d = spark.range(n)
    h = F.col("id") % 10 < 9  # 90% hot
    # deterministic pseudo-uniform draws from the id
    u1 = (F.col("id") * 2654435761) % 1000000 / 1000000.0
    u2 = (F.col("id") * 40503) % 1000000 / 1000000.0
    return d.select(
        F.col("id"),
        F.when(h, HOT[0] + u1 * (HOT[2] - HOT[0]))
        .otherwise(-180.0 + u1 * 360.0)
        .alias("lon"),
        F.when(h, HOT[1] + u2 * (HOT[3] - HOT[1]))
        .otherwise(-85.0 + u2 * 170.0)
        .alias("lat"),
        ((F.col("id") * 7919) % 100).cast("int").alias("v"),
    )


def rows_per_task(df, npart: int) -> list[int]:
    got = {
        int(r.pid): int(r.n)
        for r in df.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    return [got.get(i, 0) for i in range(npart)]


def histo(counts: list[int]) -> dict:
    a = np.sort(np.asarray(counts, dtype=np.int64))
    return {
        "tasks": len(a),
        "p50": int(np.percentile(a, 50)),
        "p99": int(np.percentile(a, 99)),
        "max": int(a[-1]),
        "ratio_p99_p50": round(float(np.percentile(a, 99)) / max(np.percentile(a, 50), 1.0), 2),
        "ratio_max_p50": round(float(a[-1]) / max(np.percentile(a, 50), 1.0), 2),
    }


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 60000
    from eo_tools_spark.functions.spatial import cell_col
    from eo_tools_spark.plans.skew import parent_cell_salt, row_salt, salted_agg
    from eo_tools_spark.session import get_spark

    spark = get_spark(
        "skew-probe",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    df = make_corpus(spark, n).persist()
    n_hot = df.where(
        (F.col("lon") >= HOT[0]) & (F.col("lon") <= HOT[2])
        & (F.col("lat") >= HOT[1]) & (F.col("lat") <= HOT[3])
    ).count()

    cell = cell_col("lon", "lat", RES)
    spatial_salt = parent_cell_salt("lon", "lat", RES, salt_bits=SALT_BITS)
    salt = row_salt("id", salt_bits=8)

    # ---- A: the per-cell shuffle, three layouts -------------------
    t0 = time.time()
    off = histo(rows_per_task(df.repartition(NPART, cell), NPART))
    t_off = time.time() - t0
    t0 = time.time()
    spatial = histo(rows_per_task(df.repartition(NPART, cell, spatial_salt), NPART))
    t_spatial = time.time() - t0
    t0 = time.time()
    on = histo(rows_per_task(df.repartition(NPART, cell, salt), NPART))
    t_on = time.time() - t0

    # ---- B: salted_agg parity + bounded final-shuffle rows -------
    dfc = df.withColumn("cell", cell)
    plain = {
        r.cell: (r.n, r.sum_v, r.min_v, r.max_v)
        for r in dfc.groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("sum_v"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
        )
        .collect()
    }
    salted_partial = dfc.withColumn("_salt", salt).groupBy("cell", "_salt").agg(
        F.count(F.lit(1)).alias("n")
    )
    n_partial_rows = salted_partial.count()  # what the FINAL shuffle moves
    salted = {
        r.cell: (r.n, r.sum_v, r.min_v, r.max_v)
        for r in salted_agg(
            dfc,
            ["cell"],
            salt,
            {
                "n": F.count(F.lit(1)),
                "sum_v": F.sum("v"),
                "min_v": F.min("v"),
                "max_v": F.max("v"),
            },
        ).collect()
    }
    agg_parity = plain == salted
    hot_cell_shards = max(
        r.k for r in salted_partial.groupBy("cell").agg(F.count(F.lit(1)).alias("k")).collect()
    )

    # ---- C: adaptive_cover on the flagship with the AOI edge
    # crossing the hotspot --------------------------------------------
    from eo_tools_spark.operators.spatial_join import (
        _cover_rows,
        adaptive_cover,
        aoi_point_join,
        build_aoi_cover,
    )

    # AOI whose LEFT edge passes through the hotspot box: the hot cell
    # is a boundary cell, so every hot row pays the PIP refine
    aois = {
        "edge": np.array(
            [[10.02, 39.0], [13.0, 39.0], [13.0, 42.0], [10.02, 42.0], [10.02, 39.0]]
        )
    }
    # max_iters must OUT-RESOLVE the hotspot: the split floor is one
    # child cell's worth of rows, so splitting to res 15 (cell ~0.011
    # deg < the 0.05 deg hotspot) is what bounds a 90% point-like mass
    # (measured: max_iters=4 stops at res 12 > hotspot size and floors
    # at ~22k rows regardless of cap)
    cap = max(1000, n // 20)
    cover_df, _ = adaptive_cover(
        df, aois, base_res=RES, max_rows_per_cell=cap, max_iters=7
    )

    def max_boundary_cell_rows(rows3) -> int:
        by_res: dict[int, list[int]] = {}
        for _aid, c, b in rows3:
            if b:
                by_res.setdefault(int(c) >> 58, []).append(int(c))
        mx = 0
        for r, cs in by_res.items():
            got = (
                df.where(cell_col("lon", "lat", r).isin(cs))
                .groupBy(cell_col("lon", "lat", r).alias("c"))
                .count()
                .agg(F.max("count"))
                .collect()[0][0]
            )
            mx = max(mx, int(got or 0))
        return mx

    before_rows = _cover_rows(aois, RES)
    after_rows = [(r.aoi_id, r.cell, r.boundary) for r in cover_df.collect()]
    mx_before = max_boundary_cell_rows(before_rows)
    mx_after = max_boundary_cell_rows(after_rows)

    # join parity: adaptive cover must not change the result set
    base_cover = build_aoi_cover(spark, aois, RES)
    ids_base = {
        r.id for r in aoi_point_join(df, aois, cover=base_cover).select("id").collect()
    }
    ids_adap = {
        r.id
        for r in aoi_point_join(df, aois, cover=(cover_df, _)).select("id").collect()
    }
    join_parity = ids_base == ids_adap

    ok = (
        on["ratio_p99_p50"] <= 4.0
        and off["ratio_max_p50"] >= 10.0
        and agg_parity
        and join_parity
        and mx_after <= cap
        and mx_before > cap
    )

    md = f"""# Skew torture probe (round-6; scripts/skew_probe.py)

Pathological corpus: **{n} rows, {n_hot} ({100.0 * n_hot / n:.1f}%) inside ONE
res-{RES} cell** (hotspot box {HOT}, 0.05 deg across — FINER than a
res-12 cell) — 9x worse than the synthetic tables' standing 50%
hotspot, and deliberately small enough to defeat naive spatial
sharding. All numbers from `python scripts/skew_probe.py {n}` at this
HEAD; local[32], {NPART} shuffle partitions for the repartition probes.

## A. Per-cell shuffle — rows per task ({NPART} tasks)

The shuffle every grouped per-cell processing stage pays
(`repartition(cell)`), three layouts:

| layout | p50 | p99 | max | p99/p50 | max/p50 | wall (s) |
|---|---|---|---|---|---|---|
| unsalted `repartition(cell)` | {off["p50"]} | {off["p99"]} | {off["max"]} | **{off["ratio_p99_p50"]}** | {off["ratio_max_p50"]} | {t_off:.1f} |
| spatial `parent_cell_salt` (bits={SALT_BITS}) | {spatial["p50"]} | {spatial["p99"]} | {spatial["max"]} | {spatial["ratio_p99_p50"]} | {spatial["ratio_max_p50"]} | {t_spatial:.1f} |
| `row_salt` (8 bits, xxhash64(id)) | {on["p50"]} | {on["p99"]} | {on["max"]} | **{on["ratio_p99_p50"]}** | {on["ratio_max_p50"]} | {t_on:.1f} |

Unmitigated, one task carries {off["ratio_max_p50"]}x the median — at
100 TB that task IS the job's wall clock. The SPATIAL salt is honest
about its limit (plans/skew.py parent_cell_salt docstring): the
hotspot is smaller than the res-{RES + SALT_BITS} child cells it
derives shards from, so the hot cell splits into only a handful of
shards and the skew survives — this probe is exactly the distribution
that defeats it. The point-mass-safe `row_salt` (deterministic
xxhash64 of the row id — resumable, no rand()) bounds p99/p50 at
{on["ratio_p99_p50"]} (gate: <= 4). Rule: parent_cell_salt when shards
must stay spatially local; row_salt whenever the shards are merged by
a SUM-decomposable combine (all salted_agg uses).

## B. Salted two-phase aggregation at the 90% distribution

`salted_agg` (row_salt) == plain `groupBy().agg()` on
count/sum/min/max over every cell: **{"exact" if agg_parity else "MISMATCH"}**.
The final shuffle moves {n_partial_rows} partial rows (#cells x
#salts; hot cell split into {hot_cell_shards} shards) instead of {n}
data rows.

## C. Adaptive cover split on the flagship join (AOI edge through the hotspot)

Boundary cells pay the PIP refine; the AOI's left edge crosses the
hotspot cell, so unmitigated ALL {n_hot} hot rows land in one boundary
cell. (Note the flagship join itself never shuffles the big side —
per-TASK work is bounded by input splits regardless; the per-CELL
bound matters for downstream per-cell rollups and for the refine-cost
audit q12 runs.)

| cover | max rows in one boundary cell | cap |
|---|---|---|
| geometric (res {RES}) | {mx_before} | {cap} |
| adaptive density split (max_iters=7) | {mx_after} | {cap} |

max_iters must out-resolve the hotspot: splitting stops being useful
at the hotspot's own size, so the probe splits to res 15 (~0.011 deg
< 0.05 deg hotspot). At max_iters=4 (res 12 floor, cell > hotspot)
the same probe floors at ~22.5k rows per cell no matter the cap —
measured, and now documented in the operator docstring.

Join row parity adaptive vs geometric cover: **{"identical" if join_parity else "MISMATCH"}**
({len(ids_base)} matched rows). The split is driver-only after ONE
counting scan (spatial_join.py adaptive_cover), so the mitigation
costs one metadata pass, not a rescan per iteration.

## Verdict

GATES: row_salt p99/p50 <= 4 -> {on["ratio_p99_p50"]} | unsalted max/p50 >= 10 ->
{off["ratio_max_p50"]} | agg parity -> {agg_parity} | join parity -> {join_parity} |
adaptive max <= cap -> {mx_after} <= {cap} | geometric max > cap -> {mx_before} > {cap}

**{"ALL GATES PASS" if ok else "GATE FAILURE"}**
"""
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH", "SKEW.md"
    )
    with open(out_path, "w") as f:
        f.write(md)
    print(md)
    print("written:", out_path)
    df.unpersist()
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
