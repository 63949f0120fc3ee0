"""InSAR/terrain driver-fixture invariants (sources/insar_fixture).

The heavyweight checks (dense-oracle parity, cross-parallelism
bit-stability of the full chains) run in scripts/make_insar_oracle.py at
pin time; these tests keep the cheap load-bearing invariants in CI.
"""

import numpy as np
from pyspark.sql import functions as F

from eo_tools_spark.sources.insar_fixture import (
    N_INSAR,
    T_INSAR,
    insar_pair_tiles,
    slc_field,
    terrain_contributions,
    tiles_digest,
)


def test_field_is_pure_function_of_index():
    ii, jj = np.mgrid[40:60, 80:100].astype(np.float64)
    a = slc_field(ii, jj)
    b = slc_field(ii.copy(), jj.copy())
    np.testing.assert_array_equal(a, b)
    # fractional sampling is defined (the secondary shift path)
    c = slc_field(ii + 0.25, jj + 0.5)
    assert np.isfinite(c).all() and not np.allclose(a, c)


def test_tile_generation_bit_stable_across_partitioning(spark):
    prm1, _, _ = insar_pair_tiles(spark)
    d1 = {(r.ty, r.tx): r.digest for r in tiles_digest(prm1, "p").collect()}
    prm2, _, _ = insar_pair_tiles(spark)
    d2 = {
        (r.ty, r.tx): r.digest
        for r in tiles_digest(prm2.repartition(13), "p").collect()
    }
    assert d1 == d2 and len(d1) == (N_INSAR // T_INSAR) ** 2


def test_terrain_fold_matches_production_sum(spark):
    """The driver query's order-independent sorted fold equals the
    production scatter_accumulate F.sum to float tolerance — the gated
    values really are the terrain operator's numbers."""
    from eo_tools_spark.operators.sar_geom import scatter_accumulate

    contrib = terrain_contributions(spark).persist()
    try:
        prod = {
            (r.az, r.rg): r.gamma for r in scatter_accumulate(contrib).collect()
        }
        fold = contrib.groupBy("az", "rg").agg(
            F.expr(
                "aggregate(array_sort(collect_list(gamma)), CAST(0.0 AS DOUBLE), "
                "(acc, x) -> acc + x)"
            ).alias("g")
        )
        got = {(r.az, r.rg): r.g for r in fold.collect()}
    finally:
        contrib.unpersist()
    assert set(got) == set(prod) and len(got) > 1000
    for k, v in got.items():
        assert abs(v - prod[k]) <= 1e-9 * max(1.0, abs(v))


def test_terrain_blocks_overlap_in_pixel_space(spark):
    """The scatter reduce must actually reduce ACROSS blocks (a
    block-disjoint layout would make the groupBy trivial)."""
    contrib = terrain_contributions(spark)
    multi = (
        contrib.groupBy("az", "rg")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
        .count()
    )
    assert multi > 100
