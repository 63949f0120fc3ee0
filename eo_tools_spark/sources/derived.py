"""Deterministic spatial/scene views derived from the driver's TPC-H-ish
parquet tables — so every spatial operator has a DuckDB-checkable oracle.

The derivation uses only integer-modulo + IEEE double arithmetic, so the
Spark expression and the DuckDB SQL produce bit-identical values. Scene
centers are deliberately skewed: half of all scenes land inside a 1°×1°
hotspot (mirrors the dense-AOI skew scenario of the north rule; the
FIXTURES.md images table uses the same trick).

Scene model ≈ one Sentinel-1 burst footprint per row:
  scene_id     from o_orderkey
  lon/lat      scene center (hotspot for even keys, global otherwise)
  product_id   orbit-track analog (o_custkey % 50)
  subswath     IW1..IW3
  burst        1..9   (9 bursts per subswath = reference fixture value,
                       /root/reference/tests/test_s1_core.py:31)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# single source of truth for the derivation — SQL fragments shared by the
# Spark plan (via F.expr / spark.sql) and the DuckDB oracle.
LON_SQL = (
    "CASE WHEN o_orderkey % 2 = 0 "
    "THEN 10.0 + CAST((o_orderkey * 9973) % 1000 AS DOUBLE) / 1000.0 "
    "ELSE CAST((o_orderkey * 9973) % 36000 AS DOUBLE) / 100.0 - 180.0 END"
)
LAT_SQL = (
    "CASE WHEN o_orderkey % 2 = 0 "
    "THEN 40.0 + CAST((o_orderkey * 7919) % 1000 AS DOUBLE) / 1000.0 "
    "ELSE CAST((o_orderkey * 7919) % 17000 AS DOUBLE) / 100.0 - 85.0 END"
)

SCENES_SQL_BODY = (
    "SELECT o_orderkey AS scene_id, "
    f"{LON_SQL} AS lon, "
    f"{LAT_SQL} AS lat, "
    "concat('PRD', lpad(CAST(o_custkey % 50 AS VARCHAR), 3, '0')) AS product_id, "
    "concat('IW', CAST(1 + o_orderkey % 3 AS VARCHAR)) AS subswath, "
    # FLOOR before casting: DuckDB CAST(double→int) rounds, Spark truncates
    "CAST(1 + CAST(FLOOR(o_orderkey / 3) AS BIGINT) % 9 AS INT) AS burst "
    "FROM orders"
)

# Spark's lpad on non-string needs explicit cast too; keep identical text.
SCENES_SQL_SPARK = SCENES_SQL_BODY.replace("AS VARCHAR", "AS STRING")


def scenes_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Register `orders` and return the derived scenes DataFrame."""
    spark.read.parquet(f"{sf_dir}/orders.parquet").createOrReplaceTempView("orders")
    return spark.sql(SCENES_SQL_SPARK)


# AOI test set (driver-defined constants — convex boxes so the DuckDB
# oracle is plain range predicates). 'hot' covers the skew hotspot.
AOI_BOXES: dict[str, tuple[float, float, float, float]] = {
    # bounds sit on a .0005 offset so no derived coordinate (0.001 / 0.01
    # grids) can fall exactly on an AOI edge — keeps half-open ray-casting
    # PIP and the closed-interval SQL oracle in exact agreement.
    "aoi_hot": (10.2005, 40.2005, 10.7995, 40.7995),
    "aoi_mid": (-20.0005, -10.0005, 15.0005, 20.0005),
    "aoi_edge": (100.0005, 50.0005, 140.0005, 75.0005),
    "aoi_empty": (179.0005, 89.0005, 179.5005, 89.5005),  # lat > max derivable → empty
}


def aoi_rings() -> dict:
    """AOI boxes as numpy rings for the engine side."""
    import numpy as np

    out = {}
    for aid, (x0, y0, x1, y1) in AOI_BOXES.items():
        out[aid] = np.array(
            [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], dtype=np.float64
        )
    return out


def scenes_from_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bench-scale scene table (one scene per lineitem row — 600k at
    sf0.1) with the same hotspot-skew derivation."""
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").createOrReplaceTempView(
        "lineitem"
    )
    body = (
        SCENES_SQL_SPARK.replace("o_orderkey", "(l_orderkey * 8 + l_linenumber)")
        .replace("o_custkey", "l_partkey")
        .replace("FROM orders", "FROM lineitem")
    )
    return spark.sql(body)


def aoi_pip_oracle_sql() -> str:
    """DuckDB oracle: scenes×AOI point-in-box join (UNION ALL of range
    predicates — semantically the exact PIP the engine computes)."""
    parts = []
    for aid, (x0, y0, x1, y1) in AOI_BOXES.items():
        parts.append(
            f"SELECT scene_id, lon, lat, '{aid}' AS aoi_id FROM scenes "
            f"WHERE lon >= {x0} AND lon <= {x1} AND lat >= {y0} AND lat <= {y1}"
        )
    return (
        f"WITH scenes AS ({SCENES_SQL_BODY}) "
        + " UNION ALL ".join(parts)
    )
