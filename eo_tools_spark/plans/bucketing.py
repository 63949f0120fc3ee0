"""Bucketed table layout for co-located (shuffle-free) joins.

For repeated large-large equi-joins (e.g. image table ↔ per-image
features/LUT outputs at 10^12 scale), both sides are written bucketed +
sorted by the join key: Spark then plans a SortMergeJoin with NO
Exchange on either side — the shuffle is paid once at write time and
amortized over every subsequent join. This is the 'bucketing for
co-located joins' design SURVEY §4 calls out; partition pruning (pcell)
composes with it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 16,
    sort_col: str | None = None,
) -> None:
    """Persist as a bucketed managed table (spark-warehouse)."""
    w = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    w = w.sortBy(sort_col or bucket_col)
    w.saveAsTable(table_name)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two identically-bucketed tables on their bucket key."""
    return spark.table(left_table).join(spark.table(right_table), key)


def plan_has_no_shuffle(df: DataFrame) -> bool:
    """True iff the executed plan contains no shuffle Exchange
    (BroadcastExchange is fine)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        s = line.strip().lstrip("+-: *(0123456789)")
        if s.startswith("Exchange") and "Broadcast" not in s:
            return False
    return True
