"""Bucketed co-located join: correct results AND a shuffle-free plan."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from eo_tools_spark.plans.bucketing import (
    colocated_join,
    plan_has_no_shuffle,
    write_bucketed,
)


def test_bucketed_join_no_exchange(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    # warehouse dir is a static conf — managed tables land in the session
    # default ./spark-warehouse (gitignored); dropped in finally
    try:
        n = 50000
        imgs = spark.range(n).select(
            F.col("id").alias("image_id"), (F.col("id") % 97).alias("x")
        )
        feats = spark.range(n).select(
            F.col("id").alias("image_id"), (F.col("id") * 3 % 101).alias("f")
        )
        write_bucketed(imgs, "imgs_b", "image_id", 8)
        write_bucketed(feats, "feats_b", "image_id", 8)

        joined = colocated_join(spark, "imgs_b", "feats_b", "image_id")
        assert plan_has_no_shuffle(joined), "bucketed join must not shuffle"
        assert joined.count() == n

        # identical rows to the plain join
        plain = imgs.join(feats, "image_id")
        assert joined.exceptAll(plain).isEmpty()
        assert plain.exceptAll(joined).isEmpty()

        # control: the unbucketed join DOES shuffle under forced SMJ
        assert not plan_has_no_shuffle(plain)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS imgs_b")
        spark.sql("DROP TABLE IF EXISTS feats_b")
