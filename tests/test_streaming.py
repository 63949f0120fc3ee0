"""Streaming adapter: backlog → micro-batches → snapshot commits,
restart-safe and equal to the one-shot batch result."""

import numpy as np

from eo_tools_spark.sources.derived import aoi_rings
from eo_tools_spark.sources.snapshots import SnapshotTable
from eo_tools_spark.sources.synthetic import IMAGE_SCHEMA, images_table
from eo_tools_spark.streaming import stream_images_to_snapshots


def test_stream_equals_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    # backlog of 3 file groups
    imgs = images_table(spark, 300, partitions=3)
    imgs.write.parquet(src)

    table = SnapshotTable(spark, str(tmp_path / "snap"))
    q = stream_images_to_snapshots(
        spark, src, IMAGE_SCHEMA, table,
        aoi_rings(), str(tmp_path / "ckpt"), available_now=True,
    )
    q.awaitTermination(300)

    got = {(r.image_id, r.aoi_id) for r in table.read().collect()}

    from eo_tools_spark.functions.spatial import tile_id_col
    from eo_tools_spark.operators.spatial_join import aoi_point_join

    batch = aoi_point_join(spark.read.parquet(src), aoi_rings())
    exp = {(r.image_id, r.aoi_id) for r in batch.collect()}
    assert got == exp and len(exp) > 0

    # re-running the stream (same checkpoint) adds nothing — exactly-once
    n_before = len(table.committed_batches())
    q2 = stream_images_to_snapshots(
        spark, src, IMAGE_SCHEMA, table,
        aoi_rings(), str(tmp_path / "ckpt"), available_now=True,
    )
    q2.awaitTermination(300)
    assert {(r.image_id, r.aoi_id) for r in table.read().collect()} == exp
