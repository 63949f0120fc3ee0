"""Streaming adapter: backlog → micro-batches → snapshot commits,
restart-safe and equal to the one-shot batch result."""

import numpy as np

from eo_tools_spark.sources.derived import aoi_rings
from eo_tools_spark.sources.snapshots import SnapshotTable
from eo_tools_spark.sources.synthetic import IMAGE_SCHEMA, images_table
from eo_tools_spark.streaming import stream_images_to_snapshots


def test_events_watermark_window(spark, tmp_path, sf_dir):
    """Windowed event-time aggregation under a watermark: the finalized
    (append-mode) windows match the batch groupBy for closed windows."""
    from pyspark.sql import functions as F

    from eo_tools_spark.streaming.pipeline import stream_events_windowed

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    src = str(tmp_path / "esrc")
    events.repartition(6).write.parquet(src)

    q = stream_events_windowed(
        spark, src, events.schema, str(tmp_path / "eout"), str(tmp_path / "eck")
    )
    q.awaitTermination(300)

    got = spark.read.parquet(str(tmp_path / "eout"))
    batch = (
        events.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.expr("CAST(ROUND(value * 100, 0) AS BIGINT)")).alias("sum_cents"),
        )
        .select(F.col("win.start").alias("window_start"), "event_type", "n_events", "sum_cents")
    )
    # append mode emits only windows closed w.r.t. the final watermark:
    # every emitted row must match the batch result exactly
    g = {tuple(r) for r in got.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert g <= b and len(g) > 0
    # all windows older than (max ts - watermark) must have been emitted
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    import datetime

    cutoff = max_ts - datetime.timedelta(hours=3)  # watermark 2h + window 1h
    closed = {t for t in b if t[0] < cutoff.replace(minute=0, second=0, microsecond=0)}
    assert closed <= g


def test_stateful_sessionize(spark, tmp_path, sf_dir):
    """applyInPandasWithState sessionizer: closed sessions emitted by
    the stream equal the batch sessionizer's closed sessions, with
    state carrying open sessions across micro-batches (files split by
    time so sessions straddle batch boundaries)."""
    from pyspark.sql import functions as F

    from eo_tools_spark.streaming.pipeline import stream_sessionize

    events = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "_t", F.unix_timestamp(F.col("ts").cast("timestamp"))
    )
    median = events.approxQuantile("_t", [0.5], 0.0)[0]
    src = str(tmp_path / "ssrc")
    e1 = events.where(F.col("_t") <= median).drop("_t")
    e2 = events.where(F.col("_t") > median).drop("_t")
    e1.coalesce(1).write.parquet(src)
    e2.coalesce(1).write.mode("append").parquet(src)
    events = events.drop("_t")

    q = stream_sessionize(
        spark, src, events.schema, str(tmp_path / "sout"), str(tmp_path / "sck"),
        gap_seconds=1800,
    )
    q.awaitTermination(300)
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.read.parquet(str(tmp_path / "sout")).collect()
    }

    # batch oracle: all sessions, then drop each user's LAST (still open)
    batch = spark.sql("""
        WITH e AS (SELECT user_id, unix_timestamp(CAST(ts AS TIMESTAMP)) AS t
                   FROM parquet.`{src}`),
        lagged AS (SELECT user_id, t, CASE WHEN t - LAG(t) OVER
            (PARTITION BY user_id ORDER BY t) > 1800 THEN 1 ELSE 0 END AS ns FROM e),
        sess AS (SELECT user_id, t, SUM(ns) OVER (PARTITION BY user_id ORDER BY t
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM lagged)
        SELECT user_id, sid, MIN(t) AS session_start, MAX(t) AS session_end,
               COUNT(*) AS n_events
        FROM sess GROUP BY user_id, sid
    """.replace("{src}", src))
    pdf = batch.toPandas()
    closed = set()
    for uid, grp in pdf.groupby("user_id"):
        g = grp.sort_values("session_start")
        for r in g.iloc[:-1].itertuples():  # last session stays open in state
            closed.add((uid, r.session_start, r.session_end, r.n_events))
    assert got == closed and len(closed) > 100


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


def test_stream_torn_epoch_exactly_once(spark, tmp_path):
    """Round-5 verdict task 6: crash in the window AFTER the snapshot
    commit but BEFORE the streaming checkpoint records the epoch (the
    classic torn-epoch double-write hazard). On restart Spark replays
    the epoch with the same id; the snapshot layer's idempotent
    batch-id skip must yield exactly-once rows == the batch oracle."""
    import pytest
    from pyspark.errors import StreamingQueryException

    src = str(tmp_path / "src")
    images_table(spark, 300, partitions=3).write.parquet(src)
    table = SnapshotTable(spark, str(tmp_path / "snap"))

    crashed = []

    def bomb(epoch_id):
        crashed.append(epoch_id)
        raise RuntimeError("torn epoch: killed before checkpoint commit")

    q = stream_images_to_snapshots(
        spark, src, IMAGE_SCHEMA, table,
        aoi_rings(), str(tmp_path / "ckpt"), available_now=True,
        post_commit_hook=bomb,
    )
    with pytest.raises(StreamingQueryException, match="torn epoch"):
        q.awaitTermination(300)
    assert set(crashed) == {0}
    # the sink already holds epoch 0 (commit happened before the crash)
    assert table.committed_batches() == ["epoch=00000000"]

    # restart with the SAME checkpoint, no bomb: Spark replays epoch 0,
    # the snapshot layer skips the already-committed batch id
    q2 = stream_images_to_snapshots(
        spark, src, IMAGE_SCHEMA, table,
        aoi_rings(), str(tmp_path / "ckpt"), available_now=True,
    )
    q2.awaitTermination(300)

    from eo_tools_spark.operators.spatial_join import aoi_point_join

    exp = {(r.image_id, r.aoi_id) for r in aoi_point_join(
        spark.read.parquet(src), aoi_rings()
    ).collect()}
    rows = table.read().select("image_id", "aoi_id").collect()
    assert len(rows) == len(exp) > 0  # no duplicates (multiset equality)
    assert {(r.image_id, r.aoi_id) for r in rows} == exp
    # the replay committed under the SAME batch id — no shadow batch
    assert table.committed_batches() == ["epoch=00000000"]


def test_stream_exact_dedup(spark, tmp_path, sf_dir):
    """Streaming dedup emits each distinct text once across
    micro-batches; survivors are a superset-exact match of the batch
    distinct-fingerprint set."""
    from pyspark.sql import functions as F

    from eo_tools_spark.streaming.pipeline import stream_exact_dedup

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .limit(400)
        .withColumn("ts", F.timestamp_seconds(F.lit(1700000000) + F.col("doc_id")))
    )
    src = str(tmp_path / "dsrc")
    docs.repartition(8).write.parquet(src)  # 8 files → several micro-batches

    q = stream_exact_dedup(
        spark, src, spark.read.parquet(src).schema,
        str(tmp_path / "dout"), str(tmp_path / "dck"),
    )
    q.awaitTermination(300)

    got = spark.read.parquet(str(tmp_path / "dout")).toPandas()
    exp_fps = {
        r.fp for r in docs.select(F.md5("text").alias("fp")).distinct().collect()
    }
    assert set(got["fp"]) == exp_fps          # every distinct content present
    assert len(got) == len(set(got["fp"]))    # exactly once


def test_stream_neardup_candidates_equals_batch(spark, tmp_path, sf_dir):
    """Streaming LSH candidates (stateful per-bucket pairing across
    micro-batches) match the batch lsh_pairs candidate SET over the
    same docs — bucket assignment is shared code (band_key_cols), so
    any divergence would be a state-handling bug. Duplicate emissions
    (same pair via several bands) are allowed; the set must be equal
    when no bucket exceeds the cap."""
    from pyspark.sql import functions as F

    from eo_tools_spark.operators.dedup import lsh_pairs, minhash_signatures
    from eo_tools_spark.streaming.pipeline import stream_neardup_candidates

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(300).select(
        "doc_id", "text"
    )
    src = str(tmp_path / "nsrc")
    docs.repartition(5).write.parquet(src)  # 5 files → 5 micro-batches

    q = stream_neardup_candidates(
        spark, src, spark.read.parquet(src).schema,
        str(tmp_path / "nout"), str(tmp_path / "nck"),
        num_hashes=64, shingle=2, bands=16, max_bucket=512,
    )
    q.awaitTermination(300)

    got = {
        (r.id_a, r.id_b)
        for r in spark.read.parquet(str(tmp_path / "nout")).collect()
    }
    sig = minhash_signatures(docs, num_hashes=64, shingle=2)
    exp = {(r.id_a, r.id_b) for r in lsh_pairs(sig, bands=16, max_bucket=None).collect()}
    assert got == exp and len(exp) > 0

    # restart with the same checkpoint: no re-emission (exactly-once files)
    q2 = stream_neardup_candidates(
        spark, src, spark.read.parquet(src).schema,
        str(tmp_path / "nout"), str(tmp_path / "nck"),
        num_hashes=64, shingle=2, bands=16, max_bucket=512,
    )
    q2.awaitTermination(300)
    got2 = {
        (r.id_a, r.id_b)
        for r in spark.read.parquet(str(tmp_path / "nout")).collect()
    }
    assert got2 == exp


def test_stream_neardup_bucket_cap(spark, tmp_path):
    """A degenerate bucket (many identical texts) stops pairing at the
    cap: members past max_bucket are neither paired nor remembered."""
    import pandas as pd

    from eo_tools_spark.streaming.pipeline import stream_neardup_candidates

    rows = [(i, "same text everywhere") for i in range(20)]
    rows += [(100, "unique zebra quartz"), (101, "unique zebra quartz")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    src = str(tmp_path / "csrc")
    docs.repartition(2).write.parquet(src)

    q = stream_neardup_candidates(
        spark, src, spark.read.parquet(src).schema,
        str(tmp_path / "cout"), str(tmp_path / "cck"),
        num_hashes=16, shingle=1, bands=4, max_bucket=5,
    )
    q.awaitTermination(300)
    got = spark.read.parquet(str(tmp_path / "cout")).toPandas()
    pairs = {(r.id_a, r.id_b) for r in got.itertuples()}
    # the degenerate cluster contributes at most C(5,2) distinct pairs
    degenerate = {p for p in pairs if p[0] < 100}
    assert 0 < len(degenerate) <= 10
    # the small clean pair still found
    assert (100, 101) in pairs


def test_stream_neardup_distinct_collapses_band_duplicates(spark, tmp_path, sf_dir):
    """The cascaded global-distinct stage (VERDICT r3 item 7): the
    candidate sink carries per-band duplicate pairs (same pair via
    several bands); stream_neardup_pairs_distinct must collapse them to
    exactly one row per pair, and the distinct pair SET must still
    equal the batch lsh_pairs set (batch parity)."""
    from pyspark.sql import functions as F

    from eo_tools_spark.operators.dedup import lsh_pairs, minhash_signatures
    from eo_tools_spark.streaming.pipeline import (
        stream_neardup_candidates,
        stream_neardup_pairs_distinct,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(300).select(
        "doc_id", "text"
    )
    src = str(tmp_path / "dsrc")
    docs.repartition(5).write.parquet(src)

    q = stream_neardup_candidates(
        spark, src, spark.read.parquet(src).schema,
        str(tmp_path / "dcand"), str(tmp_path / "dck1"),
        num_hashes=64, shingle=2, bands=16, max_bucket=512,
    )
    q.awaitTermination(300)
    cand = spark.read.parquet(str(tmp_path / "dcand"))
    n_cand_rows = cand.count()
    n_cand_pairs = cand.select("id_a", "id_b").distinct().count()
    assert n_cand_rows > n_cand_pairs  # per-band duplicates exist upstream

    q2 = stream_neardup_pairs_distinct(
        spark, str(tmp_path / "dcand"),
        str(tmp_path / "ddist"), str(tmp_path / "dck2"),
    )
    q2.awaitTermination(300)
    dist = spark.read.parquet(str(tmp_path / "ddist")).toPandas()
    got = {(r.id_a, r.id_b) for r in dist.itertuples()}
    assert len(dist) == len(got)  # exactly once per pair

    sig = minhash_signatures(docs, num_hashes=64, shingle=2)
    exp = {
        (r.id_a, r.id_b)
        for r in lsh_pairs(sig, bands=16, max_bucket=None).collect()
    }
    assert got == exp and len(exp) > 0

    # checkpoint restart: nothing re-emitted
    q3 = stream_neardup_pairs_distinct(
        spark, str(tmp_path / "dcand"),
        str(tmp_path / "ddist"), str(tmp_path / "dck2"),
    )
    q3.awaitTermination(300)
    again = spark.read.parquet(str(tmp_path / "ddist"))
    assert again.count() == len(got)


def test_stream_neardup_state_ttl_smoke(spark, tmp_path):
    """state_ttl_ms wires ProcessingTimeTimeout (ADVICE r3 item 3):
    with a generous TTL nothing expires inside one availableNow run, so
    results equal the no-TTL run — pins that the TTL path emits pairs
    and updates state correctly (the expiry trade itself is
    wall-clock-driven and documented, not unit-testable determinately)."""
    from eo_tools_spark.streaming.pipeline import stream_neardup_candidates

    rows = [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"),
            (3, "zebra quartz lemon"), (4, "zebra quartz lemon")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    src = str(tmp_path / "tsrc")
    docs.repartition(2).write.parquet(src)

    q = stream_neardup_candidates(
        spark, src, spark.read.parquet(src).schema,
        str(tmp_path / "tout"), str(tmp_path / "tck"),
        num_hashes=16, shingle=1, bands=4, max_bucket=64,
        state_ttl_ms=3_600_000,
    )
    q.awaitTermination(300)
    got = {
        (r.id_a, r.id_b)
        for r in spark.read.parquet(str(tmp_path / "tout")).collect()
    }
    assert (1, 2) in got and (3, 4) in got
