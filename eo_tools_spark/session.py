"""SparkSession factory tuned for the tiling engine.

Defaults target local[N] testing but every knob is the one you would set on
a 1000-executor cluster: AQE on (runtime re-plan + skew-join mitigation),
Arrow enabled for pandas UDFs, shuffle partitions sized to cores locally
(on a real cluster leave it to AQE coalescing), broadcast threshold high
enough that AOI/orbit/metadata dims always broadcast.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "eo_tools_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``cores`` defaults to $SPARK_GRAFT_CPUS or '*'. On a real cluster the
    master/deploy-mode come from spark-submit; this factory only sets SQL
    behavior configs, all of which are cluster-safe.
    """
    if cores is None:
        cores_env = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cores_env}]" if cores_env else "local[*]"
    else:
        master = f"local[{cores}]"

    nshuffle = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE", DEFAULT_SHUFFLE_PARTITIONS)
    )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime coalescing, skew-join splitting — the backstop for
        # hotspot AOI cells on top of our explicit salting.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow for pandas UDFs / mapInPandas — the only sanctioned Python
        # boundary; row-at-a-time Python UDFs are banned in this engine.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 4096 suits SMALL rows; multi-KB binary rows want ~512 — but
        # only for those paths (see binary_batch_scope below): a global
        # 512 measured q2_knn ~50-70% SLOWER (8x more Python<->JVM
        # round-trips on small rows) while the image-decode pipeline is
        # 15-18% FASTER at 512 (a 4096-row batch of ~21 KB images is an
        # ~86 MB Arrow unit that serializes the pipeline).
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.sql.shuffle.partitions", str(nshuffle))
        # AOI / orbit / annotation side tables are tiny; always broadcast.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        # Vectorized parquet reader OFF globally. Two measurements:
        # (a) multi-KB binary columns (image bytes) degrade it badly —
        #     164 s vs 40 s on a 41 GB bytes scan at local[32] (the
        #     columnar batch allocator thrashes on large byte arrays);
        # (b) numeric-only scans at this workload's sizes show NO
        #     measurable penalty from the row reader (lineitem sf0.1
        #     aggregate scan: 0.174 s row vs 0.170 s vectorized, warm).
        # Per-read scoping is NOT possible: Spark 4.1.2 silently ignores
        # spark.read.option("enableVectorizedReader", ...) — verified by
        # plan inspection (FileScan stays `Batched: true`); only the
        # session conf is honored. So the safe global default wins.
        .config("spark.sql.parquet.enableVectorizedReader", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


from contextlib import contextmanager

_ARROW_BATCH_KEY = "spark.sql.execution.arrow.maxRecordsPerBatch"


@contextmanager
def binary_batch_scope(spark: SparkSession, records: int = 512):
    """Scope a smaller Arrow batch size around ACTIONS whose pandas-UDF
    input rows are multi-KB (image bytes, tile payloads).

    Why scoped, not global: the conf is read at job execution, so it
    can only be set session-wide — but the right value is row-size
    dependent. Measured on this engine: the 2M-image decode pipeline is
    15-18% faster at 512 than 4096 (an ~86 MB Arrow unit per 4096-row
    batch serializes the JVM->Python pipeline), while small-row paths
    (kNN's scene rows) run ~50-70% SLOWER under a global 512 (8x the
    per-batch round-trip overhead). Use::

        with binary_batch_scope(spark):
            decode_stats(frame).count()   # the ACTION must run inside

    The previous value is restored on exit. Only affects jobs whose
    execution starts inside the scope — a frame built here but executed
    later runs with whatever the conf is at action time.

    SESSION-WIDE, NOT THREAD-SAFE: the Arrow batch conf is mutated on
    the shared SparkSession, so any CONCURRENT query (another thread of
    the same session) that starts executing inside the scope silently
    runs at ``records``, and two overlapping scopes race on the
    restore. Single-threaded drivers (this repo's bench/tests) are
    fine; multi-threaded callers should serialize scope use or set the
    conf per dedicated session."""
    prev = spark.conf.get(_ARROW_BATCH_KEY, "4096")
    spark.conf.set(_ARROW_BATCH_KEY, str(records))
    try:
        yield
    finally:
        spark.conf.set(_ARROW_BATCH_KEY, prev)


def read_binary_parquet(spark: SparkSession, *paths: str):
    """Read a parquet table whose rows carry multi-KB binary payloads
    (image/media bytes). With get_spark() the row-based reader is
    already the session default (see the conf comment above — Spark
    4.1.2 ignores the per-read option, so scoping happens at the
    session level); this wrapper additionally ASSERTS the safe setting
    so a foreign session can't silently scan bytes vectorized."""
    conf = spark.conf.get("spark.sql.parquet.enableVectorizedReader", "true")
    if conf.lower() != "false":
        raise RuntimeError(
            "binary-payload tables must be read with "
            "spark.sql.parquet.enableVectorizedReader=false (the vectorized "
            "reader degrades ~4x on multi-KB byte arrays; the per-read "
            "option is ignored by Spark) — use eo_tools_spark.session.get_spark"
        )
    return spark.read.parquet(*paths)
