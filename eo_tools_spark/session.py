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
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.sql.shuffle.partitions", str(nshuffle))
        # AOI / orbit / annotation side tables are tiny; always broadcast.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        # Vectorized parquet reader stays ON globally (numeric scans
        # want it). Large-binary payload columns (image bytes, ~20 KB/
        # value) degrade it badly — 164 s vs 40 s on a 41 GB bytes scan
        # at local[32] (the columnar batch allocator thrashes on multi-KB
        # byte arrays) — so binary-heavy tables are read through
        # read_binary_parquet(), which disables it PER-READ only.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def read_binary_parquet(spark: SparkSession, *paths: str):
    """Read a parquet table whose rows carry multi-KB binary payloads
    (image/media bytes). Uses the row-based parquet reader for THIS read
    only — the vectorized reader's columnar batches (4096 rows × ~20 KB)
    thrash the allocator on such columns (measured 164 s vs 40 s on a
    41 GB scan at local[32]); numeric tables elsewhere keep the
    vectorized fast path."""
    return spark.read.option("enableVectorizedReader", "false").parquet(*paths)
