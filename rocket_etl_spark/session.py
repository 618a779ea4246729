"""SparkSession construction with engine defaults.

Scale-minded configs, set once here so every entry point (tests, bench,
spark-submit job) gets the same plan behavior:

* AQE on (runtime coalescing + skew-join splitting),
* Arrow on for every pandas-UDF exchange (the engine's only Python path),
* shuffle partitions sized to cores for local mode — on a real cluster
  AQE coalesces, so a generous static number is safe.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_ENGINE_CONFS: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # fail fast if something silently falls back to per-row Python transfer
    "spark.sql.execution.arrow.pyspark.fallback.enabled": "false",
    "spark.sql.session.timeZone": "UTC",
    # zstd: 2.3x smaller lake files than snappy at equal-or-better wall
    # time on this host (interleaved A/B, OPTIMIZATION_r06.md) — and at
    # cluster scale the byte reduction is bandwidth directly (guide §6)
    "spark.sql.parquet.compression.codec": "zstd",
    # local mode: no dynamic executors; keep driver memory modest
    "spark.ui.enabled": "false",
}


def build_session(
    app_name: str = "rocket-etl-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, fallback all
    cores).  ``shuffle_partitions`` defaults to 2x the local parallelism —
    small enough to avoid tiny-task overhead locally, while AQE handles
    the real sizing on a cluster.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        par = os.cpu_count() or 8
        if master.startswith("local[") and master[6:-1].isdigit():
            par = int(master[6:-1])
        shuffle_partitions = max(8, 2 * par)

    builder = SparkSession.builder.appName(app_name).master(master)
    for k, v in _ENGINE_CONFS.items():
        builder = builder.config(k, v)
    # local mode is one JVM doing the work of a whole cluster: size its heap
    # like an executor, not like a driver (overridable via env)
    builder = builder.config(
        "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "12g")
    )
    builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
