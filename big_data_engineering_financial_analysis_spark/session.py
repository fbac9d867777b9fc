"""SparkSession factory.

Local testing runs ``local[$SPARK_GRAFT_CPUS]`` (single JVM); production
target is a multi-executor cluster reading ~100 TB, so every default here is
chosen to survive that scale-up:

- AQE on (runtime shuffle-partition coalescing, skew-join splitting) — at
  cluster scale the static partition count is always wrong for some stage.
- Arrow on for every pandas interop (the reference explicitly disabled it,
  services/stream-processing/app/consumer.py:163 — a 10-100x slow path).
- Session timezone pinned UTC so timestamps compare bit-for-bit with
  DuckDB/parquet naive timestamps (the reference keeps naive Asia/Tehran
  local times end-to-end; see functions/timeutil.py for the tz helpers).
- shuffle.partitions defaults to the local core count; on a real cluster
  AQE coalescing makes the initial number mostly irrelevant as long as it
  is not too small.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_APP_NAME = "bdefa-spark"


def _local_cpus() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = DEFAULT_APP_NAME,
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    ``cpus`` only affects a fresh JVM (local mode master string); on an
    existing session only SQL confs are (re)applied.
    """
    cpus = cpus or _local_cpus()
    shuffle_partitions = shuffle_partitions or cpus

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.fallback.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        # the synthetic events table stores TIMESTAMP(NANOS) which Spark has
        # no native type for; read as long and convert (sources/parquet.py)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # write timestamps as TIMESTAMP_MICROS: the legacy INT96 default
        # stores NO parquet min/max statistics, which would disable
        # row-group pruning and zone-map skipping on every time column —
        # the dominant at-rest access pattern for this engine
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
