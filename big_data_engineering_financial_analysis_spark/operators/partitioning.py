"""Partitioning helpers shared by the sketch/similarity operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    """Repartition up to the cluster's default parallelism — only when the
    input is under-partitioned.

    Small parquet files arrive as a single partition, which serializes the
    md5/fold-heavy sketch work onto one task; but a genuinely large corpus
    is already well-partitioned, and an unconditional ``repartition()``
    would add a pointless full shuffle AND collapse the partition count to
    ``defaultParallelism``.

    The under-partitioned check is plan-side only: ``df.inputFiles()`` is a
    driver metadata call (file listing already cached by the scan relation),
    unlike ``df.rdd.getNumPartitions()`` which materializes the RDD lineage
    — a planning-time job trigger that gets expensive on a 100 TB table.
    File count lower-bounds the scan's partition count for splittable
    parquet; when it is below ``defaultParallelism`` the scan cannot feed
    every core, so a one-off spread shuffle pays for itself before the
    md5/fold-heavy sketch stage.  Non-file sources (in-memory test frames)
    report zero files and take the repartition, which is the safe default
    for exactly those tiny frames.
    """
    # Streaming frames: inputFiles() is undefined and parallelism comes
    # from the source (maxFilesPerTrigger / kafka partitions) — pass
    # through so row-local operators compose onto streams unchanged.
    if df.isStreaming:
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    if len(df.inputFiles()) < target:
        return df.repartition(target)
    return df
