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
    ``defaultParallelism``.  Checking the current partition count triggers
    physical planning but runs no job.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
