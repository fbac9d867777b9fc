"""Partitioning / plan-shaping helpers shared by the sketch operators."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pushdown_barrier(c: Column) -> Column:
    """No-op wrapper that blocks predicate pushdown through the projection
    defining ``c``.

    ``element_at(shuffle(array(c)), 1)`` always evaluates to ``c`` (a
    1-element array has one permutation), but ``shuffle`` is
    non-deterministic, which makes the enclosing Project non-pushable:
    Catalyst's PushDownPredicates only pushes filters through fully
    deterministic projections, so a later ``filter`` on this column
    evaluates the MATERIALIZED per-row value instead of inlining the
    defining expression into the predicate.  (A ``when(rand() >= -1, c)``
    guard does NOT work: Spark 4.x folds comparisons against rand's
    known [0, 1) bounds and the barrier vanishes — verified in
    tests/test_streaming_corpus.py.)  Use when the defining expression
    is an expensive HOF pipeline (inlining re-evaluates free-variable
    subtrees per array element — see text.with_repetition's CAUTION)
    and an Aggregate barrier is not available, e.g. stateless streaming
    gates where a groupBy would force watermarks and an output-mode
    change.
    """
    return F.element_at(F.shuffle(F.array(c)), 1)


def spread_by(df: DataFrame, *cols: str) -> DataFrame:
    """Keyed :func:`spread`: hash-repartition to the cluster's default
    parallelism on ``cols`` — only when the input is under-partitioned
    (same ``inputFiles`` guard and streaming pass-through as
    :func:`spread`).

    Why keyed and why pinned (r12 optimization round): the symbol-keyed
    window/fold kernels (EMA/Wilder ``aggregate()`` folds, applyInPandas
    stages) get their Exchange from EnsureRequirements, and AQE then
    coalesces it by SIZE — a few MB of candles collapse to ONE partition,
    serializing per-key compute that is orders of magnitude heavier per
    byte than the shuffle traffic AQE's sizing models (measured sf0.1:
    adx_dmi 1.445 → 0.651 s, enrich 0.556 → 0.232 s).  A user-specified
    ``repartition(n, key)`` is exempt from AQE coalescing, and the
    kernel's required ClusteredDistribution(prefix of ``cols``) is
    satisfied by it, so no second Exchange is planned.  On inputs already
    wider than ``defaultParallelism`` (the 100 TB target) this is a
    pass-through and AQE sizing governs — the partition count stays
    scale-adaptive, never a local constant.

    Guard caveat (advice/verdict r12): ``inputFiles()`` is empty for any
    non-file lineage — createDataFrame test frames (tiny by
    construction, the repartition is the safe default) but also a future
    non-file PRODUCTION batch source (Kafka batch, JDBC), which would
    take a gratuitous full shuffle per call site; likewise a large input
    stored as FEW big splittable files repartitions even though the scan
    already splits wider than the file count.  If such sources appear,
    gate on estimated input bytes or the plan's existing partitioning
    instead of file count.
    """
    if df.isStreaming:
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    if len(df.inputFiles()) < target:
        return df.repartition(target, *[F.col(c) for c in cols])
    return df


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
