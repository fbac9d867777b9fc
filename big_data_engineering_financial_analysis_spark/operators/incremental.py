"""Incremental aggregate maintenance: algebraic partial-merge refresh.

The scale pattern behind every incrementally-maintained rollup /
materialized view: keep the aggregate in *mergeable partial* form
(count, sum, min, max — the algebraic decomposition Spark itself uses for
map-side combine), aggregate only the delta batch, and MERGE partials —
O(|delta| + |groups|) per refresh instead of O(|history|) recomputation.
Derived measures (avg) are computed from the merged partials at read time,
never stored (they don't merge).

At 100 TB the base partials are a compact keyed table (one row per group)
while history is huge — refresh cost is decoupled from history size.
Parity with full recomputation is the correctness contract
(``incremental_rollup`` registry query: split-at-cutoff + merge vs the
oracle's direct full-history GROUP BY).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: partial-form measure columns for a (count, sum, min, max) rollup
PARTIAL_COLS = ["n", "sum_v", "min_v", "max_v"]


def to_partials(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """Aggregate rows to mergeable partial form — one shuffle with
    map-side combine."""
    return df.groupBy(*keys).agg(
        F.count(value_col).alias("n"),
        F.sum(value_col).alias("sum_v"),
        F.min(value_col).alias("min_v"),
        F.max(value_col).alias("max_v"),
    )


def merge_partials(base: DataFrame, delta: DataFrame, keys: list[str]) -> DataFrame:
    """Merge two partial tables: union + re-reduce.  count/sum add;
    min/max reduce; groups present in only one side pass through.  The
    union shuffles on the SAME keys as the partials were built on, so AQE
    coalesces this into a cheap |groups|-sized exchange."""
    return base.unionByName(delta).groupBy(*keys).agg(
        F.sum("n").alias("n"),
        F.sum("sum_v").alias("sum_v"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
    )


def finalize(partials: DataFrame) -> DataFrame:
    """Derive non-mergeable measures from partials at read time."""
    return partials.withColumn(
        "avg_v", F.col("sum_v") / F.nullif(F.col("n"), F.lit(0))
    )
