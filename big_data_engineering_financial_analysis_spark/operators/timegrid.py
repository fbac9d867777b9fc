"""Calendar alignment: dense time grids + forward fill.

Tick/bar data is sparse — instruments don't trade every bucket — but
models and joins downstream want a dense, aligned calendar.  This is
the distributed ``asfreq + ffill``:

1. per key, generate the full bucket range its data spans (one
   min/max aggregate + ``sequence`` explode — the grid is generated
   inside the executors, never driver-side);
2. left-join the observed bars onto the grid (equi-join on key+bucket);
3. forward-fill with ``last(value, ignorenulls=True)`` over the
   unbounded-preceding frame — an O(1)-per-row running aggregate, NOT a
   self-join; rows before the first observation stay NULL.

Scale: the grid explode multiplies keys x buckets, which is the OUTPUT
size — no blow-up beyond what the caller asked for.  The join and the
fill window share the key partitioning (one Exchange each).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def calendar_ffill(
    bars: DataFrame,
    key_col: str = "stock_symbol",
    time_col: str = "bucket",
    value_cols: tuple[str, ...] = ("close",),
    step: str = "interval 1 day",
) -> DataFrame:
    """Dense per-key calendar over each key's own observed span, with
    forward-filled values and an ``is_filled`` flag per row."""
    span = bars.groupBy(key_col).agg(
        F.min(time_col).alias("__t0"), F.max(time_col).alias("__t1")
    )
    grid = span.select(
        key_col,
        F.explode(
            F.sequence(F.col("__t0"), F.col("__t1"), F.expr(step))
        ).alias(time_col),
    )
    j = grid.join(
        bars.select(key_col, time_col, *value_cols), [key_col, time_col], "left"
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(time_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    first_vc = value_cols[0]
    j = j.withColumn("is_filled", F.col(first_vc).isNull().cast("int"))
    for vc in value_cols:
        j = j.withColumn(vc, F.last(vc, ignorenulls=True).over(w))
    return j
