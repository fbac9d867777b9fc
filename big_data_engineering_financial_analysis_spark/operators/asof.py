"""As-of (point-in-time) join — the canonical time-series operator Spark
lacks natively.

For every left row, attach the latest right row of the same key with
``right.time <= left.time`` (pandas ``merge_asof`` / DuckDB ``ASOF JOIN``
backward-inclusive semantics).  The scalable formulation is NOT a join at
all: union both sides, sort per key by (time, side) with the right side
first at equal timestamps, forward-fill the right payload with
``last(..., ignorenulls=True)``, keep left rows.

One shuffle (by key), one window pass, output linear in input — versus the
naive range-join which is quadratic per key.  An ``applyInPandas``
``pd.merge_asof`` per key would also work but pays Arrow transfer and a
Python stage for something window primitives express exactly.

Right-side rows must be unique per (key, time) for the result to be
well-defined (the same caveat DuckDB's ASOF JOIN has with duplicate right
timestamps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def range_join_pairs(
    events: DataFrame,
    key: str,
    time_col: str,
    id_col: str,
    max_gap_s: int,
) -> DataFrame:
    """Self range-join: pairs of same-key rows within ``max_gap_s`` seconds.

    The naive formulation is a per-key cross join filtered on the time
    difference — quadratic per key and not an equi-join, so Spark plans a
    nested loop.  The scalable pattern (per the standard bucketize recipe):
    quantize time into ``max_gap_s`` buckets, explode one side into its own
    and the NEXT bucket, equi-join on (key, bucket), then apply the exact
    predicate.  Pairs are emitted time-ordered (``t_a <= t_b``, id
    tiebreak): the later row of a qualifying pair is at most one bucket
    after the earlier one, so the earlier-as-left explode provably covers
    every pair (an id-ordered filter would miss pairs whose earlier row
    has the larger id).  No dedup pass is needed: the right row carries
    exactly one bucket value, which matches at most one of the left row's
    two (distinct) exploded buckets — every qualifying pair joins exactly
    once.
    """
    if max_gap_s <= 0:
        raise ValueError("max_gap_s must be positive")
    gap_us = max_gap_s * 1_000_000
    bucket = F.floor(F.unix_micros(F.col(time_col)) / F.lit(gap_us)).cast("long")
    left = events.select(
        F.col(key),
        F.col(id_col).alias("id_a"),
        F.col(time_col).alias("t_a"),
        F.explode(F.array(bucket, bucket + 1)).alias("__bucket"),
    )
    right = events.select(
        F.col(key),
        F.col(id_col).alias("id_b"),
        F.col(time_col).alias("t_b"),
        bucket.alias("__bucket"),
    )
    earlier = (F.col("t_a") < F.col("t_b")) | (
        (F.col("t_a") == F.col("t_b")) & (F.col("id_a") < F.col("id_b"))
    )
    return (
        left.join(right, [key, "__bucket"])
        .filter(
            earlier
            & (F.unix_micros("t_b") - F.unix_micros("t_a") <= gap_us)
        )
        .select(key, "id_a", "id_b", "t_a", "t_b")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    time_col: str,
    right_value_cols: list[str],
    suffix: str = "_asof",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Backward-inclusive as-of join; unmatched left rows keep NULLs.

    The right payload forward-fills as ONE struct, not per column: the
    struct of a matched row is non-null even when its fields are NULL, so
    a right row carrying a legitimate NULL value is still "the match"
    (DuckDB ASOF semantics) instead of being skipped by ignorenulls in
    favor of an older row.

    ``tolerance_seconds`` bounds match staleness (pandas
    ``merge_asof(tolerance=...)``): a right row older than the bound
    yields NULLs, same as no match.  The right row's own timestamp rides
    inside the payload struct, so the bound is checked after the fill —
    still one shuffle, no join explosion.
    """
    rtypes = dict(right.dtypes)
    fields = [f"{c}:{rtypes[c]}" for c in right_value_cols]
    if tolerance_seconds is not None:
        fields.append(f"__rt:{rtypes[time_col]}")
    payload_ddl = "struct<" + ",".join(fields) + ">"
    marked_left = left.withColumn("__side", F.lit(1)).withColumn(
        "__payload", F.lit(None).cast(payload_ddl)
    )
    payload_fields = [F.col(c) for c in right_value_cols]
    if tolerance_seconds is not None:
        payload_fields.append(F.col(time_col).alias("__rt"))
    marked_right = right.select(
        key,
        time_col,
        F.struct(*payload_fields).alias("__payload"),
    ).withColumn("__side", F.lit(0))
    ltypes = dict(left.dtypes)
    for c in left.columns:
        if c not in (key, time_col):
            marked_right = marked_right.withColumn(c, F.lit(None).cast(ltypes[c]))

    unioned = marked_left.unionByName(marked_right)
    # right rows (side 0) sort before left rows at equal timestamps ->
    # an exact-time right row is visible to the left row (inclusive <=)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(time_col), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.withColumn(
        "__payload", F.last("__payload", ignorenulls=True).over(w)
    )
    out = filled.filter(F.col("__side") == 1)
    if tolerance_seconds is not None:
        stale = (
            F.unix_micros(F.col(time_col)) - F.unix_micros(F.col("__payload")["__rt"])
        ) > round(tolerance_seconds * 1_000_000)  # round, not int: FP
        # truncation (0.3 * 1e6 = 299999.99...) made an exactly-at-
        # tolerance match stale, violating merge_asof's INCLUSIVE bound
        out = out.withColumn(
            "__payload", F.when(stale, F.lit(None)).otherwise(F.col("__payload"))
        )
    for c in right_value_cols:
        out = out.withColumn(f"{c}{suffix}", F.col("__payload")[c])
    return out.drop("__side", "__payload")
