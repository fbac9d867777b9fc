"""Skew-mitigation operators.

At 100 TB a handful of hot keys (one viral symbol, one dominant document
source) can stall a stage: every row of the hot key lands on one reducer.
Two standard mitigations, both expressed so results are provably identical
to the naive plan (the registry pairs the salted aggregate with the same
oracle as the plain one):

* **salted two-phase aggregation** — append a random-ish salt to the key,
  partially aggregate (key, salt), then aggregate the partials.  The salt
  here is deterministic (md5 of a row id) so runs are reproducible and
  oracle-checkable; at runtime a ``rand()``-based salt works identically.
* **AQE skew-join splitting** is already enabled session-wide
  (``spark.sql.adaptive.skewJoin.enabled``) — preferred for joins; salting
  is for aggregations and for engines/stages AQE cannot re-plan.

Only aggregates that decompose over a partition of the rows can be salted
this way (sum/count/min/max — and avg via sum+count); medians etc. need
sketches instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from big_data_engineering_financial_analysis_spark.functions.hashing import hash64

DEFAULT_SALTS = 8


def salted_agg(
    df: DataFrame,
    key: str,
    salt_source: str,
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Two-phase skew-safe count/sum/avg of ``value`` grouped by ``key``.

    Phase 1 shuffles on (key, salt) — the hot key spreads over ``n_salts``
    reducers; phase 2 shuffles the tiny partials on key alone.  ``avg`` is
    recomposed as total_sum / total_count (decomposable), never averaged
    across partials.
    """
    salt = (hash64(F.col(salt_source).cast("string")) % n_salts).alias("_salt")
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum("value").alias("_sum"),
            F.min("value").alias("_min"),
            F.max("value").alias("_max"),
        )
    )
    return partial.groupBy(key).agg(
        F.sum("_n").alias("n"),
        F.round(F.sum("_sum"), 2).alias("sum_value"),
        F.round(F.sum("_sum") / F.sum("_n"), 6).alias("avg_value"),
        F.min("_min").alias("min_value"),
        F.max("_max").alias("max_value"),
    )
