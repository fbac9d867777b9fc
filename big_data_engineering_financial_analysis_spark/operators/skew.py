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

from pyspark.sql import Column, DataFrame, Window
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


def salted_topk_per_group(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    k: int,
    tiebreak_col: str,
    n_salts: int = DEFAULT_SALTS,
    descending: bool = True,
) -> DataFrame:
    """Skew-safe top-k per group: two window phases instead of one.

    The naive ``row_number() over (partition by key)`` sorts EVERY row of
    a hot key on one reducer.  Phase 1 partitions by (key, salt) and keeps
    each shard's local top-k — correct because a group-global top-k row is
    necessarily in its shard's top-k (rank only improves when rows are
    removed).  Phase 2 ranks the surviving ``n_salts * k`` rows per key —
    reducer input is bounded by salts x k regardless of group size.

    Deterministic: the salt hashes ``tiebreak_col`` (a unique id), and
    both phases order by (order_col, tiebreak) — so output is identical to
    the naive plan row-for-row, which the registry asserts by pairing the
    salted query with the naive oracle.
    """
    oc = F.col(order_col)
    order = [oc.desc() if descending else oc.asc(), F.col(tiebreak_col).asc()]
    salt = (hash64(F.col(tiebreak_col).cast("string")) % n_salts).alias("_salt")

    w1 = Window.partitionBy(*keys, "_salt").orderBy(*order)
    local = (
        df.withColumn("_salt", salt)
        .withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
    w2 = Window.partitionBy(*keys).orderBy(*order)
    return (
        local.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= k)
        .drop("_salt")
    )
