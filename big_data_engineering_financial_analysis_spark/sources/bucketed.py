"""Bucketed table layout — shuffle-free co-located joins.

At 100 TB the orders ⋈ lineitem shuffle is the single most expensive stage
of the analytical suite (both sides are facts; neither broadcasts).
Bucketing both tables by the join key at write time puts matching keys in
matching bucket files, so Catalyst plans a SortMergeJoin with NO Exchange
on either side — the shuffle is paid once at ingest instead of per query.

``tests/test_bucketed.py`` proves the property by asserting the physical
plan of a bucketed join contains zero Exchange operators.

Bucketed tables must go through the session catalog (``saveAsTable`` —
bucket metadata lives in the metastore, plain ``.parquet()`` ignores
``bucketBy``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort: bool = True,
) -> None:
    """Write a catalog table bucketed (and optionally sorted) by the key."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table)


def bucketed_join(spark: SparkSession, left: str, right: str, on: str) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key."""
    return spark.table(left).join(spark.table(right), on)
