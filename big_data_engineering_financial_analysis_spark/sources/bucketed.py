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
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort: bool = True,
    extra_cols: list[str] | None = None,
) -> None:
    """Write a catalog table bucketed (and optionally sorted) by the key.

    ``extra_cols`` extends the bucket spec to a composite key — a join on
    ``(a, b)`` only elides the bucketed side's Exchange when the table is
    bucketed on EXACTLY that column set (bucketing on a prefix is not
    enough: the planner disables the bucketed scan)."""
    cols = [bucket_col, *(extra_cols or [])]
    w = df.write.mode("overwrite").bucketBy(n_buckets, *cols)
    if sort:
        w = w.sortBy(*cols)
    w.saveAsTable(table)


def bucketed_join(spark: SparkSession, left: str, right: str, on: str) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key."""
    return spark.table(left).join(spark.table(right), on)


def write_symbol_store(
    df: DataFrame,
    table: str = "enriched_store",
    symbol_col: str = "stock_symbol",
    time_col: str = "local_time",
    n_buckets: int = 16,
) -> None:
    """Per-symbol bucketed + time-sorted store for the enrichment/serving path.

    The reference re-sorts per symbol on every query (QuestDB holds the
    enriched table; consumer re-reads it ordered).  Here the symbol shuffle
    and the (symbol, time) sort are paid ONCE at ingest:

    * ``repartition(n_buckets, symbol)`` uses the same murmur3 ``pmod``
      assignment as ``bucketBy``, so every bucket's rows sit in exactly one
      task -> exactly ONE file per bucket.  That makes the stored sort
      usable at read time (Spark ignores multi-file-per-bucket sorts).
    * downstream ``Window.partitionBy(symbol).orderBy(time)`` (the whole
      indicator family) and ``groupBy(symbol)`` (the serving summaries)
      then plan with ZERO Exchange — and zero Sort when read through
      :func:`read_symbol_store`.

    At 100 TB this turns every serving query from scan+shuffle+sort into a
    pruned scan: the per-query cost is the bucket files of the symbols the
    predicate selects.
    """
    (
        df.repartition(n_buckets, F.col(symbol_col))
        .write.mode("overwrite")
        .bucketBy(n_buckets, symbol_col)
        .sortBy(symbol_col, time_col)
        .saveAsTable(table)
    )


def read_symbol_store(
    spark: SparkSession, table: str = "enriched_store", use_stored_sort: bool = True
) -> DataFrame:
    """Read a :func:`write_symbol_store` table for shuffle-free windows.

    ``use_stored_sort`` flips ``spark.sql.legacy.bucketedTableScan.
    outputOrdering`` so the scan advertises the stored (symbol, time) order
    and WindowExec's Sort is elided too.  Safe here because the writer
    guarantees one file per bucket — the reason the conf was defaulted off
    (slow multi-file sorted reads, SPARK-28158) cannot occur.
    """
    if use_stored_sort:
        spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    return spark.table(table)
