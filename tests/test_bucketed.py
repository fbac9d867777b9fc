"""Bucketed-layout proof: same-bucketed fact-fact join plans with NO
shuffle (the at-ingest shuffle replaces the per-query one)."""

from __future__ import annotations

import pytest

from big_data_engineering_financial_analysis_spark.sources import bucketed
from big_data_engineering_financial_analysis_spark.sources.parquet import load_table


@pytest.fixture(scope="module")
def bucket_tables(spark):
    # spark.sql.warehouse.dir is a static conf — bucketed tables land in
    # the default warehouse (./spark-warehouse, gitignored); drop + clean up
    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    lineitem = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    bucketed.write_bucketed(orders.withColumnRenamed("o_orderkey", "okey"), "orders_b", "okey")
    bucketed.write_bucketed(lineitem.withColumnRenamed("l_orderkey", "okey"), "lineitem_b", "okey")
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    import shutil

    shutil.rmtree("spark-warehouse", ignore_errors=True)


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, bucket_tables):
    left, right = bucket_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        joined = bucketed.bucketed_join(spark, left, right, "okey")
        plan = _physical_plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        # and it computes the right thing
        expected = (
            load_table(spark, "/root/testdata/sf0.001", "lineitem").count()
        )
        assert joined.count() == expected  # every lineitem has its order
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))


def test_unbucketed_join_does_shuffle(spark):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = load_table(spark, "/root/testdata/sf0.001", "orders")
        li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
        plan = _physical_plan(o.join(li, o.o_orderkey == li.l_orderkey))
        assert "Exchange" in plan  # the baseline the bucketing removes
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))


@pytest.fixture(scope="module")
def symbol_store(spark):
    from pyspark.sql import functions as F

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    candles = ev.select(
        F.col("event_id"),
        F.col("user_id").cast("string").alias("stock_symbol"),
        F.col("ts").alias("local_time"),
        F.col("value").alias("close"),
    )
    bucketed.write_symbol_store(candles, "candles_store", n_buckets=8)
    yield "candles_store", candles
    spark.sql("DROP TABLE IF EXISTS candles_store")
    spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
    import shutil

    shutil.rmtree("spark-warehouse", ignore_errors=True)


def test_symbol_store_window_plan_no_exchange_no_sort(spark, symbol_store):
    from big_data_engineering_financial_analysis_spark.functions.indicators import with_indicators

    table, _ = symbol_store
    enriched = with_indicators(bucketed.read_symbol_store(spark, table))
    plan = _physical_plan(enriched)
    assert "Exchange" not in plan, f"symbol store window still shuffles:\n{plan}"
    assert "Sort" not in plan, f"stored (symbol, time) sort not reused:\n{plan}"


def test_symbol_store_grouped_agg_no_exchange(spark, symbol_store):
    from pyspark.sql import functions as F

    table, _ = symbol_store
    agg = (
        bucketed.read_symbol_store(spark, table)
        .groupBy("stock_symbol")
        .agg(F.avg("close").alias("avg_close"))
    )
    assert "Exchange" not in _physical_plan(agg)


def test_symbol_store_matches_plain_enrichment(spark, symbol_store):
    from big_data_engineering_financial_analysis_spark.functions.indicators import with_indicators

    table, candles = symbol_store
    got = (
        with_indicators(bucketed.read_symbol_store(spark, table))
        .orderBy("event_id")
        .collect()
    )
    want = with_indicators(candles).orderBy("event_id").collect()
    assert got == want


def test_symbol_store_one_file_per_bucket(spark, symbol_store):
    table, _ = symbol_store
    files = spark.table(table).inputFiles()
    # repartition(n_buckets, symbol) => at most 1 file per bucket (a bucket
    # with no symbols hashing to it writes no file at all)
    bucket_ids = [f.rsplit("_", 1)[1].split(".")[0] for f in files]
    assert len(bucket_ids) == len(set(bucket_ids)) and len(files) <= 8


def test_incremental_dedup_store_join_no_store_side_shuffle(spark):
    """The incremental_minhash_dedup docstring's scale claim, proven on a
    plan: with the signature store persisted BANDED and bucketed on
    (band, band_key), the per-batch candidate join reads store buckets
    with NO store-side Exchange — only the (micro-batch-sized) probe
    side shuffles."""
    from big_data_engineering_financial_analysis_spark.operators import dedup

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    store_banded = dedup.band_signatures(
        dedup.minhash_signatures(docs.filter("doc_id % 2 = 0"))
    )
    bucketed.write_bucketed(
        # composite bucket spec: BOTH join keys — a band-only prefix would
        # make the planner disable the bucketed scan and re-shuffle the store
        store_banded.repartition(8, "band", "band_key"),
        "sig_store_banded",
        "band",
        n_buckets=8,
        sort=True,
        extra_cols=["band_key"],
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        batch_banded = dedup.band_signatures(
            dedup.minhash_signatures(docs.filter("doc_id % 2 = 1"))
        ).withColumnRenamed("doc_id", "new_id")
        store = spark.table("sig_store_banded").withColumnRenamed(
            "doc_id", "store_id"
        )
        joined = batch_banded.join(store, ["band", "band_key"])
        plan = _physical_plan(joined)
        # exactly the probe side shuffles; the store-side FileScan is a
        # bucketed scan with no Exchange between it and the join
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        scan_side = [
            ln for ln in plan.splitlines() if "sig_store_banded" in ln
        ]
        assert scan_side, plan
        # count Exchanges: the probe side needs one; a second would mean
        # the store is being re-shuffled per batch
        n_exchanges = plan.count("Exchange hashpartitioning")
        assert n_exchanges == 1, f"store side shuffled:\n{plan}"
        assert joined.count() > 0
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS sig_store_banded")
