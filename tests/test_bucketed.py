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
