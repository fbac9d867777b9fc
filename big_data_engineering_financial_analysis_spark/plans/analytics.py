"""Analytical join/aggregate queries over the star-schema test tables.

The reference's serving layer never joins (SURVEY §2.4 — QuestDB single-table
scans only), but a complete engine must, so this module carries the join /
grouped-aggregate / top-k query shapes, written so Catalyst gets the plans
right at 100 TB:

* dimension tables (region/nation/customer/supplier/part) are broadcast —
  they stay small relative to facts at every scale factor, so no shuffle of
  the fact side for the dim joins;
* fact-fact joins (orders ⋈ lineitem) shuffle on the join key once; AQE
  handles skew and coalesces post-shuffle partitions;
* top-k uses ``orderBy().limit(k)`` which Spark plans as
  TakeOrderedAndProject — per-partition heaps, no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pricing_summary(lineitem: DataFrame, cutoff: str = "1998-09-02") -> DataFrame:
    """TPC-H Q1 shape: scan-heavy grouped aggregation with 8 aggregates.

    Sums are rounded on output (both here and in the oracle) because
    floating-point partial-aggregation order is engine-specific.
    """
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit(cutoff))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def pricing_rollup(lineitem: DataFrame, cutoff: str = "1998-09-02") -> DataFrame:
    """ROLLUP variant of Q1 — subtotal + grand-total rows (free in Spark;
    the reference has no grouping-sets support at all)."""
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit(cutoff))
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def shipping_priority(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    date: str = "1997-06-01",
    k: int = 10,
) -> DataFrame:
    """TPC-H Q3 shape: dim filter + fact-fact join + grouped top-k.

    ``customer`` is fact-scale in TPC-H (1.5M rows/SF), so no explicit
    broadcast hint: the optimizer broadcasts the filtered segment while it
    fits ``autoBroadcastJoinThreshold`` and AQE falls back to a shuffle on
    ``o_custkey`` beyond that — a forced hint would OOM executors at scale.
    orders ⋈ lineitem shuffles on orderkey once.  Deterministic top-k via
    (revenue desc, orderkey) ordering.
    """
    cust = customer.filter(F.col("c_mktsegment") == segment).select("c_custkey")
    ord_f = orders.filter(F.col("o_orderdate") < F.lit(date)).select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    li = lineitem.filter(F.col("l_shipdate") > F.lit(date)).select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    revenue = F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
    return (
        li.join(ord_f.join(cust, ord_f.o_custkey == cust.c_custkey), li.l_orderkey == ord_f.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(revenue.alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(k)
    )


def local_supplier_volume(
    tables: dict[str, DataFrame],
    region: str = "ASIA",
    start: str = "1996-01-01",
    end: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q5 shape: 6-table join, true dims broadcast, facts shuffled once.

    customer ⋈ supplier on nationkey enforces the "local supplier" rule.
    region/nation are genuinely small (5/25 rows) -> explicit broadcast;
    ``supplier`` (10k rows/SF — ~1e9 at 100 TB, still GB-sized after the
    region cut) and ``customer`` (150k rows/SF) are SF-scaled, so they
    carry no hint — the optimizer broadcasts them while small and AQE
    shuffles at scale instead of OOMing executors.
    """
    r = tables["region"].filter(F.col("r_name") == region)
    n = tables["nation"].join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
    s = tables["supplier"].join(
        F.broadcast(n.select("n_nationkey", "n_name")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    )
    c = tables["customer"].select("c_custkey", "c_nationkey")
    o = tables["orders"].filter(
        (F.col("o_orderdate") >= F.lit(start)) & (F.col("o_orderdate") < F.lit(end))
    ).select("o_orderkey", "o_custkey")
    li = tables["lineitem"].select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s.select("s_suppkey", "s_nationkey", "n_name"), li.l_suppkey == F.col("s_suppkey"))
        .join(c, (F.col("o_custkey") == c.c_custkey) & (F.col("c_nationkey") == F.col("s_nationkey")))
    )
    return joined.groupBy("n_name").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
    )


def top_orders(orders: DataFrame, k: int = 10) -> DataFrame:
    """O3 top-k: TakeOrderedAndProject, deterministic tiebreak on key."""
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(k)
    )


def event_type_stats(events: DataFrame) -> DataFrame:
    """Grouped multi-aggregate over the events stream table."""
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.round(F.avg("value"), 6).alias("avg_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


def events_union(events: DataFrame) -> DataFrame:
    """U1 union/append shape: two filtered subsets tagged and unioned."""
    a = events.filter(F.col("event_type") == "purchase").withColumn("src", F.lit("purchase"))
    b = events.filter((F.col("event_type") == "error") & (F.col("value") > 100)).withColumn(
        "src", F.lit("error_hi")
    )
    return a.unionByName(b).select("event_id", "ts", "user_id", "event_type", "value", "src")
