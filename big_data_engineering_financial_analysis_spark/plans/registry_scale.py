"""Registry: scale-technique queries + DuckDB oracles.

Operators whose *point* is the 100 TB plan shape, registered with
exact-result formulations so the driver's oracle gate still applies:

* ``kmv_distinct``      — K-Minimum-Values distinct sketch (portable
                          md5 hash ⇒ the sketch itself is deterministic
                          and engine-independent).
* ``bloom_prune_join``  — Bloom-pruned semijoin; no false negatives ⇒
                          result equals the plain semijoin the oracle
                          runs.
* ``zorder_index``      — Morton-key clustering audit; the key is pure
                          integer arithmetic both engines compute
                          identically.

Reference parity: none of these exist in the reference (its distinct
counts and joins are raw QuestDB SQL, services/serving/app/views.py) —
they are the extension family a 100 TB corpus needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_engineering_financial_analysis_spark.operators.layout import (
    DIM_MASK,
    zorder_stats,
    zvalue_sql,
)
from big_data_engineering_financial_analysis_spark.operators.sketch import (
    bloom_semi_join,
    kmv_distinct,
)
from big_data_engineering_financial_analysis_spark.sources.parquet import load_table

KMV_K = 64
BLOOM_SEGMENT = "BUILDING"
ZORDER_EPOCH = "1995-01-01"
ZORDER_BUCKET_SHIFT = 18


def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct customers per order priority, estimated with a KMV
    sketch: bounded map-side state (≤ k hashes per batch per group), no
    full-distinct shuffle of the fact table."""
    orders = load_table(spark, sf_dir, "orders")
    return kmv_distinct(orders, "o_custkey", "o_orderpriority", k=KMV_K)


def q_bloom_prune_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly order volume for one market segment, with the fact scan
    pre-pruned by a broadcast Bloom bitmap built from the segment's
    customer keys.  Result is exactly the plain semijoin (no false
    negatives); the Bloom bounds what reaches the residual join."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == BLOOM_SEGMENT
    )
    hits = bloom_semi_join(orders, cust, "o_custkey", "c_custkey")
    return hits.groupBy(
        F.date_trunc("month", "o_orderdate").alias("month")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
    )


def q_zorder_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustering audit for a Z-order layout of orders on
    (customer key, order day): per Z-bucket row count and min/max
    envelope of BOTH dimensions — the per-file statistics a
    range-partitioned writer would expose for two-sided file skipping."""
    orders = load_table(spark, sf_dir, "orders")
    d = orders.select(
        "o_custkey",
        F.datediff(F.col("o_orderdate"), F.lit(ZORDER_EPOCH).cast("date")).alias(
            "dayno"
        ),
    )
    return zorder_stats(
        d, "o_custkey", "dayno", bucket_shift=ZORDER_BUCKET_SHIFT
    )


QUERIES = {
    "kmv_distinct": q_kmv_distinct,
    "bloom_prune_join": q_bloom_prune_join,
    "zorder_index": q_zorder_index,
}

_Z_SQL = zvalue_sql("x", "y")

ORACLES = {
    "kmv_distinct": f"""
WITH h AS (
  SELECT DISTINCT o_orderpriority,
    ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 12))::BIGINT AS h
  FROM orders
),
rk AS (
  SELECT o_orderpriority, h,
         row_number() OVER (PARTITION BY o_orderpriority ORDER BY h) AS rn
  FROM h
),
agg AS (
  SELECT o_orderpriority, count(*) AS k_used, max(h) AS kth_hash
  FROM rk WHERE rn <= {KMV_K} GROUP BY o_orderpriority
)
SELECT o_orderpriority, k_used, kth_hash,
  round(CASE WHEN k_used >= {KMV_K}
    THEN CAST(k_used - 1 AS DOUBLE) * 281474976710656.0 / kth_hash
    ELSE CAST(k_used AS DOUBLE) END, 4) AS est_distinct
FROM agg
""",
    "bloom_prune_join": f"""
SELECT date_trunc('month', o_orderdate) AS month,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS revenue
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer
                    WHERE c_mktsegment = '{BLOOM_SEGMENT}')
GROUP BY 1
""",
    "zorder_index": f"""
WITH d AS (
  SELECT (o_custkey & {DIM_MASK}) AS x,
         (date_diff('day', DATE '{ZORDER_EPOCH}', o_orderdate)
          & {DIM_MASK}) AS y
  FROM orders
),
z AS (SELECT x, y, {_Z_SQL} >> {ZORDER_BUCKET_SHIFT} AS zbucket FROM d)
SELECT zbucket, count(*) AS n_rows,
       min(x) AS x_min, max(x) AS x_max,
       min(y) AS y_min, max(y) AS y_max
FROM z GROUP BY zbucket
""",
}


# ---------------------------------------------------------------------------
# iterative graph: nation-to-nation trade PageRank
# ---------------------------------------------------------------------------

from big_data_engineering_financial_analysis_spark.operators.pagerank import (  # noqa: E402
    pagerank_oracle_sql,
    weighted_pagerank,
)

PR_ITERS = 5
PR_DAMPING = 0.85
N_NATIONS = 25


def q_nation_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the customer-nation → supplier-nation trade graph.

    Edge aggregation is the scalable part (lineitem⋈orders⋈customer⋈
    supplier, one grouped count — the same fact-shuffle shape as the
    TPC-H joins); the 25-node iteration then runs on the aggregate.
    Per-node accumulation folds contributions in source order, so ranks
    are bit-identical to the oracle's unrolled CTE iteration."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    edges = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, F.col("o_custkey") == c["c_custkey"])
        # supplier is SF-scaled — no hint; planner broadcasts while small
        .join(s, F.col("l_suppkey") == s["s_suppkey"])
        .groupBy(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    nation = load_table(spark, sf_dir, "nation")
    nodes = nation.select(F.col("n_nationkey").alias("node"))
    pr = weighted_pagerank(
        edges, nodes, N_NATIONS, iters=PR_ITERS, damping=PR_DAMPING
    )
    return (
        pr.join(
            F.broadcast(nation),
            pr["node"] == nation["n_nationkey"],
        )
        .select("node", "n_name", F.round("pr", 6).alias("pr"))
    )


QUERIES["nation_pagerank"] = q_nation_pagerank

ORACLES["nation_pagerank"] = pagerank_oracle_sql(
    edges_cte="""e AS (
  SELECT c.c_nationkey AS src, s.s_nationkey AS dst, count(*) AS w
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY 1, 2
)""",
    nodes_cte="nodes AS (SELECT n_nationkey AS node, n_name FROM nation)",
    n_nodes=N_NATIONS,
    iters=PR_ITERS,
    damping=PR_DAMPING,
    final_select=(
        "SELECT nodes.node, nodes.n_name, round(pr{last}.pr, 6) AS pr\n"
        "FROM pr{last} JOIN nodes ON pr{last}.node = nodes.node"
    ),
)


# ---------------------------------------------------------------------------
# Count-Min heavy hitters + triangle counting
# ---------------------------------------------------------------------------

from big_data_engineering_financial_analysis_spark.operators.graph import (  # noqa: E402
    triangle_participation,
)
from big_data_engineering_financial_analysis_spark.operators.sketch import (  # noqa: E402
    CM_DEPTH,
    CM_WIDTH,
    countmin_build,
    countmin_estimate,
)

#: Shared trade-graph edge aggregation (same joins as nation_pagerank).
_TRADE_EDGES_CTE = """e AS (
  SELECT c.c_nationkey AS src, s.s_nationkey AS dst, count(*) AS w
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY 1, 2
)"""


def _trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, F.col("o_custkey") == c["c_custkey"])
        # supplier is SF-scaled — no hint; planner broadcasts while small
        .join(s, F.col("l_suppkey") == s["s_suppkey"])
        .groupBy(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )


def q_countmin_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via a Count-Min sketch: the shuffle carries ≤
    depth x width partial counters per map task (3072 cells) instead of
    one partial per key — the bounded-state alternative to a keyed
    count at billion-key cardinality.  Candidates here are the distinct
    keys (group-count-sized); at true scale the candidate set comes
    from sampling or a SpaceSaving pass, the sketch stays identical."""
    ev = load_table(spark, sf_dir, "events")
    sk = countmin_build(ev, "user_id")
    cands = ev.select("user_id").distinct()
    est = countmin_estimate(sk, cands, "user_id")
    return est.orderBy(F.col("est_count").desc(), "user_id").limit(10)


def q_nation_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation triangle participation in the undirected trade graph
    — edge aggregation at fact scale, enumeration on the aggregate with
    the each-triangle-once a<b<c ordering (integer-exact, no FP)."""
    edges = _trade_edges(spark, sf_dir)
    nation = load_table(spark, sf_dir, "nation")
    nodes = nation.select(F.col("n_nationkey").alias("node"))
    out = triangle_participation(edges, nodes)
    return out.join(
        F.broadcast(nation), out["node"] == nation["n_nationkey"]
    ).select("node", "n_name", "n_triangles")


QUERIES["countmin_topk"] = q_countmin_topk
QUERIES["nation_triangles"] = q_nation_triangles

_CM_HASH = (
    "('0x' || substr(md5('cm' || {d} || ':' || CAST({key} AS VARCHAR)), 1, 12))"
    f"::BIGINT % {CM_WIDTH}"
)

ORACLES["countmin_topk"] = f"""
WITH d(d) AS (VALUES {", ".join(f"({i})" for i in range(CM_DEPTH))}),
cells AS (
  SELECT d.d, {_CM_HASH.format(d="d.d", key="user_id")} AS pos
  FROM events CROSS JOIN d
),
grid AS (SELECT d, pos, count(*) AS c FROM cells GROUP BY 1, 2),
cand AS (SELECT DISTINCT user_id FROM events),
est AS (
  SELECT cand.user_id, min(grid.c) AS est_count
  FROM cand CROSS JOIN d
  JOIN grid ON grid.d = d.d
           AND grid.pos = {_CM_HASH.format(d="d.d", key="cand.user_id")}
  GROUP BY cand.user_id
)
SELECT user_id, est_count FROM est
ORDER BY est_count DESC, user_id LIMIT 10
"""

ORACLES["nation_triangles"] = f"""
WITH {_TRADE_EDGES_CTE},
und AS (
  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
  FROM e WHERE least(src, dst) < greatest(src, dst)
),
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM und e1
  JOIN und e2 ON e1.v = e2.u
  JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v
),
m AS (SELECT unnest([a, b, c]) AS node FROM tri),
cnt AS (SELECT node, count(*) AS n_triangles FROM m GROUP BY node)
SELECT n.n_nationkey AS node, n.n_name,
       coalesce(cnt.n_triangles, 0) AS n_triangles
FROM nation n LEFT JOIN cnt ON n.n_nationkey = cnt.node
"""


# ---------------------------------------------------------------------------
# k-fold cross-validation assignment (leakage-safe, zero shuffle)
# ---------------------------------------------------------------------------

from big_data_engineering_financial_analysis_spark.functions.hashing import (  # noqa: E402
    duck_hash64,
)
from big_data_engineering_financial_analysis_spark.operators.sampling import (  # noqa: E402
    kfold_assign,
)

KFOLD_K = 5


def q_kfold_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fold balance audit for a 5-fold CV split of events keyed on
    user_id (entity-coherent: all of a user's rows share a fold — the
    leakage-safe grouping).  Assignment is row-local; the only shuffle
    is the audit's own grouped aggregate."""
    ev = load_table(spark, sf_dir, "events")
    folds = kfold_assign(ev, "user_id", k=KFOLD_K)
    return folds.groupBy("fold").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("user_id").alias("n_users"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


QUERIES["kfold_split"] = q_kfold_split

_KF_HASH = duck_hash64("CAST(user_id AS VARCHAR)", "kfold", nhex=8)

ORACLES["kfold_split"] = f"""
SELECT CAST({_KF_HASH} % {KFOLD_K} AS INT) AS fold,
       count(*) AS n_rows,
       count(DISTINCT user_id) AS n_users,
       round(sum(value), 4) AS sum_value
FROM events
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# histogram sketch quantiles
# ---------------------------------------------------------------------------

from big_data_engineering_financial_analysis_spark.operators.sketch import (  # noqa: E402
    HIST_BINS,
    hist_quantiles,
)

HIST_QS = (0.5, 0.9, 0.99)


def q_hist_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-state percentiles: equi-width histogram counts (≤ 1024
    partial counters per map task) + in-bin linear interpolation — the
    sketch twin of the exact `value_percentiles`, deterministic in any
    engine."""
    ev = load_table(spark, sf_dir, "events")
    return hist_quantiles(ev, "value", "event_type", qs=HIST_QS)


QUERIES["hist_quantiles"] = q_hist_quantiles

_HQ_VALUES = ", ".join(f"(CAST({q!r} AS DOUBLE))" for q in HIST_QS)

ORACLES["hist_quantiles"] = f"""
WITH s AS (SELECT min(value) AS vmin, max(value) AS vmax FROM events),
d AS (
  SELECT event_type AS grp, value AS v, s.vmin, s.vmax,
         CAST(least(floor((value - s.vmin)
                          / ((s.vmax - s.vmin) / {float(HIST_BINS)!r})),
                    {HIST_BINS - 1}) AS INT) AS bin
  FROM events CROSS JOIN s
),
counts AS (
  SELECT grp, bin, count(*) AS c,
         any_value(vmin) AS vmin, any_value(vmax) AS vmax
  FROM d GROUP BY grp, bin
),
cum AS (
  SELECT counts.*,
    sum(c) OVER (PARTITION BY grp ORDER BY bin
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
    sum(c) OVER (PARTITION BY grp) AS n
  FROM counts
),
qq(q) AS (VALUES {_HQ_VALUES}),
pick AS (
  SELECT cum.*, qq.q,
         row_number() OVER (PARTITION BY grp, q ORDER BY bin) AS rn
  FROM cum CROSS JOIN qq
  WHERE cum >= q * n
)
SELECT grp, q, CAST(n AS BIGINT) AS n,
       round(vmin + ((vmax - vmin) / {float(HIST_BINS)!r})
                    * (bin + (q * n - (cum - c)) / c), 6) AS est
FROM pick WHERE rn = 1
"""
