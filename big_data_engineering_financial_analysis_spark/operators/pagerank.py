"""Weighted PageRank with a deterministic, oracle-mirrorable iteration.

PageRank (Page et al. 1999) as the engine's representative *iterative*
graph algorithm.  The design splits the work the way a 100 TB run
must:

1. **Edge aggregation** — the scalable part.  Edges are distilled from
   fact tables by plain joins + one grouped count; at scale this is the
   usual co-partitioned fact shuffle and produces a graph whose size is
   bounded by |nodes|², independent of fact row count.
2. **Rank iteration** — runs on the aggregated graph.  Each of the
   fixed ``iters`` steps is one tiny join + grouped fold; the graph
   stays a DataFrame throughout (no driver collect).

Floating-point determinism: a grouped ``sum`` of doubles is
order-dependent, which would make the result flap run-to-run and
engine-to-engine.  Every per-node accumulation here instead folds the
incoming contributions **in source-node order** via
``aggregate(array_sort(collect_list(struct(src, c))))`` — the same sum
DuckDB computes with ``list_reduce(list(c ORDER BY src))`` — so ranks
are bit-identical across engines and runs.  Out-weights are integer
sums (exact).

Dangling nodes (no out-edges) leak mass — the standard simplification;
ranks then sum to < 1 but remain a fixed point of the documented
recurrence ``pr(v) = (1-d)/N + d * Σ_u pr(u) * w(u,v) / outw(u)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: weighted_pagerank switches to its driver-side iteration regime when
#: the graph is declared tiny (``n_nodes`` at or under this).  Same
#: contract as the dedup connected-components TINY_GRAPH_EDGES fast
#: path: the aggregated graph is bounded by n_nodes² edge rows — a
#: model-sized collect (≤ 65k rows at the default) — and each of the
#: ``iters`` driver iterations replaces one join + grouped-fold Spark
#: job whose data is a handful of rows but whose fixed cost is 2-3
#: stage round-trips.  Above the bound the distributed loop runs
#: unchanged.
TINY_PR_NODES = 256


def _driver_pagerank(
    spark, edge_rows, node_rows, node_field, n_nodes: int, iters: int, damping: float
) -> DataFrame:
    """Driver-side twin of the distributed iteration — the IDENTICAL
    floating-point program (Python floats are IEEE doubles; the per-node
    fold adds contributions in ascending src order exactly like
    ``aggregate(array_sort(collect_list(struct(src, c))))``), so ranks
    are bit-equal to the distributed path's — pinned by
    tests/test_pagerank.py."""
    nodes = [r[0] for r in node_rows]
    edges = [(r["src"], r["dst"], r["w"], r["outw"]) for r in edge_rows]
    # fold order: ascending (src, w) — the distributed fold sorts
    # struct(src, c) and c = pr(src)*w/outw is strictly monotone in w
    # for fixed src (pr, outw are per-src constants and pr > 0), so this
    # reproduces its within-src order even on MULTIGRAPH inputs with
    # duplicate (src, dst) rows, where a src-only sort left the tie
    # order to the nondeterministic collect order (advice r12).  Equal w
    # ties contribute equal doubles, so their mutual order cannot change
    # the sum.
    edges.sort(key=lambda e: (e[0], e[2]))
    pr = {v: 1.0 / n_nodes for v in nodes}
    teleport = (1.0 - damping) / n_nodes
    for _ in range(iters):
        inc: dict = {}
        for src, dst, w, outw in edges:  # already src-ascending
            p = pr.get(src)
            if p is None:
                continue
            inc[dst] = inc.get(dst, 0.0) + (p * w / outw)
        pr = {v: teleport + damping * inc.get(v, 0.0) for v in nodes}
    schema = T.StructType([node_field, T.StructField("pr", T.DoubleType())])
    return spark.createDataFrame([(v, pr[v]) for v in nodes], schema)


def weighted_pagerank(
    edges: DataFrame,
    nodes: DataFrame,
    n_nodes: int,
    iters: int = 5,
    damping: float = 0.85,
    truncate_lineage: bool = True,
    driver_node_limit: int | None = TINY_PR_NODES,
) -> DataFrame:
    """``edges``: (src, dst, w) with integer weights; ``nodes``: (node);
    returns (node, pr) after ``iters`` synchronous iterations from the
    uniform start 1/``n_nodes``.

    Lineage hygiene (``truncate_lineage``, on by default): without
    truncation the returned frame's plan nests the whole edge-aggregation
    subtree plus two joins PER iteration — O(iters) logical shuffles that
    bloat planning, break AQE reuse, and pressure the driver at high
    iteration counts (round-6 plan audit read 30 logical shuffles for 5
    iterations).  With it, the aggregated graph and each iteration's rank
    frame are materialized via eager ``localCheckpoint`` — per-iteration
    EXECUTED work is unchanged (one join + one grouped fold over a
    |nodes|-sized frame), but the final plan stays iteration-sized at any
    ``iters``.  Values are bit-identical either way (checkpointing never
    reorders the in-src-order fold).  Pass ``False`` to keep the pure
    lazy form (e.g. to compose into a larger unexecuted plan).
    """
    outw = edges.groupBy("src").agg(F.sum("w").alias("outw"))
    e = edges.join(outw, "src")
    if driver_node_limit is not None and n_nodes <= driver_node_limit:
        # Driver fast path (r12 optimization round): the scalable work is
        # the edge aggregation feeding ``edges``; one collect of the
        # ≤ n_nodes²-row graph (+ the node list) replaces 1 + iters
        # checkpoint jobs.  Out-weights are integer sums — exact under
        # any aggregation order — so collecting AFTER the outw join keeps
        # every FP input identical to the distributed loop's.
        return _driver_pagerank(
            edges.sparkSession,
            e.collect(),
            nodes.collect(),
            nodes.schema.fields[0],
            n_nodes,
            iters,
            damping,
        )
    if truncate_lineage:
        # the graph feeds every iteration: materialize the (≤ |nodes|²
        # row) aggregate once instead of replaying the fact-scale edge
        # aggregation in every iteration's lineage
        e = e.localCheckpoint(eager=True)
        nodes = nodes.localCheckpoint(eager=True)
    pr = nodes.withColumn("pr", F.lit(1.0 / n_nodes))
    teleport = F.lit((1.0 - damping) / n_nodes)
    for _ in range(iters):
        contribs = e.join(pr, e["src"] == pr["node"]).select(
            "dst", "src", (F.col("pr") * F.col("w") / F.col("outw")).alias("c")
        )
        inc = contribs.groupBy("dst").agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("src", "c"))),
                F.lit(0.0),
                lambda acc, x: acc + x["c"],
            ).alias("inc")
        )
        pr = nodes.join(inc, nodes["node"] == inc["dst"], "left").select(
            "node",
            (teleport + F.lit(damping) * F.coalesce(F.col("inc"), F.lit(0.0))).alias(
                "pr"
            ),
        )
        if truncate_lineage:
            # rank frames are |nodes| rows; checkpointing each keeps the
            # NEXT iteration's plan constant-sized regardless of depth
            pr = pr.localCheckpoint(eager=True)
    return pr


def pagerank_oracle_sql(
    edges_cte: str,
    nodes_cte: str,
    n_nodes: int,
    iters: int = 5,
    damping: float = 0.85,
    final_select: str = "SELECT node, round(pr, 6) AS pr FROM pr{last}",
) -> str:
    """Unroll the identical iteration as DuckDB CTEs.  ``edges_cte``
    must define ``e(src, dst, w)``; ``nodes_cte`` must define
    ``nodes(node, ...)``.  The per-node fold sums contributions in
    ``src`` order via ``list_reduce(list(c ORDER BY src))`` — the same
    FP addition sequence as the Spark fold (a 0.0 seed adds exactly)."""
    parts = [
        edges_cte.rstrip().rstrip(","),
        nodes_cte.rstrip().rstrip(","),
        "ew AS (SELECT e.*, sum(w) OVER (PARTITION BY src) AS outw FROM e)",
        f"pr0 AS (SELECT node, CAST(1.0 AS DOUBLE) / {n_nodes} AS pr FROM nodes)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""pr{i} AS (
  SELECT n.node,
         CAST({1.0 - damping!r} AS DOUBLE) / {n_nodes}
           + CAST({damping!r} AS DOUBLE) * coalesce(s.inc, CAST(0.0 AS DOUBLE)) AS pr
  FROM nodes n LEFT JOIN (
    SELECT dst, list_reduce(list(c ORDER BY src), (a, b) -> a + b) AS inc
    FROM (SELECT ew.dst, ew.src, p.pr * ew.w / ew.outw AS c
          FROM ew JOIN pr{i - 1} p ON ew.src = p.node)
    GROUP BY dst
  ) s ON n.node = s.dst
)"""
        )
    return "WITH " + ",\n".join(parts) + "\n" + final_select.format(last=iters)
