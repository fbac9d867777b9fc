"""Weighted-PageRank semantics on crafted graphs + FP determinism."""

from __future__ import annotations

import pytest

from big_data_engineering_financial_analysis_spark.operators.pagerank import (
    weighted_pagerank,
)


def _graph(spark, edges, nodes):
    e = spark.createDataFrame(edges, "src int, dst int, w long")
    n = spark.createDataFrame([(v,) for v in nodes], "node int")
    return e, n


def _reference(edges, nodes, n_nodes, iters, d=0.85):
    """Independent driver-side model with the same in-src-order fold."""
    outw = {}
    for s, _, w in edges:
        outw[s] = outw.get(s, 0) + w
    pr = {v: 1.0 / n_nodes for v in nodes}
    for _ in range(iters):
        inc = {v: [] for v in nodes}
        for s, t, w in edges:
            inc[t].append((s, pr[s] * w / outw[s]))
        new = {}
        for v in nodes:
            acc = 0.0
            for _, c in sorted(inc[v]):
                acc = acc + c
            new[v] = (1.0 - d) / n_nodes + d * acc
        pr = new
    return pr


def test_ring_stays_uniform(spark):
    """A 1-regular ring is already the stationary distribution: every
    iteration maps 1/N to 1/N exactly."""
    nodes = list(range(5))
    edges = [(i, (i + 1) % 5, 1) for i in nodes]
    e, n = _graph(spark, edges, nodes)
    out = {r["node"]: r["pr"] for r in weighted_pagerank(e, n, 5, iters=4).collect()}
    assert all(v == pytest.approx(0.2, abs=1e-15) for v in out.values())


def test_star_matches_reference_model(spark):
    """Leaves point at a hub that points back; ranks after 3 iterations
    must equal the independent Python model bit-for-bit (same fold
    order)."""
    nodes = list(range(6))
    edges = [(i, 0, 1) for i in range(1, 6)] + [(0, i, 2) for i in range(1, 6)]
    e, n = _graph(spark, edges, nodes)
    got = {r["node"]: r["pr"] for r in weighted_pagerank(e, n, 6, iters=3).collect()}
    want = _reference(edges, nodes, 6, 3)
    assert got == want
    assert got[0] > max(v for k, v in got.items() if k != 0)


def test_weights_steer_rank(spark):
    """Node 1 gets 9x the weight of node 2 from the same source — its
    rank must strictly dominate."""
    nodes = [0, 1, 2]
    edges = [(0, 1, 9), (0, 2, 1), (1, 0, 1), (2, 0, 1)]
    e, n = _graph(spark, edges, nodes)
    out = {r["node"]: r["pr"] for r in weighted_pagerank(e, n, 3, iters=5).collect()}
    assert out[1] > out[2]


def test_dangling_node_leaks_mass(spark):
    """The documented simplification: a sink with no out-edges absorbs
    and leaks — total rank drops below 1 but every rank keeps the
    teleport floor."""
    nodes = [0, 1]
    edges = [(0, 1, 1)]  # 1 is dangling
    e, n = _graph(spark, edges, nodes)
    out = {r["node"]: r["pr"] for r in weighted_pagerank(e, n, 2, iters=4).collect()}
    assert sum(out.values()) < 1.0
    assert all(v >= 0.15 / 2 for v in out.values())


def test_partitioning_does_not_change_ranks(spark):
    """The in-src-order fold makes the per-node sum independent of
    physical layout: 7-partition run == 1-partition run bit-for-bit."""
    nodes = list(range(10))
    edges = [(i, j, (i + j) % 4 + 1) for i in nodes for j in nodes if i != j]
    e, n = _graph(spark, edges, nodes)
    a = sorted(weighted_pagerank(e.repartition(7), n, 10, iters=3).collect())
    b = sorted(weighted_pagerank(e.coalesce(1), n, 10, iters=3).collect())
    assert a == b


def test_truncation_is_value_identical(spark):
    """Lineage truncation is pure plumbing: ranks with and without the
    per-iteration localCheckpoint match bit-for-bit (the fold order is a
    property of the data, not the plan)."""
    nodes = list(range(10))
    edges = [(i, j, (i + j) % 4 + 1) for i in nodes for j in nodes if i != j]
    e, n = _graph(spark, edges, nodes)
    a = sorted(weighted_pagerank(e, n, 10, iters=4, truncate_lineage=True).collect())
    b = sorted(weighted_pagerank(e, n, 10, iters=4, truncate_lineage=False).collect())
    assert a == b


def test_truncation_keeps_plan_iteration_sized(spark):
    """The round-6 plan audit read O(iters) logical shuffles in the
    returned frame's lineage; with truncation the final plan must stay
    CONSTANT-sized as iterations grow (each iteration starts from a
    checkpointed scan, so the plan never nests its predecessors)."""
    nodes = list(range(6))
    edges = [(i, (i + 1) % 6, 1) for i in nodes]
    e, n = _graph(spark, edges, nodes)

    def plan_size(iters):
        pr = weighted_pagerank(e, n, 6, iters=iters)
        return len(pr._jdf.queryExecution().optimizedPlan().toString())

    small, large = plan_size(2), plan_size(8)
    # identical modulo checkpoint ids: allow tiny drift, forbid growth
    assert large <= small * 1.2


# ---------------------------------------------------------------------------
# triangle counting (operators/graph.py)
# ---------------------------------------------------------------------------


def test_triangle_counts_on_known_graphs(spark):
    from big_data_engineering_financial_analysis_spark.operators.graph import (
        triangle_participation,
    )

    def run(edge_list, nodes):
        e = spark.createDataFrame(edge_list, "src int, dst int")
        n = spark.createDataFrame([(v,) for v in nodes], "node int")
        return {
            r["node"]: r["n_triangles"]
            for r in triangle_participation(e, n).collect()
        }

    # a 4-cycle has no triangles
    square = [(0, 1), (1, 2), (2, 3), (3, 0)]
    assert run(square, range(4)) == {0: 0, 1: 0, 2: 0, 3: 0}
    # K4 has 4 triangles, 3 through each node; direction and duplicate
    # edges must not matter (undirect() collapses them)
    k4 = [(a, b) for a in range(4) for b in range(4) if a != b]
    assert run(k4, range(4)) == {0: 3, 1: 3, 2: 3, 3: 3}
    # one triangle + a pendant node and a disconnected node
    tri = [(0, 1), (1, 2), (2, 0), (2, 3)]
    assert run(tri, range(5)) == {0: 1, 1: 1, 2: 1, 3: 0, 4: 0}


def test_driver_fast_path_matches_distributed(spark):
    """r12 optimization: the tiny-graph driver iteration must be
    bit-identical to the distributed join+fold loop (same IEEE program,
    same in-src-order accumulation)."""
    nodes = list(range(8))
    edges = [(i, (i * 3 + 1) % 8, 1 + i % 3) for i in range(8)] + [
        (0, 5, 7),
        (3, 2, 4),
        (7, 7, 2),
    ]
    e, n = _graph(spark, edges, nodes)
    fast = {
        r["node"]: r["pr"] for r in weighted_pagerank(e, n, 8, iters=4).collect()
    }
    slow = {
        r["node"]: r["pr"]
        for r in weighted_pagerank(e, n, 8, iters=4, driver_node_limit=None).collect()
    }
    assert fast == slow  # exact equality, not approx
