"""Graph metrics over aggregated edge frames.

Companion to :mod:`operators/pagerank` — same two-tier scale split:
edges are distilled from fact tables by scalable joins + one grouped
count, and the metric then runs on the |nodes|²-bounded aggregate.

:func:`triangle_participation` counts, per node, the triangles through
it — the clustering signal behind community detection and fraud rings.
The enumeration uses the canonical ``a < b < c`` ordering (each
triangle materializes exactly once, the "compact-forward" trick from
Latapy 2008): two self-joins over the undirected edge set, candidate
rows bounded by Σ deg(v)² rather than |V|³.  At web scale the same
ordering is applied by *degree* rather than id (orient each edge from
the lower-degree endpoint), which bounds the join fan-out by the
arboricity — the id ordering here keeps the oracle trivially
mirrorable while exercising the identical plan shape.

All counts are integers: no floating-point, so the oracle match is
exact by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def undirect(edges: DataFrame) -> DataFrame:
    """Collapse a directed (src, dst) edge frame to distinct undirected
    pairs ``u < v`` (self-loops dropped)."""
    return (
        edges.select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .filter(F.col("u") < F.col("v"))
        .distinct()
    )


def triangles(und: DataFrame) -> DataFrame:
    """Enumerate each triangle once as (a, b, c) with a < b < c:
    wedge join (a,b)x(b,c) then close with the (a,c) edge."""
    e1 = und.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = und.select(F.col("u").alias("b2"), F.col("v").alias("c"))
    e3 = und.select(F.col("u").alias("a3"), F.col("v").alias("c3"))
    wedges = e1.join(e2, F.col("b") == F.col("b2")).select("a", "b", "c")
    return wedges.join(
        e3, (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3"))
    ).select("a", "b", "c")


def triangle_participation(edges: DataFrame, nodes: DataFrame) -> DataFrame:
    """Per-node triangle count over the directed edge frame; nodes
    outside any triangle report 0.  Output: (node, n_triangles)."""
    tri = triangles(undirect(edges))
    member = tri.select(
        F.explode(F.array("a", "b", "c")).alias("node")
    ).groupBy("node").agg(F.count(F.lit(1)).alias("n_triangles"))
    return nodes.join(member, "node", "left").select(
        "node", F.coalesce("n_triangles", F.lit(0)).alias("n_triangles")
    )
