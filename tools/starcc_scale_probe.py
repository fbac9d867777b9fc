"""10x scale audit for connected_components_star (SCALE.md round 7).

Chain graphs are the adversarial case: diameter == n, so min-label CC
needs n rounds (structurally impossible at scale) while the star
formulation needs O(log^2 n) cycles.  Measures converged cycle count and
wall time on a chain at n and 10n, plus a realistic mixed graph
(many small near-cliques + one long chain), on local[8].

Usage: python tools/starcc_scale_probe.py [n]
"""
from __future__ import annotations

import sys
import time

from pyspark.sql import SparkSession

sys.path.insert(0, ".")
from big_data_engineering_financial_analysis_spark.operators.dedup import (  # noqa: E402
    connected_components_star,
)

n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000

spark = (
    SparkSession.builder.master("local[8]")
    .appName("starcc-probe")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")


def chain(sz: int):
    return spark.range(1, sz).selectExpr("id AS id_a", "id + 1 AS id_b")


def mixed(sz: int):
    """sz/10 near-cliques of 10 + one chain of sz/10 — the dup-graph +
    session-graph blend an entity-resolution corpus actually produces."""
    cliques = spark.range(sz).selectExpr(
        "id AS id_a", "(CAST(id / 10 AS BIGINT) * 10) AS id_b"
    ).filter("id_a != id_b")
    ch = spark.range(sz, sz + sz // 10).selectExpr("id AS id_a", "id + 1 AS id_b")
    return cliques.unionByName(ch)


for label, df in [
    (f"chain n={n}", chain(n)),
    (f"chain n={10*n}", chain(10 * n)),
    (f"mixed n={n}", mixed(n)),
    (f"mixed n={10*n}", mixed(10 * n)),
]:
    t0 = time.time()
    stats: dict = {}
    # driver_threshold=0: this probe audits the DISTRIBUTED loop's cycle
    # growth; the driver union-find auto-switch would absorb the small ns
    out = connected_components_star(df, max_iter=40, stats=stats, driver_threshold=0)
    comps = out.selectExpr("count(distinct component) c").collect()[0]["c"]
    dt = time.time() - t0
    print(
        f"{label}: {comps} components, {stats.get('rounds')} cycles, {dt:.2f}s",
        flush=True,
    )
    spark.catalog.clearCache()
