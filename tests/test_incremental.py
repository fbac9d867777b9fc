"""Partial-aggregate merge semantics (operators/incremental.py):
disjoint groups pass through, overlapping groups combine exactly."""

from __future__ import annotations

from big_data_engineering_financial_analysis_spark.operators.incremental import (
    finalize,
    merge_partials,
    to_partials,
)

SCHEMA = "g string, v double"


def test_merge_overlap_and_disjoint(spark):
    base_rows = [("a", 1.0), ("a", 3.0), ("b", 10.0)]
    delta_rows = [("a", 5.0), ("c", -2.0)]
    base = to_partials(spark.createDataFrame(base_rows, SCHEMA), ["g"], "v")
    delta = to_partials(spark.createDataFrame(delta_rows, SCHEMA), ["g"], "v")
    out = {
        r["g"]: r
        for r in finalize(merge_partials(base, delta, ["g"])).collect()
    }
    assert set(out) == {"a", "b", "c"}
    a = out["a"]
    assert (a["n"], a["sum_v"], a["min_v"], a["max_v"]) == (3, 9.0, 1.0, 5.0)
    assert a["avg_v"] == 3.0
    # groups present in only one side pass through unchanged
    assert (out["b"]["n"], out["b"]["sum_v"]) == (1, 10.0)
    assert (out["c"]["n"], out["c"]["min_v"]) == (1, -2.0)


def test_repeated_refresh_associative(spark):
    """merge(merge(p1, p2), p3) == partials(all rows) — refreshes chain."""
    rows = [("x", float(i)) for i in range(10)] + [("y", 100.0)]
    df = spark.createDataFrame(rows, SCHEMA)
    chunks = [
        to_partials(df.filter(f"v % 3 = {k}"), ["g"], "v") for k in range(3)
    ]
    merged = merge_partials(merge_partials(chunks[0], chunks[1], ["g"]), chunks[2], ["g"])
    direct = to_partials(df, ["g"], "v")
    m = {r["g"]: r for r in merged.collect()}
    d = {r["g"]: r for r in direct.collect()}
    assert set(m) == set(d)
    for g in d:
        for c in ("n", "min_v", "max_v"):
            assert m[g][c] == d[g][c], (g, c)
        assert abs(m[g]["sum_v"] - d[g]["sum_v"]) < 1e-9
