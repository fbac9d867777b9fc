"""Plan-quality guard: no registry query may plan a Cartesian product or
a row-at-a-time Python UDF.

``CartesianProduct`` is the all-pairs physical join — every intentional
scalar-broadcast cross join in the engine compiles to
BroadcastNestedLoopJoin over a 1-row side, never this.
``BatchEvalPython`` is the pickled row-wise Python UDF operator — the
engine's only Python data paths are Arrow-batched
(ArrowEvalPython / FlatMapGroupsInPandas / MapInPandas, all allowed).

Planning is cheap relative to execution, so this sweeps the WHOLE
registry; a new query that sneaks in an unbroadcast cross join or a
``F.udf`` hot path fails here before it ever reaches the driver.
"""

from __future__ import annotations

from big_data_engineering_financial_analysis_spark.plans.registry import QUERIES

from tests.conftest import SF_MEDIUM

FORBIDDEN = ("CartesianProduct", "BatchEvalPython")


def test_no_cartesian_or_row_python_in_any_registry_plan(spark):
    violations: dict[str, list[str]] = {}
    for name, fn in QUERIES.items():
        plan = fn(spark, SF_MEDIUM)._jdf.queryExecution().executedPlan().toString()
        hits = [m for m in FORBIDDEN if m in plan]
        if hits:
            violations[name] = hits
        spark.catalog.clearCache()
    assert not violations, violations
