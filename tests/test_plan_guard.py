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

import re

from big_data_engineering_financial_analysis_spark.plans.registry import QUERIES

from tests.conftest import SF_MEDIUM

FORBIDDEN = ("CartesianProduct", "BatchEvalPython")

#: The _bucket_pairs(cap=None) escape hatch keeps the bucket SELF-JOIN
#: (uncapped collect_list is a non-spillable OOM; see dedup.py) — legal
#: for tests/verifiers, but no registry query may plan it: the self-join
#: plans the banding subtree twice (the r10 bisect's regression).  Its
#: physical signature is a Join node KEYED on a banding bucket column
#: (printed as `SortMergeJoin [band_key#2, band#1], [band_key#5, ...]` /
#: `BroadcastHashJoin [band_key#...`); banding bucket columns are
#: band_key (minhash LSH), chunk_key (simhash) and dedup_bucket
#: (embedding sign-LSH — named distinctly from ann_lsh's legitimate
#: query<->corpus `bucket` join key precisely so this guard can key-name
#: match).  The grouped path only ever hash-PARTITIONS on these columns;
#: the one legitimate JOIN on band_key — the incremental signature-store
#: probe (streaming/corpus.py, new-batch vs persisted store: two
#: different relations) — is exempted by name below.
#:
#: Spark plan-string assumptions this regex leans on (advice r11 — a
#: version bump changing any of these un-guards the shape, which the
#: vacuity test below then catches as a FAILURE, not silence):
#: 1. physical join nodes print as `<Kind>Join [leftKeys], [rightKeys]`
#:    with the key list in square brackets directly after the node name;
#: 2. attribute names print with their expr-id suffix (`band_key#12`);
#: 3. the banding columns are literally named band_key / chunk_key /
#:    dedup_bucket at the join — a future query ALIASING one of these
#:    before joining would dodge the name match, so new banding columns
#:    must reuse these names (dedup.py's documented convention).
_SELF_JOIN = re.compile(r"Join[^\n\[]*\[[^\]\n]*\b(band_key|chunk_key|dedup_bucket)#\d+")
_SELF_JOIN_EXEMPT = {"dedup_incremental"}


def test_no_cartesian_row_python_or_bucket_self_join_in_any_registry_plan(spark):
    violations: dict[str, list[str]] = {}
    for name, fn in QUERIES.items():
        plan = fn(spark, SF_MEDIUM)._jdf.queryExecution().executedPlan().toString()
        hits = [m for m in FORBIDDEN if m in plan]
        if name not in _SELF_JOIN_EXEMPT and _SELF_JOIN.search(plan):
            hits.append("bucket-self-join (cap=None _bucket_pairs shape)")
        if hits:
            violations[name] = hits
        spark.catalog.clearCache()
    assert not violations, violations


def test_self_join_guard_pattern_catches_the_uncapped_shape(spark):
    """The guard regex is live, not vacuous: the cap=None branch's plan
    DOES trip it on a minimal banded frame."""
    from big_data_engineering_financial_analysis_spark.operators.dedup import _bucket_pairs

    banded = spark.createDataFrame(
        [(1, 0, "k"), (2, 0, "k")], "doc_id long, band int, band_key string"
    )
    plan = (
        _bucket_pairs(banded, ["band", "band_key"], "doc_id", None)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert _SELF_JOIN.search(plan)
