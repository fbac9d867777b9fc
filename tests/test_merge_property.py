"""Property-based merge/SCD2 semantics against a pure-Python model.

Small key domains force heavy overlap between target and update batches;
10 hypothesis examples keep the Spark-job cost bounded (the deterministic
edge cases live in test_merge.py)."""

from __future__ import annotations

from datetime import datetime

from hypothesis import given, settings
from hypothesis import strategies as st

from big_data_engineering_financial_analysis_spark.operators.merge import scd2_apply, upsert

KEYS = st.integers(min_value=0, max_value=5)
VALS = st.integers(min_value=0, max_value=3)

frame = st.dictionaries(KEYS, VALS, max_size=6)

T0 = datetime(2020, 1, 1)
EFF = datetime(2022, 6, 1)


@settings(max_examples=10, deadline=None)
@given(target=frame, updates=frame)
def test_upsert_matches_dict_semantics(spark, target, updates):
    t = spark.createDataFrame([(k, v) for k, v in target.items()] or [(None, None)], "id long, val long")
    u = spark.createDataFrame([(k, v) for k, v in updates.items()] or [(None, None)], "id long, val long")
    if not target:
        t = t.filter("id IS NOT NULL")
    if not updates:
        u = u.filter("id IS NOT NULL")
    out = {r.id: r.val for r in upsert(t, u, ["id"]).collect()}
    assert out == {**target, **updates}


@settings(max_examples=10, deadline=None)
@given(dim=frame, changes=frame)
def test_scd2_matches_model(spark, dim, changes):
    d = spark.createDataFrame(
        [(k, v, T0, None) for k, v in dim.items()] or [(None, None, None, None)],
        "id long, attr long, valid_from timestamp, valid_to timestamp",
    )
    if not dim:
        d = d.filter("id IS NOT NULL")
    c = spark.createDataFrame(
        [(k, v) for k, v in changes.items()] or [(None, None)], "id long, attr long"
    )
    if not changes:
        c = c.filter("id IS NOT NULL")
    out = sorted(
        (r.id, r.attr, r.valid_from, r.valid_to)
        for r in scd2_apply(d, c, "id", ["attr"], "2022-06-01").collect()
    )
    expected = []
    for k, v in dim.items():
        if k in changes and changes[k] != v:
            expected.append((k, v, T0, EFF))            # closed out
            expected.append((k, changes[k], EFF, None))  # new version
        else:
            expected.append((k, v, T0, None))            # untouched / no-op
    for k, v in changes.items():
        if k not in dim:
            expected.append((k, v, EFF, None))           # brand-new key
    assert out == sorted(expected)
    spark.catalog.clearCache()
