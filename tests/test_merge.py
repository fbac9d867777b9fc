"""Merge/SCD2 operator semantics (operators/merge.py)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from big_data_engineering_financial_analysis_spark.operators.merge import scd2_apply, upsert


def test_upsert_updates_and_inserts(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], "id long, name string, val double"
    )
    updates = spark.createDataFrame(
        [(2, "b2", 21.0), (3, "c", 30.0)], "id long, name string, val double"
    )
    out = {r.id: (r.name, r.val) for r in upsert(target, updates, ["id"]).collect()}
    assert out == {1: ("a", 10.0), 2: ("b2", 21.0), 3: ("c", 30.0)}


def test_upsert_whole_row_wins_even_when_equal(spark):
    target = spark.createDataFrame([(1, "a")], "id long, name string")
    updates = spark.createDataFrame([(1, "a")], "id long, name string")
    rows = upsert(target, updates, ["id"]).collect()
    assert len(rows) == 1 and rows[0].name == "a"


def _dim(spark, rows):
    return spark.createDataFrame(
        rows, "id long, attr string, valid_from timestamp, valid_to timestamp"
    )


def test_scd2_change_noop_insert_and_history(spark):
    t0 = datetime(2020, 1, 1)
    t1 = datetime(2021, 1, 1)
    dim = _dim(
        spark,
        [
            (1, "old", t0, t1),   # closed history — must pass through untouched
            (1, "cur", t1, None), # current, attribute changes
            (2, "same", t0, None),  # current, value-identical re-delivery
            (3, "keep", t0, None),  # current, absent from the batch
        ],
    )
    changes = spark.createDataFrame(
        [(1, "new"), (2, "same"), (4, "fresh")], "id long, attr string"
    )
    out = scd2_apply(dim, changes, "id", ["attr"], "2022-06-01")
    rows = {(r.id, r.attr, r.valid_from, r.valid_to) for r in out.collect()}
    eff = datetime(2022, 6, 1)
    assert rows == {
        (1, "old", t0, t1),        # history untouched
        (1, "cur", t1, eff),       # closed out at effective ts
        (1, "new", eff, None),     # new version
        (2, "same", t0, None),     # no-op: no phantom version
        (3, "keep", t0, None),     # untouched current
        (4, "fresh", eff, None),   # brand-new key
    }
    spark.catalog.clearCache()


def test_scd2_null_safe_diff(spark):
    t0 = datetime(2020, 1, 1)
    dim = _dim(spark, [(1, None, t0, None), (2, "x", t0, None)])
    changes = spark.createDataFrame(
        [(1, None), (2, None)], "id long, attr string"
    )
    out = scd2_apply(dim, changes, "id", ["attr"], "2022-06-01").collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r.id, []).append(r)
    # NULL == NULL must be treated as unchanged (single row survives) …
    assert len(by_id[1]) == 1 and by_id[1][0].valid_to is None
    # … while x -> NULL is a real change (close + new version)
    assert len(by_id[2]) == 2
    spark.catalog.clearCache()


def test_scd2_null_key_dim_row_survives(spark):
    """A current dim row whose KEY is NULL can never match a change, but it
    must pass through untouched — not vanish or spawn a phantom insert."""
    t0 = datetime(2020, 1, 1)
    dim = _dim(spark, [(None, "orphan", t0, None), (1, "x", t0, None)])
    changes = spark.createDataFrame([(1, "y")], "id long, attr string")
    out = scd2_apply(dim, changes, "id", ["attr"], "2022-06-01").collect()
    orphans = [r for r in out if r.id is None]
    assert len(orphans) == 1
    assert orphans[0].attr == "orphan" and orphans[0].valid_to is None
    assert len(out) == 3  # orphan + closed x + new y
    spark.catalog.clearCache()


def test_upsert_rejects_null_key_in_updates(spark):
    import pytest

    target = spark.createDataFrame([(1, "a")], "id long, name string")
    updates = spark.createDataFrame([(None, "n")], "id long, name string")
    with pytest.raises(ValueError, match="NULL merge key"):
        upsert(target, updates, ["id"])
    # explicit opt-out still runs (documented escape hatch)
    assert upsert(target, updates, ["id"], validate=False).count() == 2


def test_upsert_rejects_duplicate_keys_in_updates(spark):
    import pytest

    target = spark.createDataFrame([(1, "a")], "id long, name string")
    updates = spark.createDataFrame([(2, "b"), (2, "c")], "id long, name string")
    with pytest.raises(ValueError, match="duplicate merge keys"):
        upsert(target, updates, ["id"])


def test_scd2_rejects_bad_changes_batch(spark):
    import pytest

    t0 = datetime(2020, 1, 1)
    dim = _dim(spark, [(1, "x", t0, None)])
    dup = spark.createDataFrame([(1, "y"), (1, "z")], "id long, attr string")
    with pytest.raises(ValueError, match="duplicate merge keys"):
        scd2_apply(dim, dup, "id", ["attr"], "2022-06-01")
    nullkey = spark.createDataFrame([(None, "y")], "id long, attr string")
    with pytest.raises(ValueError, match="NULL merge key"):
        scd2_apply(dim, nullkey, "id", ["attr"], "2022-06-01")


def test_pit_join_version_boundaries(spark):
    import datetime as dt

    from big_data_engineering_financial_analysis_spark.operators.merge import pit_join

    cut = dt.datetime(1996, 6, 1)
    dim = spark.createDataFrame(
        [
            (1, 100.0, dt.datetime(1995, 1, 1), cut),
            (1, 200.0, cut, None),
        ],
        "k int, bal double, valid_from timestamp, valid_to timestamp",
    )
    facts = spark.createDataFrame(
        [
            (1, dt.datetime(1996, 5, 31)),   # strictly before cut -> v1
            (1, cut),                        # AT the boundary -> v2 (>=)
            (1, dt.datetime(1997, 1, 1)),    # after -> v2
            (2, dt.datetime(1996, 1, 1)),    # unknown key -> dropped (inner)
        ],
        "k int, ts timestamp",
    )
    got = sorted(
        (r["ts"], r["bal"])
        for r in pit_join(facts, dim, "k", "k", "ts").collect()
    )
    assert got == [
        (dt.datetime(1996, 5, 31), 100.0),
        (cut, 200.0),
        (dt.datetime(1997, 1, 1), 200.0),
    ]
    # each fact matches EXACTLY one version (intervals partition time)
    assert len(got) == 3
