"""Validation checks fire on crafted dirty data (the sf fixtures are
clean, so the oracle query only proves the zero case)."""

from __future__ import annotations

from big_data_engineering_financial_analysis_spark.operators.validation import (
    check_accepted,
    check_in_range,
    check_not_null,
    check_ref_integrity,
    check_unique,
    quality_report,
)


def test_checks_fire_on_dirty_data(spark):
    child = spark.createDataFrame(
        [(1, None, 5.0, "A"), (2, 10, -1.0, "B"), (3, 10, 99.0, "Z"),
         (3, 20, 101.0, "A"), (4, 30, None, "B")],
        "id long, fk int, v double, status string",
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk int")

    rep = {
        r["check"]: (r["n_violations"], r["n_checked"])
        for r in quality_report([
            check_not_null(child, "fk"),
            check_in_range(child, "v", 0.0, 100.0),
            check_accepted(child, "status", ["A", "B"]),
            check_unique(child, ["id"]),
            check_ref_integrity(child, "fk", parent, "pk"),
        ]).collect()
    }
    assert rep["not_null:fk"] == (1, 5)
    # NULL v is not checked; -1 and 101 violate
    assert rep["in_range:v"] == (2, 4)
    assert rep["accepted:status"] == (1, 5)
    # id 3 appears twice -> one excess row
    assert rep["unique:id"] == (1, 5)
    # fk=30 is the one orphan; the NULL fk is NOT a referential
    # violation (SQL MATCH SIMPLE) and is excluded from both counts —
    # it is the not_null:fk check's finding above, not a double-count
    assert rep["ref:fk"] == (1, 4)


def test_clean_data_zero_violations(spark):
    df = spark.createDataFrame([(1, 1.0), (2, 2.0)], "id long, v double")
    rep = quality_report([
        check_not_null(df, "v"),
        check_in_range(df, "v", 0.0, 10.0),
        check_unique(df, ["id"]),
    ]).collect()
    assert all(r["n_violations"] == 0 for r in rep)
    assert all(r["n_checked"] == 2 for r in rep)


def test_salted_topk_equals_naive_on_hot_key(spark):
    from pyspark.sql import Window, functions as F

    from big_data_engineering_financial_analysis_spark.operators.skew import (
        salted_topk_per_group,
    )

    # one hot group (1000 rows) + small groups
    rows = [("hot", i, float((i * 7919) % 500)) for i in range(1000)]
    rows += [(f"g{j}", 10000 + j * 10 + i, float(i)) for j in range(5) for i in range(4)]
    df = spark.createDataFrame(rows, "k string, id long, v double")

    got = (
        salted_topk_per_group(df, ["k"], "v", 3, "id")
        .toPandas()
        .sort_values(["k", "rn"])
        .reset_index(drop=True)
    )
    w = Window.partitionBy("k").orderBy(F.desc("v"), F.asc("id"))
    exp = (
        df.withColumn("rn", F.row_number().over(w))
        .filter("rn <= 3")
        .toPandas()
        .sort_values(["k", "rn"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    for c in ("k", "id", "v", "rn"):
        assert (got[c] == exp[c]).all(), c
