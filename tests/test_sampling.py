"""Deterministic sampling/splitting operators (operators/sampling.py)."""

from __future__ import annotations

from big_data_engineering_financial_analysis_spark.operators import sampling


def test_hash_split_deterministic_and_proportional(spark):
    df = spark.range(10_000).toDF("id")
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = sampling.hash_split(df, "id", fr).groupBy("split").count().collect()
    b = sampling.hash_split(df.repartition(7), "id", fr).groupBy("split").count().collect()
    ca = {r.split: r["count"] for r in a}
    cb = {r.split: r["count"] for r in b}
    assert ca == cb  # partitioning-independent
    assert 0.77 <= ca["train"] / 10_000 <= 0.83
    assert 0.08 <= ca["val"] / 10_000 <= 0.12
    assert sum(ca.values()) == 10_000


def test_hash_split_stable_under_append(spark):
    """A key's split never changes when more data arrives — the property
    partition-seeded df.sample() lacks."""
    small = spark.range(100).toDF("id")
    big = spark.range(1_000).toDF("id")
    fr = {"train": 0.5, "val": 0.5}
    s = {r.id: r.split for r in sampling.hash_split(small, "id", fr).collect()}
    g = {r.id: r.split for r in sampling.hash_split(big, "id", fr).collect()}
    assert all(g[k] == v for k, v in s.items())


def test_cap_per_group(spark):
    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(20)], "id long, g string"
    )
    out = sampling.cap_per_group(df, ["g"], "id", 3).collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r.g, []).append(r.id)
    assert sorted(by_g["a"]) == [0, 2, 4]  # lowest ids kept
    assert sorted(by_g["b"]) == [1, 3, 5]


def test_vocab_topk_deterministic_ties(spark):
    df = spark.createDataFrame(
        [("b b a a c",), ("A B x",)], "text string"
    )
    rows = sampling.vocab_topk(df, "text", 3).collect()
    # counts: a=3 (a,a,A) b=3 (b,b,B) c=1 x=1 -> ties broken by token asc
    assert [(r.token, r.n) for r in rows] == [("a", 3), ("b", 3), ("c", 1)]


def test_downsample_groups_nested_and_stable(spark):
    """A row kept at fraction f stays kept at any f' > f (nested samples),
    unlisted groups keep everything, and the kept set is append-stable."""
    rows = [(i, "en" if i % 2 == 0 else "de") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    keep30 = {
        r["doc_id"]
        for r in sampling.downsample_groups(df, "lang", {"en": 0.3}, "doc_id").collect()
    }
    keep60 = {
        r["doc_id"]
        for r in sampling.downsample_groups(df, "lang", {"en": 0.6}, "doc_id").collect()
    }
    en = {i for i in range(400) if i % 2 == 0}
    de = set(range(400)) - en
    assert de <= keep30            # unlisted group untouched
    assert (keep30 & en) <= (keep60 & en)   # nested
    assert 0.15 <= len(keep30 & en) / len(en) <= 0.45  # ~30% of en
    # append-stability: the same ids survive when computed on a subset
    sub = df.filter("doc_id < 200")
    keep30_sub = {
        r["doc_id"]
        for r in sampling.downsample_groups(sub, "lang", {"en": 0.3}, "doc_id").collect()
    }
    assert keep30_sub == {i for i in keep30 if i < 200}


def test_weighted_sample_monotone_and_exact(spark):
    from pyspark.sql import functions as F

    from big_data_engineering_financial_analysis_spark.operators.sampling import weighted_sample

    docs = spark.createDataFrame(
        [(i, 0.3) for i in range(500)] + [(1000 + i, 0.9) for i in range(500)],
        "doc_id long, w double",
    )
    kept = weighted_sample(docs, "w").toPandas()
    lo = (kept["doc_id"] < 1000).sum()
    hi = (kept["doc_id"] >= 1000).sum()
    # keep rates track the weights (binomial, wide tolerance)
    assert 100 <= lo <= 210, lo
    assert 400 <= hi <= 490, hi
    # weight 0 keeps nothing, weight 1 keeps everything (u < 1 strictly)
    none = weighted_sample(docs.withColumn("w", F.lit(0.0)), "w").count()
    everything = weighted_sample(docs.withColumn("w", F.lit(1.0)), "w").count()
    assert none == 0 and everything == 1000
    # monotone: raising every weight keeps a superset
    more = weighted_sample(docs.withColumn("w", F.col("w") + 0.05), "w").toPandas()
    assert set(kept["doc_id"]) <= set(more["doc_id"])
    # reproducible across repartitions
    again = weighted_sample(docs.repartition(7), "w").toPandas()
    assert set(again["doc_id"]) == set(kept["doc_id"])


def test_kfold_assignment_is_entity_coherent_and_balanced(spark):
    from big_data_engineering_financial_analysis_spark.operators.sampling import (
        kfold_assign,
    )

    rows = [(u, r) for u in range(200) for r in range(3)]
    df = spark.createDataFrame(rows, "user long, row long")
    out = kfold_assign(df, "user", k=5).collect()
    folds = {}
    for r in out:
        folds.setdefault(r["user"], set()).add(r["fold"])
    # entity-coherent: every user's rows share one fold
    assert all(len(s) == 1 for s in folds.values())
    assert set(f for s in folds.values() for f in s) == {0, 1, 2, 3, 4}
    # roughly balanced: each fold gets 200/5 = 40 users +/- 50%
    from collections import Counter
    per_fold = Counter(next(iter(s)) for s in folds.values())
    assert all(20 <= per_fold[f] <= 60 for f in range(5))
    # append-stable: re-assigning a subset yields identical folds
    sub = kfold_assign(df.filter("user < 50"), "user", k=5).collect()
    base = {r["user"]: r["fold"] for r in out}
    assert all(base[r["user"]] == r["fold"] for r in sub)
