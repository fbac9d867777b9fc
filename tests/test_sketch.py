"""KMV sketch, Bloom-pruned semijoin, and Z-order layout semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_engineering_financial_analysis_spark.operators.layout import (
    zorder_stats,
    zvalue,
    zvalue_sql,
)
from big_data_engineering_financial_analysis_spark.operators.sketch import (
    HASH_SPACE,
    bloom_semi_join,
    kmv_distinct,
)


def test_kmv_underfull_sketch_is_exact(spark):
    """Fewer distinct keys than k: the sketch holds the full set and the
    estimate IS the exact count."""
    df = spark.createDataFrame([(i % 10,) for i in range(200)], "k long")
    row = kmv_distinct(df, "k", k=64).first()
    assert row["k_used"] == 10
    assert row["est_distinct"] == 10.0


def test_kmv_estimate_within_sketch_error(spark):
    """n=5000 distinct, k=256: estimate within ~4 standard errors
    (1/sqrt(k) ≈ 6.25%) of truth."""
    n, k = 5000, 256
    df = spark.createDataFrame([(i,) for i in range(n)], "k long")
    row = kmv_distinct(df, "k", k=k).first()
    assert row["k_used"] == k
    assert abs(row["est_distinct"] - n) / n < 4 / (k ** 0.5)


def test_kmv_grouped_and_duplicate_insensitive(spark):
    """Duplicates never change a distinct sketch; groups are independent."""
    rows = [("a", i % 7) for i in range(100)] + [("b", i) for i in range(40)]
    df = spark.createDataFrame(rows, "g string, k long")
    out = {r["g"]: r for r in kmv_distinct(df, "k", "g", k=16).collect()}
    assert out["a"]["est_distinct"] == 7.0  # underfull -> exact
    # full sketch on b: estimate from the 16th-smallest hash
    assert out["b"]["k_used"] == 16
    assert out["b"]["est_distinct"] == pytest.approx(
        15 * HASH_SPACE / out["b"]["kth_hash"], abs=1e-3
    )


def test_kmv_matches_single_partition_reference(spark):
    """Partitioning must not change the sketch: 8-partition run equals
    the 1-partition run bit-for-bit (k-min of distinct is associative)."""
    rows = [(i * 37 % 500,) for i in range(2000)]
    many = kmv_distinct(spark.createDataFrame(rows, "k long").repartition(8), "k", k=32).first()
    one = kmv_distinct(spark.createDataFrame(rows, "k long").coalesce(1), "k", k=32).first()
    assert many == one


def test_bloom_semi_join_equals_plain_semijoin(spark):
    """No false negatives + residual exact join ⇒ identical to ⋉."""
    fact = spark.createDataFrame([(i, i * 10) for i in range(500)], "k long, v long")
    keys = spark.createDataFrame([(i,) for i in range(0, 500, 7)], "k long")
    got = sorted(r["k"] for r in bloom_semi_join(fact, keys, "k", "k").collect())
    want = sorted(range(0, 500, 7))
    assert got == want


def test_bloom_prunes_before_residual_join(spark):
    """The bitmap filter must reject the vast majority of non-members
    before the exact semijoin (false-positive rate ≪ 1 at this load)."""
    from big_data_engineering_financial_analysis_spark.operators.sketch import (
        BLOOM_HASHES,
        bloom_build,
        _bloom_positions,
    )
    from functools import reduce
    from pyspark.sql import Column

    fact = spark.createDataFrame([(i,) for i in range(5000)], "k long")
    keys = spark.createDataFrame([(i,) for i in range(50)], "k long")
    bitmap = bloom_build(keys, "k")
    probed = fact.crossJoin(F.broadcast(bitmap))
    hits = []
    for i, p in enumerate(_bloom_positions(F.col("k"))):
        probed = probed.withColumn(f"__pos{i}", p)
        word = F.coalesce(
            F.element_at(F.col("bloom"), (F.col(f"__pos{i}") / 64).cast("int")),
            F.lit(0).cast("long"),
        )
        mask = F.expr(f"shiftleft(1L, CAST(__pos{i} % 64 AS INT))")
        hits.append(word.bitwiseAND(mask) != 0)
    n_candidates = probed.filter(reduce(Column.__and__, hits)).count()
    # 50 members + false positives; fp rate at 150 set bits / 65536 with
    # 3 probes ≈ (150/65536)^3 ~ 1e-8 — candidates should be exactly ~50
    assert 50 <= n_candidates < 100


def test_zvalue_morton_hand_example(spark):
    """x=0b011 (3), y=0b101 (5): interleaved key is
    y2x2 y1x1 y0x0 = 1 0 . 0 1 . 1 1 = 0b100111 = 39."""
    df = spark.createDataFrame([(3, 5)], "x long, y long")
    assert df.select(zvalue(F.col("x"), F.col("y")).alias("z")).first()["z"] == 39
    # SQL text form computes the identical key in Spark SQL too
    assert (
        spark.sql(f"SELECT {zvalue_sql('3', '5')} AS z").first()["z"] == 39
    )


def test_zvalue_locality_beats_linear_key_on_second_dim(spark):
    """The audit's point: bucket rows by Z-prefix and every bucket's
    envelope is bounded in BOTH dims, unlike an x-sorted layout where y
    spans the full range in every file."""
    rows = [(x, y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(rows, "x long, y long")
    stats = zorder_stats(df, "x", "y", bucket_shift=8).collect()
    assert sum(r["n_rows"] for r in stats) == 64 * 64
    for r in stats:
        # each 256-key bucket covers a 16x16 tile: both dims bounded
        assert r["x_max"] - r["x_min"] <= 15
        assert r["y_max"] - r["y_min"] <= 15


def test_countmin_overestimates_never_under(spark):
    """CMS guarantee: est >= true count for every key, and with 3 rows
    x 1024 counters over 20 keys, est == true (collision-free load)."""
    from big_data_engineering_financial_analysis_spark.operators.sketch import (
        countmin_build,
        countmin_estimate,
    )

    rows = [(i % 20,) for i in range(1000)]
    df = spark.createDataFrame(rows, "k long")
    sk = countmin_build(df, "k")
    cands = df.distinct()
    out = {r["k"]: r["est_count"] for r in countmin_estimate(sk, cands, "k").collect()}
    assert all(v == 50 for v in out.values())


def test_countmin_grid_is_bounded(spark):
    """The sketch never exceeds depth x width cells no matter the key
    cardinality — the bounded-shuffle claim."""
    from big_data_engineering_financial_analysis_spark.operators.sketch import (
        CM_DEPTH,
        CM_WIDTH,
        countmin_build,
    )

    df = spark.createDataFrame([(i,) for i in range(20000)], "k long")
    assert countmin_build(df, "k").count() <= CM_DEPTH * CM_WIDTH


def test_countmin_absent_key_estimates_only_collisions(spark):
    """A key never inserted gets the collision mass of its cells — with
    a near-empty grid that is 0."""
    from big_data_engineering_financial_analysis_spark.operators.sketch import (
        countmin_build,
        countmin_estimate,
    )

    df = spark.createDataFrame([(1,), (1,), (2,)], "k long")
    sk = countmin_build(df, "k")
    cands = spark.createDataFrame([(999,)], "k long")
    assert countmin_estimate(sk, cands, "k").first()["est_count"] == 0


def test_hist_quantiles_close_to_exact_and_bounded_error(spark):
    from big_data_engineering_financial_analysis_spark.operators.sketch import (
        HIST_BINS,
        hist_quantiles,
    )

    rows = [("g", float(i)) for i in range(10000)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r["q"]: r for r in hist_quantiles(df, "v", "g").collect()}
    bin_width = (9999.0 - 0.0) / HIST_BINS
    for q in (0.5, 0.9, 0.99):
        exact = q * 9999.0
        assert abs(out[q]["est"] - exact) <= bin_width + 1e-6, (q, out[q])
        assert out[q]["n"] == 10000


def test_hist_quantiles_partition_invariant(spark):
    from big_data_engineering_financial_analysis_spark.operators.sketch import (
        hist_quantiles,
    )

    rows = [("a", float((i * 31) % 997)) for i in range(3000)]
    df = spark.createDataFrame(rows, "g string, v double")
    a = sorted(hist_quantiles(df.repartition(11), "v", "g").collect())
    b = sorted(hist_quantiles(df.coalesce(1), "v", "g").collect())
    assert a == b
