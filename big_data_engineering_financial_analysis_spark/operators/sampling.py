"""Deterministic sampling / splitting / capping for training-data builds.

A 100 TB corpus build needs reproducible selection operators — every one
here is a pure function of the data (md5-derived hashes, rank orders), so
re-running the pipeline on the same input yields byte-identical splits,
and the DuckDB oracle reproduces them exactly:

* :func:`hash_split` — train/val/test assignment by keyed hash bucket.
  Row-local (no shuffle, no RNG state): the split survives repartitioning,
  incremental appends, and distributed re-runs — the property
  ``df.sample()`` (partition-seeded RNG) does NOT have.
* :func:`cap_per_group` — at most N rows per group by a deterministic
  order (one window shuffle on the group key; at scale this is the
  standard per-domain / per-source cap).
* :func:`vocab_topk` — global token vocabulary with counts, deterministic
  (count desc, token) ordering.  Explode + map-side-combined count + one
  ``TakeOrderedAndProject`` — no full sort of the vocabulary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from big_data_engineering_financial_analysis_spark.functions.hashing import hash64, tokens

SPLIT_BUCKETS = 10_000


def hash_split(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float],
    salt: str = "split",
) -> DataFrame:
    """Assign each row a named split by deterministic keyed hash.

    ``fractions`` maps split name -> fraction (must sum to <= 1; any
    remainder falls into the LAST listed split).  The key is hashed with
    ``salt`` into one of 10k buckets; cumulative fraction boundaries cut
    the bucket range, so the same key always lands in the same split —
    across runs, partitionings, and engines (md5-derived, oracle-exact).
    """
    bucket = hash64(F.col(key_col).cast("string"), salt, 8) % SPLIT_BUCKETS
    names = list(fractions)
    cum = 0.0
    expr = None
    for name in names[:-1]:
        cum += fractions[name]
        # round(), not int(): IEEE makes 0.3 * 10000 = 2999.999...9, and
        # truncation silently moves the cut one bucket low
        cond = bucket < round(cum * SPLIT_BUCKETS)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    split = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", split)


def cap_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    n: int,
) -> DataFrame:
    """Keep at most ``n`` rows per group, by (order_col, then order_col's
    column as tie-break is the caller's duty — pass a unique column).

    One window shuffle on the group key; rank <= n prunes before any
    downstream work.
    """
    w = Window.partitionBy(*group_cols).orderBy(F.col(order_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .drop("_rn")
    )


def downsample_groups(
    df: DataFrame,
    group_col: str,
    fractions: dict[str, float],
    key_col: str,
    default: float = 1.0,
    salt: str = "downsample",
) -> DataFrame:
    """Deterministic per-group downsampling to target keep-fractions —
    corpus mixture reweighting ("keep 30% of web, all of books").

    Row-local like :func:`hash_split`: a row survives iff its keyed hash
    bucket falls below ``fraction(group) * 10k``, so the kept set is a
    pure function of (key, salt) — append-stable, repartition-stable,
    engine-exact — and a row kept at fraction f is also kept at any
    f' > f (nested samples, the property needed for mixture sweeps).
    Groups not listed keep ``default``.  No shuffle at any scale.
    """
    bucket = hash64(F.col(key_col).cast("string"), salt, 8) % SPLIT_BUCKETS
    frac = None
    for name, f in fractions.items():
        cond = F.col(group_col) == name
        thr = F.lit(round(f * SPLIT_BUCKETS))  # round, not int: see hash_split
        frac = F.when(cond, thr) if frac is None else frac.when(cond, thr)
    thr_col = F.lit(round(default * SPLIT_BUCKETS)) if frac is None else frac.otherwise(
        F.lit(round(default * SPLIT_BUCKETS))
    )
    return df.filter(bucket < thr_col)


def vocab_topk(
    df: DataFrame,
    text_col: str = "text",
    k: int = 100,
) -> DataFrame:
    """Top-k corpus vocabulary with counts; deterministic ties by token.

    Whitespace tokens, lowercased; explode feeds a map-side-combined
    count, then a single top-k (no global sort of the full vocabulary).
    """
    toks = F.explode(tokens(F.lower(F.col(text_col)))).alias("token")
    return (
        df.select(toks)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("token"))
        .limit(k)
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    key_col: str = "doc_id",
    salt: str = "wsample",
    u_col: str = "u",
) -> DataFrame:
    """Deterministic importance sampling: keep each row with probability
    equal to ``weight_col`` (in [0, 1]) — the corpus-balancing primitive
    ("sample high-quality documents more") behind quality-weighted data
    mixes.

    The coin is a keyed hash mapped to a uniform ``u`` in [0, 1): 13 hex
    digits = 52 bits, below 2^53, so the long -> double conversion is
    EXACT and both engines compare identical values.  Zero shuffle, zero
    RNG state: reproducible across runs, appends, and repartitions, and
    monotone in the weight (raising a doc's weight can only keep it)."""
    u = hash64(F.col(key_col).cast("string"), salt, 13) / F.lit(float(16**13))
    return df.withColumn(u_col, u).filter(F.col(u_col) < F.col(weight_col))


def kfold_assign(
    df: DataFrame,
    key_col: str,
    k: int = 5,
    salt: str = "kfold",
) -> DataFrame:
    """Deterministic k-fold cross-validation assignment: fold =
    keyed-hash % k.  Row-local (zero shuffle), append-stable, and
    GROUP-COHERENT — every row sharing the key lands in the same fold,
    which is what prevents leakage when the key is an entity id rather
    than a row id.  Same hash family as :func:`hash_split`."""
    fold = hash64(F.col(key_col).cast("string"), salt, 8) % F.lit(k)
    return df.withColumn("fold", fold.cast("int"))
