"""Keyed merge (upsert) and type-2 slowly-changing-dimension apply.

A 100 TB training-data pipeline re-ingests sources incrementally: new
snapshots must replace matching rows (MERGE / upsert) and dimension
attributes must keep history (SCD2).  Lakehouse table formats bake these
in; on plain DataFrames both are join+union compositions, which is exactly
how Delta/Iceberg execute the rewrite side of MERGE anyway:

* :func:`upsert` — WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT with
  source-wins semantics: one anti-join (shuffle on the merge key, or a
  broadcast when the update batch is small — left to AQE) + union.
* :func:`scd2_apply` — close out current rows whose tracked attributes
  changed, append the new versions, insert unseen keys, and leave
  untouched rows alone (a value-identical change row is a no-op, so
  re-delivered batches don't spawn phantom versions).  One full-outer
  shuffle on the key; every output branch derives from that single join.

Both return plain DataFrames: write with ``.write.parquet`` (or feed the
bucketed store) — at scale, partition the target by the merge key so the
rewrite touches only affected partitions.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _check_merge_batch(batch: DataFrame, keys: list[str], what: str) -> None:
    """Reject NULL or duplicate merge keys in a change batch.

    Standard MERGE (Delta, Iceberg, ANSI) errors when a source row matches
    more than once or carries a NULL key; silently proceeding here would
    duplicate NULL-key rows across target∪updates (they never match the
    anti-join) and multiply duplicate-key rows through the full-outer join.
    One aggregate job over the (typically small) batch.
    """
    any_null = reduce(
        lambda a, b: a | b, [F.col(k).isNull() for k in keys]
    )
    n, nulls, distinct = batch.agg(
        F.count(F.lit(1)),
        F.count_if(any_null),
        F.count_distinct(*[F.col(k) for k in keys]),
    ).first()
    if nulls:
        raise ValueError(
            f"{what}: {nulls} row(s) with NULL merge key {keys} — "
            "MERGE semantics require non-null keys"
        )
    if n != distinct:
        raise ValueError(
            f"{what}: duplicate merge keys ({n} rows, {distinct} distinct "
            f"{keys}) — each source key may match at most once"
        )


def upsert(
    target: DataFrame,
    updates: DataFrame,
    keys: list[str],
    validate: bool = True,
) -> DataFrame:
    """Source-wins keyed merge: rows of ``updates`` replace same-key rows
    of ``target``; unmatched update rows are inserted.

    ``updates`` must carry the full target schema (this is a whole-row
    upsert, the reference's INSERT-or-replace pattern for the serving
    store).  Plan: target ⟕̸ (anti) update-keys, then union — a single
    shuffle on ``keys`` for the anti-join; Catalyst broadcasts the
    (usually tiny) update key set automatically.

    ``validate`` (default on) rejects NULL / duplicate keys in ``updates``
    the way lakehouse MERGE does; pass ``False`` only when the batch is
    already proven unique upstream and the extra aggregate job matters.
    """
    if validate:
        _check_merge_batch(updates, keys, "upsert updates batch")
    surviving = target.join(updates.select(*keys).distinct(), keys, "left_anti")
    return surviving.unionByName(updates.select(*target.columns))


def _any_differs(tracked: list[str], left: str, right: str) -> Column:
    """NULL-safe "any tracked attribute differs" predicate."""
    return reduce(
        lambda a, b: a | b,
        [~F.col(f"{left}.{t}").eqNullSafe(F.col(f"{right}.{t}")) for t in tracked],
    )


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    key: str,
    tracked: list[str],
    effective_ts: str,
    from_col: str = "valid_from",
    to_col: str = "valid_to",
    validate: bool = True,
) -> DataFrame:
    """Apply a change batch to a type-2 dimension.

    ``dim`` is the full history (``to_col`` NULL marks current rows);
    ``changes`` carries ``key`` + ``tracked`` attribute values effective at
    ``effective_ts``.  Output = closed history (untouched) ∪ still-current
    rows (unmatched or value-identical) ∪ closed-out changed rows
    (``to_col`` = effective) ∪ new versions ∪ brand-new keys.

    Single full-outer join on ``key`` feeds every branch; the frame is
    persisted for the four selects and unpersisting is the caller's
    choice (``spark.catalog.clearCache()`` sweeps).
    """
    if validate:
        _check_merge_batch(changes, [key], "scd2 changes batch")
    eff = F.lit(effective_ts).cast("timestamp")
    closed_hist = dim.filter(F.col(to_col).isNotNull())
    cur = dim.filter(F.col(to_col).isNull())
    out_cols = [key, *tracked, from_col, to_col]

    # explicit presence indicators: testing `key IS NULL` to detect join
    # misses would silently drop / fabricate rows when the key column
    # itself is nullable (a NULL-key dim row never matches but IS present)
    joined = (
        cur.withColumn("_c", F.lit(1)).alias("c")
        .join(
            changes.withColumn("_u", F.lit(1)).alias("u"),
            F.col(f"c.{key}") == F.col(f"u.{key}"),
            "full_outer",
        )
        .persist()
    )
    c_present = F.col("c._c").isNotNull()
    u_present = F.col("u._u").isNotNull()
    matched = c_present & u_present
    diff = _any_differs(tracked, "c", "u")

    kept = joined.filter(c_present & (~u_present | ~diff)).select(
        [F.col(f"c.{c}") for c in out_cols]
    )
    # in-plan guard (the pack_chunks assert pattern): a change batch
    # whose effective_ts PREDATES an open version's valid_from would
    # close that row with valid_to < valid_from and back-date the new
    # version — silently inverted validity intervals that pit_join can
    # never match.  Fail the job loudly instead.
    eff_guarded = F.coalesce(
        F.assert_true(
            eff >= F.col(f"c.{from_col}"),
            F.lit(
                "scd2_apply: effective_ts predates an open version's "
                "valid_from (late/out-of-order change batch)"
            ),
        ).cast("timestamp"),
        eff,
    )
    closed_now = joined.filter(matched & diff).select(
        F.col(f"c.{key}"),
        *[F.col(f"c.{t}") for t in tracked],
        F.col(f"c.{from_col}"),
        eff_guarded.alias(to_col),
    )
    new_versions = joined.filter(matched & diff).select(
        F.col(f"u.{key}"),
        *[F.col(f"u.{t}") for t in tracked],
        eff.alias(from_col),
        F.lit(None).cast("timestamp").alias(to_col),
    )
    inserts = joined.filter(~c_present).select(
        F.col(f"u.{key}"),
        *[F.col(f"u.{t}") for t in tracked],
        eff.alias(from_col),
        F.lit(None).cast("timestamp").alias(to_col),
    )
    return (
        closed_hist.select(*out_cols)
        .unionByName(kept)
        .unionByName(closed_now)
        .unionByName(new_versions)
        .unionByName(inserts)
    )


def pit_join(
    facts: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    ts_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    how: str = "inner",
) -> DataFrame:
    """Point-in-time join: each fact row matched to the dimension version
    valid at the fact's timestamp (``valid_from <= ts < valid_to``, open
    current version has NULL valid_to).

    This is THE correctness guarantee SCD2 exists for — joining facts to
    the current dim silently rewrites history (training-data leakage /
    restated reports).  Physically it is an equi-join on the dim key with
    a residual range predicate: shuffle keyed on the join key, at most
    |versions-per-key| candidates per fact row, never a cartesian.
    """
    cond = (
        (facts[fact_key] == dim[dim_key])
        & (facts[ts_col] >= dim[valid_from])
        & (dim[valid_to].isNull() | (facts[ts_col] < dim[valid_to]))
    )
    return facts.join(dim, cond, how)
