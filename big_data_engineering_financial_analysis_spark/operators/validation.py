"""Data-quality validation: declarative expectation checks as aggregates.

A pipeline engine that feeds training runs and dashboards needs to ASSERT
its inputs, not assume them.  Each check compiles to a conditional
aggregate over one scan (count of violating rows / count checked), and
referential checks compile to anti-join counts — so a full table audit is
one job, map-side combined, with no row ever leaving the executors.

Check types (all expressible against the DuckDB oracle):

  not_null(col)             NULL count
  in_range(col, lo, hi)     out-of-range count (NULLs don't violate)
  unique(cols)              rows beyond the first per duplicate key group
  accepted(col, values)     domain-violation count
  ref_integrity(fk -> pk)   child rows with no parent (anti-join count)

The report is a tall frame (check, n_violations, n_checked) — the shape
monitoring systems ingest.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _agg_check(df: DataFrame, name: str, violation: Column, checked: Column) -> DataFrame:
    # coalesce: SUM over zero rows is NULL, but an empty table has 0
    # violations / 0 checked (count(*) FILTER semantics, what monitoring
    # consumers of the report expect)
    return df.agg(
        F.lit(name).alias("check"),
        F.coalesce(F.sum(violation.cast("long")), F.lit(0)).alias("n_violations"),
        F.coalesce(F.sum(checked.cast("long")), F.lit(0)).alias("n_checked"),
    )


def check_not_null(df: DataFrame, col: str) -> DataFrame:
    return _agg_check(df, f"not_null:{col}", F.col(col).isNull(), F.lit(True))


def check_in_range(df: DataFrame, col: str, lo: float, hi: float) -> DataFrame:
    c = F.col(col)
    viol = c.isNotNull() & ((c < lo) | (c > hi))
    return _agg_check(df, f"in_range:{col}", viol, c.isNotNull())


def check_accepted(df: DataFrame, col: str, values: list) -> DataFrame:
    c = F.col(col)
    viol = c.isNotNull() & ~c.isin(values)
    return _agg_check(df, f"accepted:{col}", viol, c.isNotNull())


def check_unique(df: DataFrame, cols: list[str]) -> DataFrame:
    """Violations = rows in excess of one per fully-non-NULL key group.

    ``count_distinct`` drops rows with a NULL in any key column, so the
    excess must be computed against the same population — otherwise every
    NULL-keyed row would be misreported as a duplicate (SQL semantics: a
    NULL key is not equal to anything, including itself; pair it with
    :func:`check_not_null` to police NULL keys separately)."""
    keyed = None
    for c in cols:
        cond = F.col(c).isNotNull()
        keyed = cond if keyed is None else (keyed & cond)
    return df.agg(
        F.lit(f"unique:{','.join(cols)}").alias("check"),
        (
            F.coalesce(F.sum(keyed.cast("long")), F.lit(0))
            - F.count_distinct(*[F.col(c) for c in cols])
        ).alias("n_violations"),
        F.coalesce(F.sum(keyed.cast("long")), F.lit(0)).alias("n_checked"),
    )


def check_ref_integrity(
    child: DataFrame, fk: str, parent: DataFrame, pk: str
) -> DataFrame:
    """Orphan children: anti-join on the parent key.  The orphan count and
    the checked count ride one aggregate over the anti-join output plus a
    count of the child — two jobs only because they scan different frames.

    NULL foreign keys are NOT violations (SQL MATCH SIMPLE semantics) and
    are excluded from both counts — the module convention polices NULL
    keys separately via ``check_not_null`` (see ``check_unique``)."""
    non_null = child.filter(F.col(fk).isNotNull())
    orphans = non_null.join(
        parent.select(F.col(pk).alias(fk)).distinct(), fk, "left_anti"
    )
    n_checked = non_null.select(F.count(F.lit(1)).alias("n"))
    return (
        orphans.agg(F.count(F.lit(1)).alias("n_violations"))
        .crossJoin(F.broadcast(n_checked))
        .select(
            F.lit(f"ref:{fk}").alias("check"),
            F.col("n_violations").cast("long"),
            F.col("n").cast("long").alias("n_checked"),
        )
    )


def quality_report(checks: list[DataFrame]) -> DataFrame:
    """Union the per-check single-row frames into the tall report."""
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out
