"""Multi-dimensional data-layout keys (Z-order / Morton curves).

Parquet file skipping works off per-file min/max statistics; sorting by
one column gives that column tight per-file ranges and leaves every
other column's range wide open.  Interleaving the bits of two columns
into a Morton (Z-order) key and range-partitioning on it bounds BOTH
dimensions per file — the technique behind ``OPTIMIZE ZORDER BY`` in
lakehouse table formats, expressed here as plain integer arithmetic so
any engine (and the DuckDB oracle) computes the identical key.

Two pieces:

* :func:`zvalue` — the 32-bit Morton key from two 16-bit dimensions,
  built from ``BITS`` shift/mask/or terms (whole-stage-codegen-able; no
  UDF, no Python).
* :func:`zorder_stats` — the clustering AUDIT: bucket rows by Z-key
  prefix (what a range-partitioned writer would put in one file) and
  report each bucket's per-dimension min/max envelope.  Tight envelopes
  on *both* dimensions = both predicates can skip files.

Scale: the key is row-local (zero shuffle); the audit is one grouped
aggregate on the bucket prefix.  An actual re-layout write is
``df.repartitionByRange(n, zvalue(...)).sortWithinPartitions(...)``
feeding any parquet sink — the stats here are the evidence the layout
is worth the rewrite.
"""

from __future__ import annotations

from functools import reduce
from operator import add

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Bits kept per dimension; the Z-key is 2*BITS wide.
BITS = 16
DIM_MASK = (1 << BITS) - 1


def zvalue(x: Column, y: Column) -> Column:
    """Morton-interleave two non-negative ints (low ``BITS`` bits each):
    bit *i* of ``x`` lands at key bit ``2i``, bit *i* of ``y`` at
    ``2i+1``.  Pure shift/mask arithmetic — identical in any engine."""
    xm = x.cast("long").bitwiseAND(F.lit(DIM_MASK))
    ym = y.cast("long").bitwiseAND(F.lit(DIM_MASK))
    terms = []
    for i in range(BITS):
        terms.append(F.shiftleft(F.shiftright(xm, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(
            F.shiftleft(F.shiftright(ym, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return reduce(add, terms)


def zvalue_sql(x: str, y: str) -> str:
    """The identical Morton key as portable SQL text (for oracles and
    pushdown into engines that take raw SQL)."""
    # every term fully parenthesized: << binds looser than | in some
    # engines (DuckDB), so a bare "a << 1 | b << 3" would chain shifts
    terms = []
    for i in range(BITS):
        terms.append(f"(((({x} & {DIM_MASK}) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((({y} & {DIM_MASK}) >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"


def zorder_stats(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bucket_shift: int = 22,
) -> DataFrame:
    """Audit the Z-order layout: group by the Z-key's high bits (one
    bucket ≈ one file after a range-partitioned write) and report the
    per-bucket envelope of both source dimensions plus the fraction of
    each dimension's global range the bucket spans (lower = better
    skipping)."""
    z = zvalue(F.col(x_col), F.col(y_col))
    d = df.select(
        F.col(x_col).cast("long").bitwiseAND(F.lit(DIM_MASK)).alias("x"),
        F.col(y_col).cast("long").bitwiseAND(F.lit(DIM_MASK)).alias("y"),
        F.shiftright(z, bucket_shift).alias("zbucket"),
    )
    return d.groupBy("zbucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("x").alias("x_min"),
        F.max("x").alias("x_max"),
        F.min("y").alias("y_min"),
        F.max("y").alias("y_max"),
    )
