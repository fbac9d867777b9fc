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
    ``2i+1``.  The 2-D special case of :func:`zvalue_n` (one
    implementation — the bit layout matches because dimension *d* of
    *n* lands at ``i*n + d``)."""
    return zvalue_n([x, y], BITS)


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


def zvalue_n(cols: list[Column], bits: int) -> Column:
    """Morton-interleave ``n`` non-negative ints, ``bits`` low bits each
    (bit *i* of dimension *d* lands at key bit ``i*n + d``).  The caller
    bounds ``n*bits`` ≤ 60 so the key stays a positive long.  Same pure
    shift/mask arithmetic as :func:`zvalue` — codegen-able, no Python."""
    n = len(cols)
    mask = (1 << bits) - 1
    terms = []
    for d, c in enumerate(cols):
        cm = c.cast("long").bitwiseAND(F.lit(mask))
        for i in range(bits):
            terms.append(
                F.shiftleft(F.shiftright(cm, i).bitwiseAND(F.lit(1)), i * n + d)
            )
    return reduce(add, terms)


#: Quantile-mode resolution: 2**QBITS rank buckets per dimension.
QBITS = 8


def zorder_codes(
    df: DataFrame,
    cols: list[str],
    bits: int,
    mode: str = "quantile",
    stats: dict | None = None,
) -> tuple[list[Column], dict]:
    """Per-column fixed-point codes for Z-ordering.

    ``mode="quantile"`` (default, the skew-robust rank coding lakehouse
    optimizers use): each value's code is its approximate rank bucket —
    ``2**QBITS`` equi-DEPTH buckets from one ``percentile_approx`` pass,
    so every bucket holds ~the same row mass no matter how heavy the
    tail (measured on sf0.1 events.value: second-dimension file-skip
    0.16 min-max → 0.66 quantile; a single outlier cannot compress
    everyone else's codes).  The bucket lookup is a literal-array HOF
    fold (JVM-side, ~2**QBITS comparisons per row — write-time only).

    ``mode="minmax"``: linear scaling between the global min/max — one
    cheaper aggregate, full ``bits`` resolution, right for layout keys
    already near-uniform (ids, bounded timestamps).

    Either way: one aggregate over the frame collecting a model-sized
    handful of scalars per column; the code expressions are row-local;
    NULLs code to 0 (they cluster at the curve's origin).  Returns
    (code columns, per-column stats to re-code consistent incremental
    appends).  The layout only affects WHERE rows land, never results.

    Pass a previous call's ``stats`` back in to FREEZE the coding: the
    aggregate is skipped and an incremental append lands in the same key
    space as the standing layout (``mode`` is taken from the stats).
    Per-column values live under the ``"cols"`` key so a column named
    ``mode`` can never collide with the mode marker.
    """
    if stats is not None:
        mode = stats["mode"]
    top = (1 << bits) - 1
    codes: list[Column] = []
    col_stats: dict = {}
    out_stats: dict = {"mode": mode, "cols": col_stats}
    if mode == "quantile":
        shift = bits - QBITS
        if stats is None:
            n_buckets = 1 << QBITS
            probs = [i / n_buckets for i in range(1, n_buckets)]
            prob_sql = ", ".join(repr(p) for p in probs)
            aggs = [
                F.expr(
                    f"percentile_approx(cast(`{c}` as double), array({prob_sql}))"
                ).alias(f"_q_{c}")
                for c in cols
            ]
            row = df.agg(*aggs).first()
            frozen = {c: row[f"_q_{c}"] for c in cols}
        else:
            frozen = stats["cols"]
        for c in cols:
            bnds = frozen[c]
            col_stats[c] = bnds
            if bnds is None:
                codes.append(F.lit(0).cast("long"))  # all-NULL dim
                continue
            # code = (#boundaries <= v) spread over the full bit width
            count_le = F.aggregate(
                F.lit(bnds),
                F.lit(0).cast("long"),
                lambda acc, b: acc
                + F.when(F.col(c).cast("double") >= b, 1).otherwise(0),
            )
            spread = (
                F.shiftleft(count_le, shift)
                if shift >= 0
                else F.shiftright(count_le, -shift)  # >7 dims: fewer bits
            )
            codes.append(F.coalesce(spread, F.lit(0)).cast("long"))
        return codes, out_stats
    if mode != "minmax":
        raise ValueError(f"unknown zorder code mode: {mode!r}")
    if stats is None:
        aggs = []
        for c in cols:
            aggs += [
                F.min(F.col(c).cast("double")).alias(f"_lo_{c}"),
                F.max(F.col(c).cast("double")).alias(f"_hi_{c}"),
            ]
        row = df.agg(*aggs).first()
        frozen = {c: (row[f"_lo_{c}"], row[f"_hi_{c}"]) for c in cols}
    else:
        frozen = stats["cols"]
    for c in cols:
        lo, hi = frozen[c]
        col_stats[c] = (lo, hi)
        if lo is None or hi is None or hi <= lo:
            codes.append(F.lit(0).cast("long"))  # constant/all-NULL dim
            continue
        scaled = F.floor(
            (F.col(c).cast("double") - F.lit(lo))
            / F.lit(hi - lo)
            * F.lit(float(top))
        )
        codes.append(
            F.coalesce(
                F.greatest(F.lit(0), F.least(F.lit(top), scaled)), F.lit(0)
            ).cast("long")
        )
    return codes, out_stats


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_cols: list[str],
    n_files: int,
    zonemap: bool = True,
    mode: str = "overwrite",
    code_mode: str = "quantile",
    partition_cols: list[str] | None = None,
    stats: dict | None = None,
) -> dict:
    """The actual multi-dimensional re-layout write — ``OPTIMIZE ZORDER
    BY`` for the plain-parquet dataset layer.

    Rows are range-partitioned on the Morton key of the coded
    ``zorder_cols`` (``code_mode``: skew-robust rank buckets by default,
    ``"minmax"`` for near-uniform keys — :func:`zorder_codes`) and
    sorted by it within each file, so every file
    covers a small hyper-rectangle of the key space: per-file min/max
    statistics are tight on EVERY z-ordered column at once, and both the
    zone-map sidecar and parquet row-group pruning can skip on any of
    them — where a linear sort serves only its leading column.  Plan
    shape: ONE range exchange (boundary sampling included) + local
    sort; the key is pure shift/mask arithmetic inside codegen.

    Writes with ``maxRecordsPerFile`` unset — ``n_files`` range
    partitions become n_files files (one per task).  Returns the coding
    stats (persist them and pass back as ``stats=`` so incremental
    appends land in the SAME key space — otherwise each append re-draws
    its own quantiles and the layouts drift apart).  ``zonemap=True``
    builds the zone-map sidecar over ``zorder_cols`` so file-level
    skipping works immediately.

    ``partition_cols`` composes the layout with Hive partitioning: the
    range runs on (partition_cols..., zkey), so files WITHIN each
    partition directory are z-clustered and directory pruning still
    comes first — the shape :func:`dataset.compact_dataset` uses to
    restore layout on a partitioned store."""
    bits = min(BITS, 60 // max(1, len(zorder_cols)))
    codes, stats = zorder_codes(
        df, zorder_cols, bits, mode=code_mode, stats=stats
    )
    pcols = partition_cols or []
    keyed = df.withColumn("_zkey", zvalue_n(codes, bits))
    out = (
        keyed.repartitionByRange(n_files, *pcols, "_zkey")
        .sortWithinPartitions(*pcols, "_zkey")
        .drop("_zkey")
    )
    # same INT96 trap as write_sharded: stats-less timestamps would
    # defeat the very pruning the layout exists for
    df.sparkSession.conf.set(
        "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
    )
    writer = out.write.mode(mode)
    if pcols:
        writer = writer.partitionBy(*pcols)
    writer.parquet(path)
    if zonemap:
        from big_data_engineering_financial_analysis_spark.sources.zonemap import update_zonemap

        # update, not build: build_zonemap would rewrite the manifest to
        # cover ONLY zorder_cols, silently dropping a standing manifest's
        # coverage of other columns on an append or re-layout (advice
        # r9).  update unions wanted columns with the manifest's
        # standing coverage, scans only uncovered files, and drops
        # entries for files an overwrite deleted — on a fresh path it
        # degenerates to exactly the build.
        update_zonemap(path, zorder_cols)
    return stats


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
