"""Distribution-drift detection: Population Stability Index (PSI).

The standard monitoring statistic for "has this feature's distribution
moved between the reference window and now":

  PSI = Σ_bins (p_i - q_i) * ln(p_i / q_i)

with the usual read: < 0.1 stable, 0.1-0.2 moderate shift, > 0.2 drift.
Bins are fixed-width over the GLOBAL observed range (one min/max
aggregate, broadcast back — the same scalar-stats crossJoin pattern as
the engine's other normalizations), and proportions are smoothed with
+0.5 per bin so empty bins stay finite (Laplace, mirroring the LM
module's convention).

Determinism: the per-group PSI folds its 10 bin terms in bin order
(``aggregate(array_sort(collect_list(struct(bin, term))))`` ↔ DuckDB
``list_reduce(list(term ORDER BY bin))``), so the statistic is
bit-identical across engines and partitionings.

Scale: two scans (or one with a period column), grouped counts keyed on
(group, period, bin) — combiner output bounded by groups x 2 x bins.
Everything after the counts is bin-table-sized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_BINS = 10
PSI_DRIFT_THRESHOLD = 0.2


def psi_report(
    df: DataFrame,
    value_col: str,
    period_col: Column,
    group_col: str,
) -> DataFrame:
    """PSI per group between the two periods named by ``period_col``
    (must evaluate to 'ref' / 'cur').  Output:
    (group, n_ref, n_cur, psi, drift)."""
    stats = df.agg(
        F.min(value_col).alias("__vmin"), F.max(value_col).alias("__vmax")
    )
    d = (
        df.select(
            F.col(group_col).alias("grp"),
            period_col.alias("period"),
            F.col(value_col).alias("v"),
        )
        # NULL values drop before binning (F.least skips nulls, so they
        # would count as TOP-BIN mass — a null-rate change between
        # periods must not masquerade as top-of-range value drift);
        # monitor null rates with validation.check_not_null instead
        .filter(F.col("v").isNotNull())
        .crossJoin(F.broadcast(stats))
    )
    width = (F.col("__vmax") - F.col("__vmin")) / F.lit(float(N_BINS))
    bin_ = F.least(
        F.floor((F.col("v") - F.col("__vmin")) / width), F.lit(N_BINS - 1)
    ).cast("int")
    counts = (
        d.withColumn("bin", bin_)
        .groupBy("grp", "period", "bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # dense bin grid so empty bins participate (smoothed) in the sum
    grid = (
        counts.select("grp")
        .distinct()
        .select(
            "grp", F.explode(F.sequence(F.lit(0), F.lit(N_BINS - 1))).alias("bin")
        )
    )
    ref = counts.filter(F.col("period") == "ref").select(
        "grp", "bin", F.col("c").alias("c_ref")
    )
    cur = counts.filter(F.col("period") == "cur").select(
        "grp", "bin", F.col("c").alias("c_cur")
    )
    g = (
        grid.join(ref, ["grp", "bin"], "left")
        .join(cur, ["grp", "bin"], "left")
        .select(
            "grp",
            "bin",
            F.coalesce("c_ref", F.lit(0)).alias("c_ref"),
            F.coalesce("c_cur", F.lit(0)).alias("c_cur"),
        )
    )
    tot = g.groupBy("grp").agg(
        F.sum("c_ref").alias("n_ref"), F.sum("c_cur").alias("n_cur")
    )
    g = g.join(tot, "grp")
    p = (F.col("c_ref") + F.lit(0.5)) / (
        F.col("n_ref") + F.lit(float(N_BINS) * 0.5)
    )
    q = (F.col("c_cur") + F.lit(0.5)) / (
        F.col("n_cur") + F.lit(float(N_BINS) * 0.5)
    )
    g = g.withColumn("term", (p - q) * F.log(p / q))
    out = g.groupBy("grp", "n_ref", "n_cur").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("bin", "term"))),
            F.lit(0.0),
            lambda acc, x: acc + x["term"],
        ).alias("psi")
    )
    return out.select(
        F.col("grp"),
        "n_ref",
        "n_cur",
        F.round("psi", 6).alias("psi"),
        (F.col("psi") > PSI_DRIFT_THRESHOLD).cast("int").alias("drift"),
    )
