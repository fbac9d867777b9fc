"""Distributed sketches with cross-engine-exact results.

Sketch operators normally trade exactness for state; that makes them
hard to oracle-check.  The two here are designed so the *sketch output
itself* is deterministic and bit-identical across engines:

* :func:`kmv_distinct` — the K-Minimum-Values distinct-count estimator
  (Bar-Yossef et al. 2002, "Counting distinct elements in a data
  stream").  The hash is md5 (identical hex in every engine) truncated
  to 48 bits, so the k smallest distinct hash values — and therefore
  the estimate ``(k-1) * 2^48 / h_k`` — are a pure function of the
  input set.  DuckDB reproduces the sketch exactly.

* :func:`bloom_semi_join` — a semijoin whose fact side is pre-pruned by
  a Bloom filter built from the key side (Bloom 1970).  Blooms have no
  false negatives, so after the residual exact semijoin the RESULT
  equals a plain semijoin — the filter only changes how many fact rows
  survive to the shuffle.  The oracle is the plain semijoin.

Scale design: KMV's map side emits at most ``k`` rows per Arrow batch
(bounded state, no full-distinct shuffle of the fact table); the Bloom
bitmap is a ~16 KiB map broadcast to every probe task, so at 100 TB the
fact scan discards non-matching rows *before* the semijoin shuffle —
the classic "ship the filter to the data" move Spark's own runtime
bloom (spark.sql.optimizer.runtime.bloomFilter.enabled) automates for
equi-joins; this operator makes the same pattern available explicitly
(cross-source, or under a disabled optimizer).

Reference parity: the reference engine has no sketch surface at all
(its distinct counts are exact QuestDB SQL, views.py); this module is
part of the large-corpus extension family.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: 2^48 — the hash space of the truncated md5 (12 hex chars).
HASH_SPACE = float(1 << 48)


def hash48(col: Column) -> Column:
    """Portable 48-bit hash: first 12 hex chars of md5 of the string
    form.  Identical in Spark, DuckDB, and any engine with md5 —
    the portability is the point (a Spark-private hash like xxhash64
    would make the sketch unverifiable elsewhere)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 12), 16, 10).cast(
        "long"
    )


def kmv_distinct(
    df: DataFrame,
    key_col: str,
    group_col: str | None = None,
    k: int = 64,
) -> DataFrame:
    """KMV distinct-count estimate per group (or globally).

    Two stages:

    1. **Bounded map side** — ``mapInPandas`` keeps, per Arrow batch and
       per group, only the ``k`` smallest distinct hashes.  Any hash in
       the global bottom-k of its group is in its batch's bottom-k, so
       this loses nothing; map output is ≤ k rows per (batch, group) —
       bounded state, no shuffle of the raw fact table.
    2. **Merge** — distinct the surviving (group, hash) pairs, keep each
       group's k smallest via one small window, and fold them into the
       estimator row.

    Estimate: ``(k_used - 1) * 2^48 / h_k`` when the sketch is full;
    a sketch holding fewer than ``k`` hashes has seen every distinct
    value, so the count is exact (the KMV underfull rule).

    Output: ``[group_col?], k_used, kth_hash, est_distinct``.
    """
    from pyspark.sql import Window

    gcols = [group_col] if group_col else []
    # NULL keys drop up front: md5(NULL) -> NULL hash arrives in pandas
    # as float64 NaN, crashing the bigint Arrow schema (and a NULL never
    # counts as a distinct VALUE); NULL GROUPS are kept via
    # dropna=False below — Spark's groupBy reports them
    hashed = df.filter(F.col(key_col).isNotNull()).select(
        *gcols, hash48(F.col(key_col)).alias("h")
    )

    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in hashed.schema.fields]
    )

    def batch_kmin(batches):
        for pdf in batches:
            if group_col:
                yield (
                    pdf.drop_duplicates()
                    .sort_values("h", kind="stable")
                    .groupby(group_col, sort=False, dropna=False)
                    .head(k)
                )
            else:
                yield pdf.drop_duplicates().nsmallest(k, "h")

    survivors = hashed.mapInPandas(batch_kmin, schema=out_schema).distinct()

    if group_col:
        w = Window.partitionBy(group_col).orderBy("h")
    else:
        w = Window.orderBy("h")  # merge set is ≤ k * n_batches rows: tiny
    topk = survivors.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )
    agg = topk.groupBy(*gcols).agg(
        F.count(F.lit(1)).alias("k_used"), F.max("h").alias("kth_hash")
    )
    full = F.col("k_used") >= k
    est = F.when(
        full, (F.col("k_used") - 1).cast("double") * F.lit(HASH_SPACE) / F.col("kth_hash")
    ).otherwise(F.col("k_used").cast("double"))
    return agg.withColumn("est_distinct", F.round(est, 4))


#: Bloom geometry: m bits in 64-bit words, n_hashes salted md5 probes.
BLOOM_BITS = 1 << 16
BLOOM_HASHES = 3


def _bloom_positions(key: Column) -> list[Column]:
    return [
        hash48(F.concat(F.lit(f"bloom{i}:"), key.cast("string")))
        % F.lit(BLOOM_BITS)
        for i in range(BLOOM_HASHES)
    ]


def bloom_build(keys: DataFrame, key_col: str) -> DataFrame:
    """Fold the key side into a one-row bitmap: ``{word_index: word}``
    map over ``BLOOM_BITS`` bits.  ~16 KiB regardless of key count —
    always broadcastable."""
    pos = F.explode(F.array(*_bloom_positions(F.col(key_col)))).alias("pos")
    words = (
        # NULL keys filter out: md5(NULL) -> NULL positions -> NULL map
        # key ("Cannot use null as map key" kills the job), and a NULL
        # key can never match the residual semijoin anyway
        keys.filter(F.col(key_col).isNotNull()).select(pos)
        .select(
            (F.col("pos") / 64).cast("int").alias("word_idx"),
            F.expr("shiftleft(1L, CAST(pos % 64 AS INT))").alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("word"))
    )
    return words.agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("word_idx", "word")))
        ).alias("bloom")
    )


def bloom_semi_join(
    fact: DataFrame,
    keys: DataFrame,
    fact_key: str,
    keys_key: str,
) -> DataFrame:
    """Semijoin ``fact`` to ``keys`` with a Bloom pre-prune of the fact
    side.

    The bitmap rides a broadcast crossJoin (one row — the engine's
    broadcast-scalar-stats pattern); a fact row survives to the residual
    exact semijoin only if all ``BLOOM_HASHES`` probe bits are set.  No
    false negatives ⇒ result identical to ``fact ⋉ keys``; the point is
    the *plan*: at scale the residual semijoin's shuffle carries only
    ``selectivity + false-positive-rate`` of the fact table instead of
    all of it.
    """
    bitmap = bloom_build(keys, keys_key)
    probed = fact.crossJoin(F.broadcast(bitmap))
    hits = []
    for i, p in enumerate(_bloom_positions(F.col(fact_key))):
        probed = probed.withColumn(f"__pos{i}", p)
        word = F.coalesce(
            F.element_at(
                F.col("bloom"), (F.col(f"__pos{i}") / 64).cast("int")
            ),
            F.lit(0).cast("long"),
        )
        mask = F.expr(f"shiftleft(1L, CAST(__pos{i} % 64 AS INT))")
        hits.append(word.bitwiseAND(mask) != 0)
    candidates = probed.filter(reduce(Column.__and__, hits)).drop(
        "bloom", *[f"__pos{i}" for i in range(BLOOM_HASHES)]
    )
    # residual exact semijoin: kills Bloom false positives; its shuffle
    # input is the pruned candidate set, not the full fact table
    return candidates.join(
        keys.select(F.col(keys_key).alias("__k")).distinct(),
        candidates[fact_key] == F.col("__k"),
        "left_semi",
    )


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005)
# ---------------------------------------------------------------------------

#: Sketch geometry: depth d salted hash rows x width w counters.
CM_DEPTH = 3
CM_WIDTH = 1024


def _cm_pos(key: Column, d: int) -> Column:
    return hash48(F.concat(F.lit(f"cm{d}:"), key.cast("string"))) % F.lit(
        CM_WIDTH
    )


def countmin_build(df: DataFrame, key_col: str) -> DataFrame:
    """Aggregate the stream into the ``CM_DEPTH x CM_WIDTH`` counter
    grid: one explode to (depth, pos) then a grouped count.  The shuffle
    carries at most ``depth * width`` partial counters per map task —
    bounded by the sketch geometry, independent of key cardinality (the
    point: a keyed count of a billion-key stream shuffles billions of
    partials; the sketch shuffles 3072)."""
    cells = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(d).alias("d"),
                    _cm_pos(F.col(key_col), d).alias("pos"),
                )
                for d in range(CM_DEPTH)
            ]
        )
    ).alias("cell")
    return (
        # NULL keys are excluded from the sketch (md5(NULL) -> NULL pos
        # would later become a NULL map key in countmin_estimate and
        # kill the job); count NULL occurrences with a plain conditional
        # aggregate if needed — a sketch cell cannot address them
        df.filter(F.col(key_col).isNotNull())
        .select(cells)
        .select("cell.d", "cell.pos")
        .groupBy("d", "pos")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def countmin_estimate(
    sketch: DataFrame, candidates: DataFrame, key_col: str
) -> DataFrame:
    """Point-query the sketch for every candidate key: the estimate is
    the MIN over depths of the addressed counters (each row of the grid
    overestimates by its collisions; the min is the tightest).  The
    sketch folds to a single broadcast map keyed ``d * width + pos`` —
    ≤ 3072 entries, a few KiB.

    Count-Min guarantees ``true ≤ est ≤ true + eps * N`` w.h.p.;
    both bounds are deterministic here because the salted md5 hashes
    are — DuckDB rebuilds the identical grid and estimates.
    """
    as_map = sketch.agg(
        F.map_from_entries(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        (F.col("d") * CM_WIDTH + F.col("pos")).alias("k"),
                        F.col("c").alias("v"),
                    )
                )
            )
        ).alias("cm")
    )
    out = candidates.crossJoin(F.broadcast(as_map))
    est = F.least(
        *[
            F.coalesce(
                F.element_at(
                    F.col("cm"),
                    (F.lit(d * CM_WIDTH) + _cm_pos(F.col(key_col), d)).cast(
                        "long"
                    ),
                ),
                F.lit(0).cast("long"),
            )
            for d in range(CM_DEPTH)
        ]
    )
    return out.withColumn("est_count", est).drop("cm")


# ---------------------------------------------------------------------------
# Histogram sketch quantiles (equi-width; the bounded-state percentile)
# ---------------------------------------------------------------------------

HIST_BINS = 1024


def hist_quantiles(
    df: DataFrame,
    value_col: str,
    group_col: str,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Approximate quantiles from an equi-width histogram.

    The exact ``percentile`` buffers every value per group; this sketch
    shuffles ≤ ``HIST_BINS`` partial counters per (group, map task) —
    the bounded-state path the winsorize/percentile family swaps to at
    100 TB.  Estimate: find the bin where the cumulative count crosses
    ``q * n`` and interpolate linearly inside it; error ≤ one bin width
    of the global range.  Every step is plain arithmetic on integers
    and doubles, so (unlike t-digest/GK sketches) the estimate is
    deterministic and engine-portable — the DuckDB oracle reproduces it
    exactly.

    Output: (group, q, n, est).
    """
    from pyspark.sql import Window

    stats = df.agg(
        F.min(value_col).alias("__vmin"), F.max(value_col).alias("__vmax")
    )
    d = (
        df.select(F.col(group_col).alias("grp"), F.col(value_col).alias("v"))
        # drop NULLs BEFORE binning: F.least SKIPS nulls, so a NULL value
        # would bin as least(NULL, max_bin) = max_bin — every NULL row
        # counted as a top-of-range observation, skewing the quantiles
        # where the exact percentile (and the oracle) ignore NULLs
        .filter(F.col("v").isNotNull())
        .crossJoin(F.broadcast(stats))
    )
    width = (F.col("__vmax") - F.col("__vmin")) / F.lit(float(HIST_BINS))
    bin_ = F.least(
        F.floor((F.col("v") - F.col("__vmin")) / width), F.lit(HIST_BINS - 1)
    ).cast("int")
    counts = (
        d.withColumn("bin", bin_)
        .groupBy("grp", "bin")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.first("__vmin").alias("__vmin"),
            F.first("__vmax").alias("__vmax"),
        )
    )
    wcum = (
        Window.partitionBy("grp")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    counts = counts.withColumn("cum", F.sum("c").over(wcum)).withColumn(
        "n", F.sum("c").over(Window.partitionBy("grp"))
    )
    qlit = F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q")
    per_q = counts.select("*", qlit).filter(
        F.col("cum") >= F.col("q") * F.col("n")
    )
    wpick = Window.partitionBy("grp", "q").orderBy("bin")
    pick = per_q.withColumn("rn", F.row_number().over(wpick)).filter(
        F.col("rn") == 1
    )
    width_o = (F.col("__vmax") - F.col("__vmin")) / F.lit(float(HIST_BINS))
    frac = (F.col("q") * F.col("n") - (F.col("cum") - F.col("c"))) / F.col("c")
    est = F.col("__vmin") + width_o * (F.col("bin") + frac)
    return pick.select(
        F.col("grp"), "q", "n", F.round(est, 6).alias("est")
    )
