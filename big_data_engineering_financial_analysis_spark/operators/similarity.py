"""Similarity search over embedding columns (array<float>).

Two paths, mirroring what a 100 TB ANN pipeline needs:

* :func:`cosine_topk` — exact brute force: broadcast the (small) query set
  against the corpus, compute cosine JVM-side, per-query top-k via window
  rank.  O(|corpus| x |queries|) but perfectly distributed; the baseline
  and the verifier for approximate variants.
* :func:`lsh_ann_topk` — sign-LSH (random hyperplanes): bucket corpus and
  queries by the sign pattern of projections onto deterministic
  hyperplanes, search only the matching bucket.  Cuts the candidate set by
  ~2^n_planes at the cost of recall; hyperplanes are md5-derived constants
  (functions/hashing.py) so the DuckDB oracle reproduces the buckets
  exactly.

All dot products are sequential left-folds (zip_with + aggregate) so the
floats — and therefore orderings and threshold cuts — are bit-identical in
the SQL oracle (list_zip + list_reduce).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from big_data_engineering_financial_analysis_spark.functions.hashing import (
    double_array_literal,
    hyperplanes,
)
from big_data_engineering_financial_analysis_spark.operators.partitioning import spread

DEFAULT_K = 10

#: Per-(table, bucket) membership cap for the sign-LSH dedup join — same
#: rationale and semantics as operators/dedup.DEFAULT_BUCKET_CAP: a hot
#: bucket on an adversarial corpus emits O(m²) candidates and stragglers
#: the join; keeping the cap smallest ids bounds it at cap², mirrored in
#: the oracle via QUALIFY row_number().
DEFAULT_BUCKET_CAP = 1000


def _dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (DuckDB twin:
    ``list_reduce(list_transform(list_zip(a, b), x -> x[1]*x[2]), (s,x) -> s+x)``)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def with_norm(df: DataFrame, vec_col: str = "embedding", out: str = "norm") -> DataFrame:
    v = F.col(vec_col).cast("array<double>")
    return df.withColumn(out, F.sqrt(_dot(v, v)))


def random_projection(
    df: DataFrame,
    out_dim: int,
    vec_col: str = "embedding",
    out_col: str = "proj",
    dim: int = 64,
    scale: float | None = None,
) -> DataFrame:
    """Johnson-Lindenstrauss random projection: map each vector onto
    ``out_dim`` deterministic md5-derived directions — the standard
    dimensionality-reduction step before ANN/clustering when the source
    embeddings are wider than the search needs (pairwise distances are
    preserved within ~sqrt(log n / out_dim) distortion).

    ONE ``transform`` lambda over an array-of-arrays direction literal
    (the one-lambda codegen rule); projections are scaled by
    ``1/sqrt(out_dim)`` by default so squared norms are comparable across
    output widths.  Row-local, no shuffle; the directions regenerate
    identically anywhere, so projected tables built on different clusters
    (or in the DuckDB oracle) agree bit-for-bit.
    """
    s = scale if scale is not None else 1.0 / (out_dim ** 0.5)
    dirs = hyperplanes(out_dim, dim)
    darr = double_array_literal(dirs)
    v = F.col(vec_col).cast("array<double>")
    return df.withColumn(
        out_col, F.transform(darr, lambda p: _dot(v, p) * F.lit(s))
    )


def cosine(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    return _dot(a, b) / F.nullif(norm_a * norm_b, F.lit(0.0))


def _query_struct_literal(rows: list[tuple], fields: list[tuple[str, str]]) -> Column:
    """Array-of-structs literal from collected query rows — the r13 ANN
    query-side shape shared by :func:`lsh_ann_topk` and
    :func:`ivf_ann_topk`.

    The query set is a handful of rows whose features (norms, bucket
    keys, centroid distances) Spark itself computed with the exact corpus
    expressions, so re-entering the plan as a LITERAL loses no precision
    and costs no job: vs the r12 ``createDataFrame`` driver relations it
    removes the py4j row upload and the broadcast build entirely, and vs
    the pre-r12 lazy derivation it removes one broadcast-materialization
    job per reference.  Every field is cast explicitly so NULLs and
    mixed-width literals can never splinter the element type.  An EMPTY
    query set yields a typed NULL array — ``explode`` of it is an empty
    frame with the right schema, preserving the absent-query-id contract.

    The whole array ships as ONE parsed SQL expression rather than
    per-field py4j ``F.lit`` calls (measured 0.33 s per construction for
    5 query structs the py4j way); every scalar is formatted exactly —
    doubles via :func:`..functions.hashing.sql_double_literal`'s
    repr/parseDouble round-trip, strings escaped, everything cast to the
    declared field type.
    """
    from big_data_engineering_financial_analysis_spark.functions.hashing import (
        sql_double_literal,
    )

    ddl = "array<struct<" + ",".join(f"{n}:{t}" for n, t in fields) + ">>"
    if not rows:
        return F.lit(None).cast(ddl)

    def fmt(v, t: str) -> str:
        t = t.strip()
        if v is None:
            return f"CAST(NULL AS {t})"
        if t.startswith("array<"):
            inner = t[6:-1]
            if not len(v):
                return f"CAST(array() AS {t})"
            return "array(" + ",".join(fmt(x, inner) for x in v) + ")"
        if t == "double":
            return sql_double_literal(v)
        if t == "string":
            s = str(v).replace("\\", "\\\\").replace("'", "\\'")
            return f"'{s}'"
        return f"CAST({int(v)} AS {t})"  # integral field types

    return F.expr(
        "array("
        + ",".join(
            "named_struct("
            + ",".join(
                f"'{n}',{fmt(v, t)}" for v, (n, t) in zip(vals, fields)
            )
            + ")"
            for vals in rows
        )
        + ")"
    )


def _explode_score_topk(
    c: DataFrame, matches: Column, id_col: str, k: int
) -> DataFrame:
    """Shared scoring tail of the literal-probe ANN entry points: explode the
    per-row matching-query structs (``matches`` — computed row-locally
    against the query literal, so candidate generation needs NO join, NO
    distinct and NO broadcast), exact-fold cosine per (row, query), then
    the per-query top-k rank.  The ONLY exchange in the whole plan is the
    final tiny rank window; the corpus is scanned exactly once."""
    scored = (
        c.select(F.col(id_col), "vec", "norm", F.explode(matches).alias("_q"))
        .select(
            F.col("_q.query_id").alias("query_id"),
            F.col(id_col),
            "vec",
            "norm",
            F.col("_q.qvec").alias("qvec"),
            F.col("_q.qnorm").alias("qnorm"),
        )
        .withColumn(
            "cos_sim", cosine(F.col("vec"), F.col("qvec"), F.col("norm"), F.col("qnorm"))
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round("cos_sim", 6).alias("cos_sim"),
            "rank",
        )
    )


def cosine_topk(
    corpus: DataFrame,
    query_ids: list[int],
    k: int = DEFAULT_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    The query side is a handful of rows -> broadcast nested-loop join, so
    the corpus is scanned once with no shuffle; the only exchange is the
    per-query top-k rank (tiny).  Deterministic ordering: (cosine desc, id).

    Deliberately kept on the r12 lazy-broadcast shape (r13 note): the
    literal-probe rework that fixed lsh/ivf was measured SLOWER here —
    brute force has no per-row bucket/cell features to reuse, so the
    collect job + literal plan-analysis overhead buys nothing the tiny
    broadcast didn't already do, and this query never regressed.
    """
    c = corpus.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("vec")
    )
    # broadcast-join output inherits the corpus partitioning; small-file
    # corpora are a single partition, which would serialize all the dot
    # products onto one task (no-op on well-partitioned corpora)
    c = spread(c)
    # the normed corpus feeds both the query extraction and the scored scan
    c = with_norm(c, "vec").persist()
    q = c.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("norm").alias("qnorm"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col("query_id"))
        .withColumn(
            "cos_sim", cosine(F.col("vec"), F.col("qvec"), F.col("norm"), F.col("qnorm"))
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col(id_col).alias("neighbor_id"), F.round("cos_sim", 6).alias("cos_sim"), "rank")
    )


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign pattern of projections onto the hyperplanes, as a bit string.

    ONE ``transform`` lambda over an array-of-arrays plane literal rather
    than one fold expression per plane: generated-code size stays constant
    in the plane count (see :func:`_cell_scores` for the measurement that
    motivated this shape).  The literal ships as one parsed SQL string
    (:func:`double_array_literal`) — py4j per-scalar construction was the
    dominant ANN query-construction cost (r13).
    """
    parr = double_array_literal(planes)
    return F.array_join(
        F.transform(
            parr,
            lambda p: F.when(_dot(vec, p) > 0, F.lit("1")).otherwise(F.lit("0")),
        ),
        "",
    )


DEFAULT_TABLES = 4
DEFAULT_PLANES_PER_TABLE = 4


def lsh_ann_topk(
    corpus: DataFrame,
    query_ids: list[int],
    k: int = DEFAULT_K,
    n_tables: int = DEFAULT_TABLES,
    planes_per_table: int = DEFAULT_PLANES_PER_TABLE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k via multi-table sign-LSH.

    L independent hash tables of p hyperplanes each: a corpus vector is a
    candidate if it collides with the query in ANY table — the standard
    recall amplifier (P[candidate] = 1 - (1 - s^p)^L for cosine similarity
    angle-prob s).

    Plan shape (r13): the query rows are collected ONCE from the
    persisted corpus frame — Spark computed their bucket keys with the
    exact corpus expression, so no arithmetic is re-derived driver-side —
    and the (query_id, buckets, vector) structs re-enter the plan as a
    literal (:func:`_query_struct_literal`).  Each corpus row then
    matches queries ROW-LOCALLY (same-table bucket equality over the
    literal), which replaces the r12 exploded-bucket broadcast join +
    candidate ``distinct`` + corpus re-join: the corpus is scanned once,
    candidate generation shuffles nothing, and the only exchange is the
    final top-k rank.  At ingest scale the exploded (table, bucket)
    corpus table is still what you'd persist (partitioned by
    (table, bucket)); this entry point serves a SMALL query set, where
    the literal probe is strictly cheaper at any corpus size.
    """
    all_planes = hyperplanes(n_tables * planes_per_table, dim)
    id_ddl = corpus.schema[id_col].dataType.simpleString()
    base = corpus.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("vec"))
    buckets = F.array(
        *[
            lsh_bucket(
                F.col("vec"),
                all_planes[t * planes_per_table : (t + 1) * planes_per_table],
            )
            for t in range(n_tables)
        ]
    )
    # the per-row bucket array lives INSIDE the persisted frame (r12
    # convention, callers own the lifetime): the cache is the shared
    # materialization for the query-row collect and the scored scan, and
    # the InMemoryRelation boundary pins the 16 hyperplane folds to ONE
    # evaluation per corpus row — a plain projected alias would be
    # inlined (CollapseProject) into the per-query match lambda below
    # and re-fold once per query element.
    c = (
        with_norm(spread(base), "vec")
        .withColumn("rb", buckets)
        .persist()
    )
    q_rows = (
        c.filter(F.col(id_col).isin(query_ids))
        .select(id_col, "vec", "norm", F.col("rb").alias("qb"))
        .collect()
    )
    q_arr = _query_struct_literal(
        [(r[id_col], r["qb"], r["vec"], r["norm"]) for r in q_rows],
        [
            ("query_id", id_ddl),
            ("qb", "array<string>"),
            ("qvec", "array<double>"),
            ("qnorm", "double"),
        ],
    )
    # candidate iff same-table bucket equality in ANY of the L tables —
    # exactly the old exploded equi-join's match set, deduped by
    # construction (one struct per query), so no distinct is needed
    matches = F.filter(
        q_arr,
        lambda q: (F.col(id_col) != q["query_id"])
        & F.exists(
            F.zip_with(F.col("rb"), q["qb"], lambda a, b: a == b),
            lambda x: x,
        ),
    )
    return _explode_score_topk(c, matches, id_col, k)


DEFAULT_IVF_CELLS = 16
#: 8 of 16 cells (r9): with SHELL-SCALED centroids the cells are honestly
#: balanced (max cell 17% of corpus, was 82% — see ivf_centroids), so
#: recall is governed by probed mass: the synthetic embeddings are
#: largely unstructured, and 8/16 probes measure 0.86 where 4/16 gave
#: 0.46.  The old 0.9@4-probes was an artifact of the mega-cell (probing
#: it = scanning 82% of the corpus — no pruning at all).  At production
#: scale n_cells grows with the corpus (sqrt(n) rule) and the probe
#: FRACTION shrinks; clustered real-world embeddings recover recall at
#: far lower fractions, and ivf_refit_centroids measurably improves
#: recall at equal probes (0.58 vs 0.46 at 4/16 on this data).
DEFAULT_IVF_PROBE = 8


def _cell_scores(vec: Column, centroids: list[list[float]]) -> Column:
    """Array of squared L2 distances to every centroid (sequential folds).

    ONE ``transform`` lambda over an array-of-arrays centroid literal, not
    16 separate fold expressions: the generated code contains a single
    fold loop instead of 16 copies, which keeps whole-stage codegen small
    and stable.  Measured (round 2, sf0.1 bench context): the 16-copy form
    degraded to 7–14 s per run deep into a bench session (Janino/code-cache
    pressure recompiling the replicated folds under shifting plan shapes);
    this form holds steady at ~1.7–2.0 s with bit-identical outputs.  The
    algebraically cheaper dot-based form ``‖c‖² − 2·(x·c)`` was also tried
    and lost for the same reason — expression-tree size dominates at any
    SF where compute per row is microseconds; at 100 TB the fold loop is
    identical work either way.  The literal ships as one parsed SQL
    string (:func:`double_array_literal`, r13).
    """
    carr = double_array_literal(centroids)
    return F.transform(
        carr,
        lambda c: F.aggregate(
            F.zip_with(vec, c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
    )


def ivf_refit_centroids(
    corpus: DataFrame,
    n_cells: int = DEFAULT_IVF_CELLS,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    sample_fraction: float | None = None,
) -> list[list[float]]:
    """Lloyd-iteration k-means refit of the IVF coarse quantizer.

    Starts from the deterministic md5 centroids and runs ``iters``
    distributed assignment→mean steps: each is one corpus scan (cell
    argmin via :func:`_cell_scores`) plus a ``groupBy(cell)`` of
    ``n_cells × dim`` partial means — a shuffle of kilobytes, not data.
    The collected model is ``n_cells × dim`` doubles (driver-side by
    design, like any fitted model); empty cells keep their previous
    centroid.  At 100 TB pass ``sample_fraction`` to fit on a uniform
    sample (assignment quality degrades only marginally; the serving-path
    cell assignment still scans everything once at write time).
    """
    from big_data_engineering_financial_analysis_spark.functions.hashing import ivf_centroids

    c = corpus.select(F.col(vec_col).cast("array<double>").alias("vec"))
    if sample_fraction is not None:
        c = c.sample(fraction=sample_fraction, seed=7)
    c = spread(c).persist()
    centroids = ivf_centroids(n_cells, dim)
    try:
        for _ in range(iters):
            # materialize the score array as a column first — HOF arguments
            # are not common-subexpression-eliminated, so inlining it into
            # both array_position and array_min would run the dominant
            # fold twice per row
            assigned = c.withColumn(
                "dists", _cell_scores(F.col("vec"), centroids)
            ).withColumn(
                "cell", F.array_position("dists", F.array_min("dists")).cast("int")
            )
            means = (
                assigned.groupBy("cell")
                .agg(*[F.avg(F.element_at("vec", i + 1)).alias(f"m{i}") for i in range(dim)])
                .collect()
            )
            new = list(centroids)
            for row in means:
                new[row["cell"] - 1] = [float(row[f"m{i}"]) for i in range(dim)]
            centroids = new
    finally:
        c.unpersist()
    return centroids


def ivf_ann_topk(
    corpus: DataFrame,
    query_ids: list[int],
    k: int = DEFAULT_K,
    n_cells: int = DEFAULT_IVF_CELLS,
    n_probe: int = DEFAULT_IVF_PROBE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF-style approximate top-k: coarse-quantize the corpus into cells
    (nearest deterministic centroid), search only the query's ``n_probe``
    nearest cells.

    Cell id = 1-based position of the minimum centroid distance
    (first-occurrence tie-break — identical in the SQL oracle via
    ``list_position``).  The probe set is "cells with distance <= the
    n_probe-th smallest" so ties expand the probe deterministically on
    both engines.  At scale the corpus is written partitioned by ``cell``
    and a query touches n_probe partitions instead of the full table.

    Plan shape (r13): the query rows are collected ONCE from the
    persisted corpus frame — their centroid distances come from the
    exact corpus expression, so no arithmetic is re-derived driver-side —
    and the
    (query_id, probe cells, vector) structs re-enter the plan as a
    literal (:func:`_query_struct_literal`).  Each corpus row matches
    queries ROW-LOCALLY (``array_contains(probe cells, cell)``), which
    replaces the r12 broadcast probe join + candidate ``distinct`` +
    corpus re-join: the corpus is scanned once and the only exchange is
    the final top-k rank.  The probe rule is arithmetically identical to
    the old ``element_at(array_sort(dists), n_probe)`` threshold on the
    same IEEE doubles (NULLs sort last, a missing threshold probes
    nothing), so ties expand the probe set the same way.
    """
    from big_data_engineering_financial_analysis_spark.functions.hashing import ivf_centroids

    if centroids is None:
        centroids = ivf_centroids(n_cells, dim)
    id_ddl = corpus.schema[id_col].dataType.simpleString()
    base = corpus.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("vec"))
    # the r12 persisted corpus frame, unchanged (callers own the cache
    # lifetime): the n_cells-fold distance array is the dominant per-row
    # cost and feeds the query-row collect AND the scored scan; the
    # InMemoryRelation boundary also pins it to one evaluation per row —
    # a plain projected alias would be inlined into the per-query match
    # lambda below (see lsh_ann_topk's rb note).
    c = (
        with_norm(spread(base), "vec")
        .withColumn("dists", _cell_scores(F.col("vec"), centroids))
        .withColumn(
            "cell", F.array_position("dists", F.array_min("dists")).cast("int")
        )
        .persist()
    )
    q_rows = (
        c.filter(F.col(id_col).isin(query_ids))
        .select(id_col, "vec", "norm", "dists")
        .collect()
    )
    q_structs = []
    for r in q_rows:
        d = list(r["dists"]) if r["dists"] is not None else []
        non_null = sorted(x for x in d if x is not None)  # array_sort: NULLs last
        if len(non_null) < n_probe:
            # old shape: element_at past the non-null tail -> NULL
            # threshold -> no probes for this query
            continue
        thr = non_null[n_probe - 1]
        pcells = [i + 1 for i, x in enumerate(d) if x is not None and x <= thr]
        q_structs.append((r[id_col], pcells, r["vec"], r["norm"]))
    q_arr = _query_struct_literal(
        q_structs,
        [
            ("query_id", id_ddl),
            ("pcells", "array<int>"),
            ("qvec", "array<double>"),
            ("qnorm", "double"),
        ],
    )
    matches = F.filter(
        q_arr,
        lambda q: (F.col(id_col) != q["query_id"])
        & F.array_contains(q["pcells"], F.col("cell")),
    )
    return _explode_score_topk(c, matches, id_col, k)


def embedding_dedup_pairs(
    corpus: DataFrame,
    threshold: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact near-duplicate pairs by cosine >= threshold.

    Brute-force O(n²) — the correct-by-construction VERIFIER, kept for
    tests and recall measurement only.  The registered/scale path is
    :func:`embedding_dedup_pairs_lsh`, which generates candidates inside
    sign-LSH buckets exactly like minhash-LSH prunes the jaccard join.
    """
    c = with_norm(
        spread(corpus.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("vec"))),
        "vec",
    )
    a = c.select(F.col(id_col).alias("id_a"), F.col("vec").alias("va"), F.col("norm").alias("na"))
    b = c.select(F.col(id_col).alias("id_b"), F.col("vec").alias("vb"), F.col("norm").alias("nb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", cosine(F.col("va"), F.col("vb"), F.col("na"), F.col("nb")))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", F.round("cos_sim", 6).alias("cos_sim"))
    )


DEDUP_TABLES = 8


def embedding_dedup_pairs_lsh(
    corpus: DataFrame,
    threshold: float = 0.45,
    n_tables: int = DEDUP_TABLES,
    planes_per_table: int = DEFAULT_PLANES_PER_TABLE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    bucket_cap: int | None = DEFAULT_BUCKET_CAP,
) -> DataFrame:
    """Near-duplicate pairs by cosine >= threshold, LSH-bucketed — the
    100 TB default.

    Candidate pairs are generated INSIDE multi-table sign-LSH buckets (a
    pair is considered iff it collides in at least one of the L tables),
    then verified with the exact fold cosine, so precision is 1 and the
    only approximation is bucket recall: for a pair at angle θ it is
    ``1 - (1 - (1-θ/π)^p)^L`` — ≈0.98 at cos 0.8 with the default 8x4
    tables.  Replaces the all-pairs O(n²) self-join of
    :func:`embedding_dedup_pairs` with an equi-join on small
    (table, bucket) keys: candidates shuffle only on bucket keys, exactly
    like minhash-LSH prunes the jaccard join.

    The normed corpus is persisted (bucket explode + both verify sides);
    callers own the cache lifetime (``spark.catalog.clearCache()`` sweeps).
    ``bucket_cap`` bounds hot buckets to the ``bucket_cap`` smallest ids
    (see :data:`DEFAULT_BUCKET_CAP`); ``None`` disables.
    """
    all_planes = hyperplanes(n_tables * planes_per_table, dim)
    c = corpus.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("vec"))
    c = spread(c)
    c = with_norm(c, "vec").persist()
    buckets = F.array(
        *[
            F.struct(
                F.lit(t).alias("tbl"),
                lsh_bucket(
                    F.col("vec"),
                    all_planes[t * planes_per_table : (t + 1) * planes_per_table],
                    # named dedup_bucket (not bucket) so the plan guard
                    # (tests/test_plan_guard.py) can tell a dedup bucket
                    # SELF-join apart from ann_lsh's legitimate
                    # query<->corpus bucket join by key name alone
                ).alias("dedup_bucket"),
            )
            for t in range(n_tables)
        ]
    )
    exploded = c.select(F.col(id_col), F.explode(buckets).alias("tb")).select(
        id_col, "tb.tbl", "tb.dedup_bucket"
    )
    from big_data_engineering_financial_analysis_spark.operators.dedup import _bucket_pairs

    # grouped within-bucket pair generation (r10, see _bucket_pairs): one
    # explode pass + one Exchange, no self-join — the self-join planned
    # the bucket-explode subtree twice.  Ids only: the 64-dim double
    # vector is ~0.5 KB/row, so carrying it through the 8-table bucket
    # shuffle would cost more bytes than the two verify joins it saves —
    # unlike minhash/simhash, whose signatures are shuffle-cheap.
    cands = _bucket_pairs(
        exploded, ["tbl", "dedup_bucket"], id_col, bucket_cap
    ).distinct()
    va = c.select(F.col(id_col).alias("id_a"), F.col("vec").alias("va"), F.col("norm").alias("na"))
    vb = c.select(F.col(id_col).alias("id_b"), F.col("vec").alias("vb"), F.col("norm").alias("nb"))
    raw = cosine(F.col("va"), F.col("vb"), F.col("na"), F.col("nb"))
    return (
        cands.join(va, "id_a")
        .join(vb, "id_b")
        # threshold the UNROUNDED cosine (the oracle filters raw too)
        .filter(raw >= threshold)
        .select("id_a", "id_b", F.round(raw, 6).alias("cos_sim"))
    )


#: semantic_dedup hot-cell handling: a cell larger than SEMDEDUP_HOT_CELL
#: is split into hash-addressed blocks of ~SEMDEDUP_BLOCK members for the
#: pair join, so the hottest cell's quadratic work spreads over
#: ``ceil(|cell| / BLOCK)`` tasks instead of straggling one (the round-6
#: plan audit flagged the within-cell SMJ as the registry's one
#: skew-sensitive spot).  Pure plan surgery — the generated pair set is
#: identical, so results and the oracle are unchanged.
SEMDEDUP_HOT_CELL = 4096
SEMDEDUP_BLOCK = 1024


def semantic_dedup(
    corpus: DataFrame,
    threshold: float = 0.45,
    n_cells: int = DEFAULT_IVF_CELLS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    centroids: list[list[float]] | None = None,
    hot_cell: int = SEMDEDUP_HOT_CELL,
    block: int = SEMDEDUP_BLOCK,
) -> DataFrame:
    """Semantic deduplication (Abbas et al. 2023, "SemDeDup"): cluster
    embeddings into coarse cells, then drop any vector that has a
    smaller-id neighbor in the SAME cell with cosine >= ``threshold``.

    This is the embedding-space analogue of exact/minhash dedup: it
    removes *semantic* duplicates — paraphrases, re-encodings,
    translations with shared embeddings — that no text-hash strategy can
    see.  The min-id survivor rule is a pure function of the data (same
    determinism argument as :func:`embedding_dedup_pairs`'s ``id_a <
    id_b``), so re-runs and the SQL oracle agree exactly.

    Output: one row per corpus vector — (id, cell, keep) with keep in
    {0, 1}; downstream joins ``keep = 1`` back to the documents.

    CACHE LIFETIME (advice r12): the cell-assignment frame is
    ``persist()``-ed here (it feeds four downstream plan references and
    the distance fold is the dominant per-row cost) and the returned
    lazy frame holds a reference to it, so this function cannot
    unpersist it.  Callers own the release — the engine's bench/registry
    convention is a ``spark.catalog.clearCache()`` sweep between query
    families (the same contract as :func:`embedding_dedup_pairs_lsh`);
    a long-lived session that never clears the cache retains one
    (id, vec, norm, cell) row per corpus vector per call.

    Scale: pairwise work is CELL-bounded, never all-pairs — cost is
    sum over cells of |cell|², and ``n_cells`` grows with the corpus so
    cells stay roughly constant-sized (SemDeDup uses 11k clusters for
    LAION-440M; cells here are the same IVF coarse quantizer the ANN
    path uses, :func:`ivf_refit_centroids` refits it).  The cell
    self-join shuffles on (cell, block): a cell at or under ``hot_cell``
    members is one block (exactly the classic cell self-join); a hotter
    cell is split into ``ceil(|cell| / block)`` hash-addressed blocks —
    the probe side lands in its own block, the build side replicates to
    every block of its cell — so every pair is still generated exactly
    once but per-task work is ~``|cell| x block`` instead of
    ``|cell|²``, and the hottest cell parallelizes instead of
    straggling.  Replication cost is ``|cell|² / block`` build rows,
    paid only above the threshold.  Per-cell sizes ride a broadcast
    (≤ ``n_cells`` rows).
    """
    from big_data_engineering_financial_analysis_spark.functions.hashing import ivf_centroids

    if centroids is None:
        centroids = ivf_centroids(n_cells, dim)
    base = with_norm(
        spread(corpus.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("vec"))),
        "vec",
    )
    assigned = (
        base.withColumn("dists", _cell_scores(F.col("vec"), centroids))
        .withColumn("cell", F.array_position("dists", F.array_min("dists")).cast("int"))
        .drop("dists")
    )
    # the assignment feeds FOUR downstream references (the size count,
    # both sides of the blocked pair join, and the final keep join); the
    # n_cells × dim distance fold is the dominant per-row cost, and
    # without a materialization boundary Catalyst plans — and runs — it
    # once per reference.  Cache is one (id, vec, norm, cell) row per
    # vector; callers own the lifetime (the embedding_dedup_pairs_lsh
    # convention, spark.catalog.clearCache() sweeps).
    assigned = assigned.persist()
    sizes = assigned.groupBy("cell").agg(F.count(F.lit(1)).alias("cell_n"))
    nblk = (
        F.when(F.col("cell_n") > hot_cell, F.ceil(F.col("cell_n") / F.lit(block)))
        .otherwise(F.lit(1))
        .cast("int")
    )
    blocked = assigned.join(F.broadcast(sizes), "cell").withColumn("nblk", nblk)
    a = blocked.select(
        F.col(id_col).alias("id_a"), "cell",
        F.col("vec").alias("va"), F.col("norm").alias("na"),
        # build side: replicate to every block of the cell (1 block for
        # cells under the threshold — zero replication in the common case)
        F.explode(F.sequence(F.lit(0), F.col("nblk") - 1)).alias("blk"),
    )
    b = blocked.select(
        F.col(id_col).alias("id_b"), "cell",
        F.col("vec").alias("vb"), F.col("norm").alias("nb"),
        # probe side: one deterministic hash-addressed block
        F.pmod(F.xxhash64(F.col(id_col)), F.col("nblk")).cast("int").alias("blk"),
    )
    raw = cosine(F.col("va"), F.col("vb"), F.col("na"), F.col("nb"))
    dropped = (
        a.join(b, ["cell", "blk"])
        .filter(F.col("id_a") < F.col("id_b"))
        # threshold the UNROUNDED cosine (the oracle filters raw too)
        .filter(raw >= threshold)
        .select(F.col("id_b").alias(id_col))
        .distinct()
        .withColumn("dropmark", F.lit(1))
    )
    return (
        assigned.join(dropped, id_col, "left")
        .select(
            id_col,
            "cell",
            F.when(F.col("dropmark").isNull(), 1).otherwise(0).alias("keep"),
        )
    )


def cosine_topk_pandas(
    corpus: DataFrame,
    query_ids: list[int],
    k: int = DEFAULT_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors via Arrow-batched numpy matmul — the
    vectorized Pandas-UDF scale path.

    Same semantics as :func:`cosine_topk` but the per-batch scoring is one
    BLAS ``matrix @ queries.T`` instead of per-row JVM folds: at high
    dimensionality / large k the SIMD matmul wins, and this is the shape
    that extends to GPU scoring.  Each Arrow batch emits only its LOCAL
    top-k per query (top-k is monotone under union), so the final exact
    rank runs over ≤ batches × k × queries rows — the corpus is scanned
    once, nothing non-local ever shuffles.

    Float caveat: numpy's pairwise summation orders additions differently
    from the sequential fold, so cosines can differ in the last ulp from
    :func:`cosine_topk` (ranking ties near equality may swap) — use the
    fold variant when bit-stable cross-engine output is required.

    Degenerate-row caveat: zero-norm corpus rows are EXCLUDED here (only
    real neighbors are returned), while the fold variant emits them with
    NULL cos_sim in trailing ranks when fewer than k valid neighbors
    exist — so row counts can differ on degenerate corpora.
    """
    import numpy as np
    import pandas as pd

    out_schema = "query_id long, neighbor_id long, cos_sim double"
    q_rows = (
        corpus.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("vec"))
        .filter(F.col(id_col).isin(query_ids))
        .collect()
    )
    if not q_rows:  # no query id present: empty result, like cosine_topk
        spark = corpus.sparkSession
        return spark.createDataFrame([], out_schema + ", rank int")
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    q_mat = np.array([r[1] for r in q_rows], dtype=np.float64)
    q_norm = np.linalg.norm(q_mat, axis=1)

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            mat = np.stack(pdf["vec"].to_numpy())
            norms = np.linalg.norm(mat, axis=1)
            denom = np.outer(norms, q_norm)
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = np.where(denom > 0, (mat @ q_mat.T) / denom, np.nan)
            out = []
            for j, qid in enumerate(q_ids):
                col = cos[:, j]
                mask = ids != qid
                cand = np.flatnonzero(mask & ~np.isnan(col))
                if cand.size == 0:
                    continue
                # lexsort on (cos desc, neighbor_id asc) so the local k-th
                # boundary cuts ties exactly like the final window ordering;
                # a plain argsort(-cos) would cut exact-equal cosines by
                # batch row order and could drop the smaller-id neighbor.
                take = cand[np.lexsort((ids[cand], -col[cand]))][: k]
                out.append(
                    pd.DataFrame(
                        {"query_id": qid, "neighbor_id": ids[take], "cos_sim": col[take]}
                    )
                )
            if out:
                yield pd.concat(out)

    c = spread(
        corpus.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("vec"))
    )
    local = c.mapInPandas(score, "query_id long, neighbor_id long, cos_sim double")
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos_sim", 6).alias("cos_sim"), "rank")
    )
