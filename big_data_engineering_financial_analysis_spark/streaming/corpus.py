"""Streaming corpus ingest: incremental dedup + quality gating.

The batch datapipe operators (operators/dedup.py, operators/text.py) are
row-local or hash-keyed, so their streaming twins come almost for free:

* quality / language gates are stateless projections — identical columns
  on a stream;
* exact dedup becomes state-store-backed ``dropDuplicates`` on the
  canonical content hash: the first document with a given hash wins
  across micro-batches AND restarts (checkpointed state), which is the
  incremental version of ``exact_dedup_groups``'s keep-min semantics
  under arrival order.

State bounds: content-hash dedup state grows with distinct documents.
With an event-time column, pass ``watermark_ts`` to get
``dropDuplicatesWithinWatermark`` eviction; without one (the synthetic
``documents`` table has none) state is unbounded — at 100 TB ingest you
either carry an ingest timestamp (recommended; any real feed has one) or
periodically compact via the batch pipeline.  Near-dup (minhash) dedup is
incremental too since round 6: :func:`incremental_dedup_sink` keeps a
persisted signature store (``num_perm`` longs per ever-arrived document)
and joins each micro-batch's band buckets against it —
``operators/dedup.incremental_minhash_dedup`` holds the algorithm and
the batch-boundary-invariance contract; the batch-expressible form is
the ``dedup_incremental`` registry query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from big_data_engineering_financial_analysis_spark.operators.dedup import (
    DEFAULT_BANDS as _DEFAULT_BANDS,
)
from big_data_engineering_financial_analysis_spark.operators.dedup import canonical_text
from big_data_engineering_financial_analysis_spark.operators.partitioning import pushdown_barrier
from big_data_engineering_financial_analysis_spark.operators.text import (
    with_lang_guess,
    with_quality,
    with_repetition,
)


def corpus_gate_stream(
    docs: DataFrame,
    lang: str = "en",
    quality_floor: float = 0.5,
    rep_cap: float | None = None,
) -> DataFrame:
    """Stateless lang/quality(/repetition) gates on a document stream —
    the same expressions as the batch corpus_prep stages, so streamed and
    batch-gated corpora are row-identical.  ``rep_cap`` engages the
    Gopher max-token-ratio filter (row-local, so it streams unchanged;
    ``spread()`` passes streaming frames through)."""
    scored = with_quality(with_lang_guess(docs))
    kept = scored.filter(
        (F.col("lang_guess") == lang) & (F.col("quality_score") >= quality_floor)
    )
    if rep_cap is not None:
        # Filtering directly on with_repetition's RLE column would let
        # predicate pushdown inline the aliased sort/HOF intermediates into
        # the filter (quadratic per row — text.py CAUTION).  The batch
        # corpus_prep gates behind an Aggregate; a streaming gate must stay
        # stateless, so block the pushdown with a non-deterministic no-op
        # instead (plan shape asserted in tests/test_streaming_corpus.py).
        kept = with_repetition(kept).withColumn(
            "max_token_ratio", pushdown_barrier(F.col("max_token_ratio"))
        ).filter(F.col("max_token_ratio") <= rep_cap)
    return kept


def corpus_dedup_stream(
    docs: DataFrame,
    text_col: str = "text",
    watermark_ts: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """First-writer-wins exact dedup across micro-batches by canonical
    content hash (incremental ``exact_dedup_groups``)."""
    hashed = docs.withColumn(
        "content_hash", F.md5(canonical_text(F.col(text_col)).cast("binary"))
    )
    if watermark_ts is not None:
        return hashed.withWatermark(watermark_ts, watermark).dropDuplicatesWithinWatermark(
            ["content_hash"]
        )
    return hashed.dropDuplicates(["content_hash"])


def incremental_dedup_sink(
    store_path: str,
    decisions_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    writer_id: str | None = None,
    banded_store: bool = True,
):
    """Build a ``foreachBatch`` function running incremental near-dedup
    against a persisted minhash signature store.

    Per micro-batch: (1) signatures of the arriving documents are
    computed and LSH-joined against the store
    (``operators/dedup.incremental_minhash_dedup``); (2) one decision
    row per arriving document ``(id, is_dup)`` is appended to
    ``decisions_path``; (3) ALL arriving signatures — kept and dropped —
    are appended to the store, which keeps the surviving set invariant
    to where micro-batch boundaries fall in the arrival stream (see the
    operator docstring; proven in tests/test_streaming_corpus.py).

    Replay safety: the standard ``_batches/<id>`` marker protocol
    (streaming/dataset_sink.py) — a replayed batch id is skipped, so the
    store never double-appends a batch's signatures.

    Store layout at 100 TB: signatures are ``num_perm`` longs per
    document; persist the store bucketed on the band key
    (sources/bucketed.py) to make the per-batch join co-located and
    store-shuffle-free.  First batch with no store bootstraps an empty
    signature frame.

    ``store_path`` must be a DRIVER-LOCAL filesystem path (same contract
    as dataset_sink's ``_batches`` markers): store discovery and replay
    markers use ``os.listdir``/``os.path.exists``, so an HDFS/S3 URI
    would silently look empty every batch — bootstrapping a fresh store
    and quietly disabling all history dedup.  Validated up front; for an
    object-store-backed store, swap the discovery + marker IO for the
    matching filesystem client.
    """
    import os

    from big_data_engineering_financial_analysis_spark.sources.localfs import check_local

    store_path = check_local(
        store_path, "incremental_dedup_sink",
        why="store discovery and replay markers use local-filesystem IO — "
        "a remote URI would silently bootstrap an empty store every batch",
    )

    from pyspark.sql import types as T

    from big_data_engineering_financial_analysis_spark.operators.dedup import (
        incremental_minhash_dedup,
    )

    sig_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("minhash_sig", T.ArrayType(T.LongType())),
        ]
    )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        # (writer_id, batch_id)-scoped markers — the dataset_sink
        # contract (see streaming.dataset_sink._marker_name).  NOTE the
        # store itself stays single-ACTIVE-writer: the read-merge-
        # overwrite cycle has no locking, so a CONCURRENT second query
        # would silently lose the other's updates; writer_id here is
        # for SEQUENTIAL incarnations (fresh checkpoint, backfill-then-
        # resume), never parallel ones.
        from big_data_engineering_financial_analysis_spark.streaming.dataset_sink import _marker_name

        marker = os.path.join(
            store_path, "_batches", _marker_name(writer_id, batch_id)
        )
        if os.path.exists(marker):
            return  # replayed batch: already committed
        spark = batch_df.sparkSession
        sig_dir = os.path.join(store_path, "sigs")
        _recover_store_compaction(sig_dir)  # crashed compaction ≠ empty store
        has_store = os.path.isdir(sig_dir) and any(
            f.endswith(".parquet") for f in os.listdir(sig_dir)
        )
        if has_store:
            store_sigs = spark.read.schema(sig_schema).parquet(sig_dir)
        else:
            store_sigs = spark.createDataFrame([], sig_schema)
        bstore = None
        if banded_store:
            from big_data_engineering_financial_analysis_spark.operators.dedup import (
                decisions_from_matched,
            )

            matched, new_sigs, banded_new, bstore = _banded_store_matched(
                spark, batch_df, store_sigs, has_store, store_path,
                id_col, text_col, threshold,
            )
            decisions = decisions_from_matched(new_sigs, matched, id_col)
        else:
            decisions, new_sigs = incremental_minhash_dedup(
                batch_df, store_sigs, id_col=id_col, text_col=text_col,
                threshold=threshold,
            )
            banded_new = None
            _invalidate_band_store(store_path, id_col)
        try:
            decisions.write.mode("append").parquet(decisions_path)
            new_sigs.write.mode("append").parquet(sig_dir)
            _append_band_delta(bstore, banded_new, new_sigs)
        finally:
            new_sigs.unpersist()  # per-batch cache must not accumulate
        os.makedirs(marker, exist_ok=True)
        _compact_band_store_if_due(spark, bstore, banded_new)

    return write_batch


def _invalidate_band_store(store_path: str, id_col: str) -> None:
    """Legacy-path guard shared by both sinks: signatures are about to
    append WITHOUT matching band rows, so a band store left behind by
    an earlier banded incarnation would look valid but miss this batch
    forever (silent false negatives after switching back) — drop it;
    the next banded batch rebuilds from the full sigs store."""
    from big_data_engineering_financial_analysis_spark.streaming.bandstore import BandStore

    BandStore(store_path, id_col=id_col).invalidate()


def _append_band_delta(bstore, banded_new, new_sigs) -> None:
    """Banded-path commit step shared by both sinks (inside the
    caller's batch-marker window, AFTER the signature append): banded
    rows = non-NULL signatures × bands, the advisory delta count."""
    if banded_new is None:
        return
    n_banded = (
        new_sigs.filter(F.col("minhash_sig").isNotNull()).count()
        * _DEFAULT_BANDS
    )
    bstore.append_delta(banded_new, n_banded)


def _compact_band_store_if_due(spark, bstore, banded_new) -> None:
    """Post-marker compaction check shared by both sinks (safe to run
    after the marker: a crash here only leaves the delta above its
    trigger, and the next batch compacts)."""
    if banded_new is not None and bstore.needs_compact():
        bstore.compact(spark)


def _banded_store_matched(
    spark,
    batch_df: DataFrame,
    store_sigs: DataFrame,
    has_store: bool,
    store_path: str,
    id_col: str,
    text_col: str,
    threshold: float,
):
    """Per-batch matched pairs against the PERSISTED band store
    (streaming/bandstore.py): the batch is signed and banded as usual
    (O(batch)); standing history arrives already banded — surviving
    base files (Bloom-pruned on the batch's band keys, filters cached
    across micro-batches) plus the bounded delta — so the in-memory
    kernel's O(store) per-batch re-banding never runs.  Match
    semantics are identical to :func:`incremental_minhash_dedup` /
    :func:`incremental_minhash_pairs` (same banding, same inline
    est_jaccard verify, same partner rule) — parity pinned in
    tests/test_streaming_corpus.py and tests/test_bandstore.py; both
    the dedup sink (decisions tail) and the cluster sink (pair tail)
    compile through this one helper.

    Returns ``(matched, new_sigs, banded_new, bstore)``; the caller
    appends ``banded_new`` to ``bstore``'s delta after the signature
    append, inside the same batch-marker window."""
    from big_data_engineering_financial_analysis_spark.operators import dedup
    from big_data_engineering_financial_analysis_spark.streaming.bandstore import BandStore

    bstore = BandStore(store_path, id_col=id_col)
    if has_store and bstore.meta() is None:
        # pre-existing sigs-only store (older sink version), or a store
        # whose bands were invalidated by compact_signature_store:
        # one banding pass rebuilds the bucketed+indexed base
        bstore.rebuild(spark, store_sigs)
    sigs_new = dedup.minhash_signatures(batch_df, id_col, text_col).persist()
    banded_new = dedup.band_signatures(sigs_new, id_col, carry_sig=True)
    # batch-bounded driver set: bands x batch distinct band keys
    batch_keys = [
        r[0] for r in banded_new.select("band_key").distinct().collect()
    ]
    store_banded = bstore.read_matching(spark, batch_keys)
    # strictly-earlier-arrivals contract (see the kernel docstring):
    # crash-replay echoes of the batch's own ids must not act as store
    # partners — batch-sized broadcast anti-join, a no-op outside replay
    store_banded = store_banded.join(
        F.broadcast(sigs_new.select(id_col).distinct()), id_col, "left_anti"
    )
    matched = dedup._matched_pairs_vs_banded_store(
        banded_new, store_banded, id_col, dedup.DEFAULT_NUM_PERM, threshold
    )
    return matched, sigs_new, banded_new, bstore


def _recover_store_compaction(store_dir: str) -> None:
    """Heal a crashed store compaction (same protocol as
    ``sources/dataset.recover_compaction``): a crash between the two
    renames leaves only ``<dir>._pre_compact`` — restore it; a crash
    after the swap leaves a superseded aside — delete it; a crash before
    the first rename leaves a dead stage — delete it.  Called by the
    compactor AND by every sink's store discovery, so a crashed
    compaction can never make the store "look empty" and silently
    disable history dedup."""
    import shutil

    from big_data_engineering_financial_analysis_spark.sources.localfs import recover_aside_swap

    recover_aside_swap(store_dir, store_dir + "._pre_compact")
    shutil.rmtree(store_dir + "._compact_stage", ignore_errors=True)


def compact_signature_store(
    spark,
    store_path: str,
    retain_min_id: int | None = None,
    dedupe_signatures: bool = True,
    id_col: str = "doc_id",
) -> dict:
    """Bound the incremental-dedup signature store (round-7; the
    all-arrivals store otherwise grows forever — production crawls prune
    it).  Two independent policies, both rewriting ``<store>/sigs``
    atomically (stage → rename aside → rename in, the
    ``sources/dataset.compact_dataset`` protocol):

    * ``dedupe_signatures`` — keep ONE row (min id) per distinct
      ``minhash_sig``.  Fully DECISION-INVARIANT: a store partner enters
      a decision only through its signature (band keys + est_jaccard are
      functions of the signature alone; partner ids are never compared
      for store rows), so dropping exact-signature duplicates can never
      change any future arrival's verdict.  Store size becomes
      O(distinct signatures) — on a crawl where near-dup clusters are
      re-fetched constantly, that is the bound that matters.
    * ``retain_min_id`` — evict signatures with ``id < retain_min_id``
      (the id-ordered arrival stream's watermark; with an ingest
      timestamp column, filter on that instead).  This IS a semantics
      horizon, stated plainly: future arrivals are deduped only against
      in-horizon history, and an arrival whose only near-duplicate was
      evicted will now be kept.  Decisions whose partners are in-horizon
      are untouched (per-partner independence: evicting p changes no
      (b, p') comparison for p' ≠ p).  Both properties are proven in
      tests/test_streaming_corpus.py.

    Returns ``{"rows_before": n, "rows_after": m}``.  Driver-local
    ``store_path`` only (same contract as :func:`incremental_dedup_sink`).

    Crash recovery (the other half of the compact_dataset protocol): a
    crash between the two renames leaves only ``sigs._pre_compact``;
    :func:`_recover_store_compaction` restores it — and runs from BOTH
    this compactor and every sink's store discovery, so a crashed
    compaction can never present as an empty store and silently disable
    history dedup.
    """
    import os
    import shutil

    from pyspark.sql import functions as SF

    from big_data_engineering_financial_analysis_spark.sources.localfs import check_local

    store_path = check_local(store_path, "compact_signature_store")
    sig_dir = os.path.join(store_path, "sigs")
    _recover_store_compaction(sig_dir)
    if not os.path.isdir(sig_dir) or not any(
        f.endswith(".parquet") for f in os.listdir(sig_dir)
    ):
        return {"rows_before": 0, "rows_after": 0}

    sigs = spark.read.parquet(sig_dir)
    rows_before = sigs.count()
    kept = sigs
    if retain_min_id is not None:
        kept = kept.filter(SF.col(id_col) >= retain_min_id)
    if dedupe_signatures:
        # min-id representative per distinct signature: deterministic, and
        # keeps the earliest arrival as the cluster's witness
        kept = kept.groupBy("minhash_sig").agg(SF.min(id_col).alias(id_col))
    kept = kept.select(id_col, "minhash_sig")

    staged = sig_dir + "._compact_stage"
    kept.write.mode("overwrite").parquet(staged)
    rows_after = spark.read.parquet(staged).count()
    aside = sig_dir + "._pre_compact"
    os.rename(sig_dir, aside)
    os.rename(staged, sig_dir)
    shutil.rmtree(aside)
    # the persisted band store is DERIVED from sigs/: any rewrite here
    # (row eviction, dedupe) makes it stale, so drop it — the next
    # batch's sink rebuilds it from the compacted signatures in one
    # banding pass (streaming/bandstore.py self-upgrade path)
    from big_data_engineering_financial_analysis_spark.streaming.bandstore import BandStore

    BandStore(store_path, id_col=id_col).invalidate()
    return {"rows_before": rows_before, "rows_after": rows_after}


def corpus_ingest_stream(
    docs: DataFrame,
    lang: str = "en",
    quality_floor: float = 0.5,
    rep_cap: float | None = None,
    watermark_ts: str | None = None,
) -> DataFrame:
    """Gate then dedup — the streaming front half of ``corpus_prep``.

    Gating BEFORE dedup keeps rejected documents out of the dedup state
    entirely (state size tracks accepted distinct docs only).
    """
    return corpus_dedup_stream(
        corpus_gate_stream(docs, lang, quality_floor, rep_cap),
        watermark_ts=watermark_ts,
    )


def incremental_cluster_sink(
    store_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    n_buckets: int = 64,
    writer_id: str | None = None,
    banded_store: bool = True,
):
    """Build a ``foreachBatch`` function maintaining LIVE duplicate
    CLUSTER labels across micro-batches — the cluster-side completion of
    :func:`incremental_dedup_sink`: that sink answers "is this arrival a
    duplicate?", this one keeps the full ``(node, component)`` labeling
    current so downstream consumers (keeper election, cluster-capped
    sampling, dedup reports) never rerun connected components over the
    corpus.

    Per micro-batch: (1) LSH-match the arrivals against the signature
    store and each other — through the PERSISTED band store by default
    (``streaming/bandstore.py`` via the shared
    ``_banded_store_matched`` helper: standing history arrives
    already banded and Bloom-pruned, so the per-batch cost does not
    grow with corpus history; ``banded_store=False`` falls back to
    ``operators/dedup.incremental_minhash_pairs``, which re-bands the
    whole store in memory each batch and invalidates any leftover
    band store so a later banded incarnation rebuilds completely);
    (2) fold the discovered pairs into the standing labels
    (``operators/dedup.merge_component_labels`` — arrivals with no
    partner label themselves); (3) upsert the labels store; (4) append
    the arrivals' signatures to the signature store (and their banded
    rows to the band store's delta, inside the same marker window).

    Label-store layout and the 100 TB write path: labels live under
    ``<store>/labels`` hash-partitioned by ``bucket = pmod(hash(node),
    n_buckets)``.  A batch rewrites ONLY the buckets holding
    potentially-changed rows (``merge_component_labels``'s
    ``changed_col`` marks them; Spark's dynamic partition overwrite —
    scoped, saved/restored — replaces just those directories), so the
    per-batch write is O(affected buckets), not O(corpus).  Node rows
    never move buckets (a merge changes a row's component VALUE, never
    its node), so overwriting an affected bucket with that bucket's
    slice of the merged labeling is a complete, consistent upsert.

    Batch-boundary invariance: the final labeling equals one
    connected-components run over the union of every emitted pair set
    regardless of how arrivals are split into batches (signature store
    appends all arrivals, and ``merge_component_labels`` is
    split-invariant — both proven in tests/test_streaming_corpus.py).

    Replay safety: the ``_batches/<id>`` marker protocol shared with
    :func:`incremental_dedup_sink`; a replayed batch is skipped, so
    neither store double-applies.  ``store_path`` must be driver-local
    (same contract and validation as the signature sink).
    """
    import os

    from big_data_engineering_financial_analysis_spark.sources.localfs import check_local

    store_path = check_local(
        store_path, "incremental_cluster_sink",
        why="store discovery and replay markers use local-filesystem IO — "
        "a remote URI would silently bootstrap an empty store every batch",
    )

    from pyspark.sql import types as T

    from big_data_engineering_financial_analysis_spark.operators.dedup import (
        incremental_minhash_pairs,
        merge_component_labels,
    )

    sig_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("minhash_sig", T.ArrayType(T.LongType())),
        ]
    )
    label_schema = T.StructType(
        [
            T.StructField("node", T.LongType()),
            T.StructField("component", T.LongType()),
        ]
    )
    _OVR = "spark.sql.sources.partitionOverwriteMode"

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        # (writer_id, batch_id)-scoped markers — the dataset_sink
        # contract (see streaming.dataset_sink._marker_name).  NOTE the
        # store itself stays single-ACTIVE-writer: the read-merge-
        # overwrite cycle has no locking, so a CONCURRENT second query
        # would silently lose the other's updates; writer_id here is
        # for SEQUENTIAL incarnations (fresh checkpoint, backfill-then-
        # resume), never parallel ones.
        from big_data_engineering_financial_analysis_spark.streaming.dataset_sink import _marker_name

        marker = os.path.join(
            store_path, "_batches", _marker_name(writer_id, batch_id)
        )
        if os.path.exists(marker):
            return  # replayed batch: already committed
        spark = batch_df.sparkSession
        sig_dir = os.path.join(store_path, "sigs")
        labels_dir = os.path.join(store_path, "labels")
        _recover_store_compaction(sig_dir)  # crashed compaction ≠ empty store
        has_store = os.path.isdir(sig_dir) and any(
            f.endswith(".parquet") for f in os.listdir(sig_dir)
        )
        if has_store:
            store_sigs = spark.read.schema(sig_schema).parquet(sig_dir)
        else:
            store_sigs = spark.createDataFrame([], sig_schema)
        if os.path.isdir(labels_dir) and any(
            not f.startswith("_") for f in os.listdir(labels_dir)
        ):
            old_labels = (
                spark.read.parquet(labels_dir).select("node", "component")
            )
        else:
            old_labels = spark.createDataFrame([], label_schema)

        bstore = None
        banded_new = None
        if banded_store:
            # same persisted band store as incremental_dedup_sink — the
            # cluster sink's pair generation had the identical O(store)
            # per-batch re-banding term (incremental_minhash_pairs
            # bands the whole signature store in memory)
            matched, new_sigs, banded_new, bstore = _banded_store_matched(
                spark, batch_df, store_sigs, has_store, store_path,
                id_col, text_col, threshold,
            )
            # matched is already distinct and the rename is bijective —
            # no second distinct (it would be one more exchange per batch)
            pairs = matched.select(
                F.col("pid").alias("id_a"), F.col("bid").alias("id_b")
            )
        else:
            pairs, new_sigs = incremental_minhash_pairs(
                batch_df, store_sigs, id_col=id_col, text_col=text_col,
                threshold=threshold,
            )
            _invalidate_band_store(store_path, id_col)
        # arrivals enter the labeling as self-labeled singletons (valid:
        # they have no committed pairs yet); anti-join keeps a replayed
        # id from shadowing its existing row
        arrivals = (
            batch_df.select(F.col(id_col).alias("node"))
            .withColumn("component", F.col("node"))
            .join(old_labels.select("node"), "node", "leftanti")
        )
        # eager localCheckpoint, not persist: the merged frame descends
        # from a READ of labels_dir and is about to OVERWRITE it —
        # checkpointing severs the file lineage so the write never
        # re-scans the directory it is replacing
        merged = (
            merge_component_labels(
                old_labels.unionByName(arrivals), pairs, changed_col="_changed"
            )
            .withColumn("bucket", F.pmod(F.hash("node"), F.lit(n_buckets)))
            .localCheckpoint(eager=True)
        )
        try:
            # affected = buckets with relabeled rows PLUS buckets of the
            # arrivals themselves — a pair-less arrival is a pass-through
            # row in the merge but a brand-new row in the store
            affected = [
                r.bucket
                for r in merged.filter("_changed = 1")
                .select("bucket")
                .unionByName(
                    arrivals.select(
                        F.pmod(F.hash("node"), F.lit(n_buckets)).alias("bucket")
                    )
                )
                .distinct()
                .collect()
            ]
            prev_ovr = spark.conf.get(_OVR, None)
            spark.conf.set(_OVR, "dynamic")
            try:
                (
                    merged.filter(F.col("bucket").isin(affected))
                    .select("node", "component", "bucket")
                    .write.mode("overwrite")
                    .partitionBy("bucket")
                    .parquet(labels_dir)
                )
            finally:
                if prev_ovr is None:
                    spark.conf.unset(_OVR)
                else:
                    spark.conf.set(_OVR, prev_ovr)
            new_sigs.write.mode("append").parquet(sig_dir)
            _append_band_delta(bstore, banded_new, new_sigs)
        finally:
            new_sigs.unpersist()  # per-batch cache must not accumulate
        os.makedirs(marker, exist_ok=True)
        _compact_band_store_if_due(spark, bstore, banded_new)

    return write_batch
