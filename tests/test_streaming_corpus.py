"""Streaming corpus ingest: cross-batch exact dedup + stateless gates
(streaming/corpus.py)."""

from __future__ import annotations

import json

from big_data_engineering_financial_analysis_spark.streaming import corpus

SCHEMA = "doc_id long, text string, lang string"

# ten mostly-stopword tokens -> quality ~0.55, lang_guess 'en'
EN_A = "the and of the and of the and of the"
EN_B = "and the of and the of and the of and"
FR = "le la les et de un une ce il elle"


def _write_batch(path, rows):
    path.write_text("\n".join(json.dumps(r) for r in rows) + "\n")


def test_gate_then_dedup_across_microbatches(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    # batch 0: keeper A, casing-dup of A, French doc (gated out)
    _write_batch(
        src / "b0.json",
        [
            {"doc_id": 1, "text": EN_A, "lang": "en"},
            {"doc_id": 2, "text": EN_A.upper(), "lang": "en"},
            {"doc_id": 3, "text": FR, "lang": "fr"},
        ],
    )
    # batch 1: A re-delivered (dup across batches), genuinely new B
    _write_batch(
        src / "b1.json",
        [
            {"doc_id": 4, "text": EN_A, "lang": "en"},
            {"doc_id": 5, "text": EN_B, "lang": "en"},
        ],
    )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    out = corpus.corpus_ingest_stream(stream).select("doc_id", "content_hash")
    q = (
        out.writeStream.format("memory")
        .queryName("corpus_surv")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM corpus_surv").collect()
    ids = sorted(r.doc_id for r in rows)
    # one survivor per distinct canonical content, French gated out; the
    # casing dup (2) and both re-deliveries (4) are suppressed by state
    assert len(ids) == 2
    assert 5 in ids  # the genuinely-new doc survives
    assert (set(ids) - {5}).issubset({1, 2, 4})  # one winner per content
    hashes = {r.content_hash for r in rows}
    assert len(hashes) == 2


def test_streaming_survivor_hashes_match_batch_dedup(spark, tmp_path):
    """The streaming survivor hash set equals the batch exact-dedup hash
    set over the same (gated) data."""
    from big_data_engineering_financial_analysis_spark.operators import dedup

    rows = [
        {"doc_id": 1, "text": EN_A, "lang": "en"},
        {"doc_id": 2, "text": EN_A.upper(), "lang": "en"},
        {"doc_id": 3, "text": EN_B, "lang": "en"},
        {"doc_id": 4, "text": FR, "lang": "fr"},
    ]
    src = tmp_path / "in2"
    src.mkdir()
    _write_batch(src / "all.json", rows)
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    q = (
        corpus.corpus_ingest_stream(stream)
        .select("content_hash")
        .writeStream.format("memory")
        .queryName("corpus_hashes")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stream_hashes = {r.content_hash for r in spark.sql("SELECT * FROM corpus_hashes").collect()}
    batch_df = spark.createDataFrame([tuple(r.values()) for r in rows], SCHEMA)
    gated = corpus.corpus_gate_stream(batch_df)  # stateless -> works on batch
    batch_hashes = {r.content_hash for r in dedup.exact_dedup_groups(gated).collect()}
    assert stream_hashes == batch_hashes


def test_corpus_dedup_state_survives_restart(spark, tmp_path):
    """Restart-safety (T6 for the datapipe): a duplicate arriving AFTER a
    checkpointed stop is still suppressed, and prior survivors are not
    re-emitted."""
    src = tmp_path / "rin"
    src.mkdir()
    ckpt = str(tmp_path / "rckpt")
    out = str(tmp_path / "rout")

    def run_once():
        stream = spark.readStream.schema(SCHEMA).json(str(src))
        q = (
            corpus.corpus_ingest_stream(stream)
            .select("doc_id", "content_hash")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return sorted(r.doc_id for r in spark.read.parquet(out).collect())

    _write_batch(src / "b0.json", [{"doc_id": 1, "text": EN_A, "lang": "en"}])
    assert run_once() == [1]
    # after restart: a re-delivery of EN_A (dup vs pre-restart state) + new B
    _write_batch(
        src / "b1.json",
        [
            {"doc_id": 2, "text": EN_A, "lang": "en"},
            {"doc_id": 3, "text": EN_B, "lang": "en"},
        ],
    )
    assert run_once() == [1, 3]


def test_repetition_gate_streams_identically_to_batch(spark, tmp_path):
    """rep_cap engages the Gopher max-token filter on a stream and keeps
    exactly the rows the batch expression keeps (row-local => stream ==
    batch; spread() passes streaming frames through)."""
    from pyspark.sql import functions as F

    from big_data_engineering_financial_analysis_spark.operators.text import with_repetition

    rows = [
        {"doc_id": 1, "text": EN_A, "lang": "en"},                    # repetitive
        {"doc_id": 2, "text": "the and of a is to in on for it", "lang": "en"},
    ]
    src = tmp_path / "in"
    src.mkdir()
    _write_batch(src / "b0.json", rows)

    batch_df = spark.read.schema(SCHEMA).json(str(src))
    batch_kept = sorted(
        r.doc_id
        for r in with_repetition(batch_df).filter(F.col("max_token_ratio") <= 0.25).collect()
    )
    assert batch_kept == [2]  # EN_A is 40% 'the'

    stream = spark.readStream.schema(SCHEMA).json(str(src))
    out = corpus.corpus_gate_stream(stream, quality_floor=0.0, rep_cap=0.25).select("doc_id")
    q = (
        out.writeStream.format("memory")
        .queryName("rep_gate")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r.doc_id for r in spark.sql("SELECT doc_id FROM rep_gate").collect())
    assert got == batch_kept


def test_repetition_gate_filter_not_inlined(spark):
    """The pushdown barrier keeps the RLE/sort intermediates OUT of the
    Filter condition: without it PushDownPredicates substitutes the
    aliased HOF pipeline into the predicate and lambdas re-evaluate the
    sort per array element (quadratic per row — text.py CAUTION).  The
    same Catalyst rules optimize each streaming micro-batch, so the batch
    plan shape is the micro-batch plan shape."""
    batch_df = spark.createDataFrame(
        [(1, EN_A, "en")], "doc_id long, text string, lang string"
    )
    gated = corpus.corpus_gate_stream(batch_df, quality_floor=0.0, rep_cap=0.25)
    plan = gated._jdf.queryExecution().optimizedPlan().toString()
    filter_lines = [ln for ln in plan.splitlines() if "Filter" in ln]
    assert filter_lines, plan
    assert not any("array_sort" in ln for ln in filter_lines), filter_lines


# ---------------------------------------------------------------------------
# incremental near-dedup against a persisted signature store
# ---------------------------------------------------------------------------

SF_MEDIUM = "/root/testdata/sf0.01"


def _run_incremental(spark, tmp_path, tag, batches):
    """Feed document batches through incremental_dedup_sink; return the
    decision rows {doc_id: is_dup}."""
    store = str(tmp_path / f"store_{tag}")
    out = str(tmp_path / f"dec_{tag}")
    from big_data_engineering_financial_analysis_spark.operators import dedup as ded

    # bootstrap: the store starts as the even-id corpus signatures
    docs = spark.read.parquet(f"{SF_MEDIUM}/documents.parquet")
    store_sigs = ded.minhash_signatures(docs.filter("doc_id % 2 = 0"))
    import os

    os.makedirs(f"{store}/sigs", exist_ok=True)
    store_sigs.write.mode("overwrite").parquet(f"{store}/sigs")

    sink = corpus.incremental_dedup_sink(store, out, threshold=0.5)
    for i, batch in enumerate(batches):
        sink(batch, i)
    return {
        r["doc_id"]: r["is_dup"]
        for r in spark.read.parquet(out).collect()
    }


def test_incremental_dedup_batch_boundary_invariant(spark, tmp_path):
    """Survivors depend only on arrival order, never on where micro-batch
    boundaries fall: one batch vs two id-ordered batches vs the batch
    registry operator all agree."""
    docs = spark.read.parquet(f"{SF_MEDIUM}/documents.parquet")
    odds = docs.filter("doc_id % 2 = 1")
    median = odds.approxQuantile("doc_id", [0.5], 0.0)[0]

    one = _run_incremental(spark, tmp_path, "one", [odds])
    two = _run_incremental(
        spark,
        tmp_path,
        "two",
        [
            odds.filter(f"doc_id <= {median}"),
            odds.filter(f"doc_id > {median}"),
        ],
    )
    assert one == two and len(one) == odds.count()

    # and both equal the pure-batch operator (the dedup_incremental
    # registry query's engine path)
    from big_data_engineering_financial_analysis_spark.operators import dedup as ded

    store_sigs = ded.minhash_signatures(docs.filter("doc_id % 2 = 0"))
    decisions, sigs = ded.incremental_minhash_dedup(odds, store_sigs, threshold=0.5)
    batch = {r["doc_id"]: r["is_dup"] for r in decisions.collect()}
    sigs.unpersist()
    assert one == batch
    assert any(v == 1 for v in one.values()), "fixture has near-dups"


def test_incremental_dedup_replayed_batch_skipped(spark, tmp_path):
    """A replayed batch id must not double-append decisions or store
    signatures (the _batches marker protocol)."""
    docs = spark.read.parquet(f"{SF_MEDIUM}/documents.parquet")
    odds = docs.filter("doc_id % 2 = 1").limit(20)
    store = str(tmp_path / "store_rp")
    out = str(tmp_path / "dec_rp")
    sink = corpus.incremental_dedup_sink(store, out, threshold=0.5)
    sink(odds, 0)
    n_dec = spark.read.parquet(out).count()
    n_sig = spark.read.parquet(f"{store}/sigs").count()
    sink(odds, 0)  # replay
    assert spark.read.parquet(out).count() == n_dec
    assert spark.read.parquet(f"{store}/sigs").count() == n_sig


def test_incremental_dedup_dropped_doc_still_blocks(spark, tmp_path):
    """The all-arrivals store contract: a document whose near-duplicate
    was itself DROPPED in an earlier batch is still dropped — with a
    survivors-only store it would slip through depending on batching."""
    rows = [
        (2, "alpha beta gamma delta epsilon zeta eta theta"),  # store doc
    ]
    store_docs = spark.createDataFrame(rows, "doc_id long, text string")
    from big_data_engineering_financial_analysis_spark.operators import dedup as ded

    store = str(tmp_path / "store_chain")
    out = str(tmp_path / "dec_chain")
    import os

    os.makedirs(f"{store}/sigs", exist_ok=True)
    ded.minhash_signatures(store_docs).write.mode("overwrite").parquet(
        f"{store}/sigs"
    )
    sink = corpus.incremental_dedup_sink(store, out, threshold=0.5)
    dup_of_store = "alpha beta gamma delta epsilon zeta eta theta extra"
    sink(
        spark.createDataFrame([(3, dup_of_store)], "doc_id long, text string"),
        0,
    )  # doc 3 drops vs store doc 2
    sink(
        spark.createDataFrame([(5, dup_of_store)], "doc_id long, text string"),
        1,
    )  # doc 5's only close match by text is the DROPPED doc 3 / store 2
    got = {
        r["doc_id"]: r["is_dup"] for r in spark.read.parquet(out).collect()
    }
    assert got == {3: 1, 5: 1}


def test_signature_compaction_dedupe_is_decision_invariant(spark, tmp_path):
    """Keeping one min-id row per distinct minhash signature can never
    change a future arrival's verdict: band keys and est_jaccard are
    functions of the signature alone, and store-partner ids are never
    compared.  Decisions against the compacted store must equal the
    uncompacted run exactly; the store itself must shrink."""
    import os

    from big_data_engineering_financial_analysis_spark.operators import dedup as ded

    docs = spark.read.parquet(f"{SF_MEDIUM}/documents.parquet")
    evens = docs.filter("doc_id % 2 = 0")
    # exact-duplicate signatures guaranteed: the same texts under shifted ids
    shifted = evens.selectExpr("doc_id + 10000000 AS doc_id", "text")
    store_docs = evens.select("doc_id", "text").unionByName(shifted)

    def build_store(tag):
        store = str(tmp_path / f"store_{tag}")
        os.makedirs(f"{store}/sigs", exist_ok=True)
        ded.minhash_signatures(store_docs).write.mode("overwrite").parquet(
            f"{store}/sigs"
        )
        return store

    odds = docs.filter("doc_id % 2 = 1")
    plain_store, compact_store = build_store("plain"), build_store("compact")
    stats = corpus.compact_signature_store(spark, compact_store)
    assert stats["rows_after"] <= stats["rows_before"] // 2  # dups collapsed

    def decide(store):
        out = str(tmp_path / f"dec_{os.path.basename(store)}")
        sink = corpus.incremental_dedup_sink(store, out, threshold=0.5)
        sink(odds, 0)
        return {r["doc_id"]: r["is_dup"] for r in spark.read.parquet(out).collect()}

    assert decide(plain_store) == decide(compact_store)


def test_crashed_compaction_recovers_not_empty(spark, tmp_path):
    """A crash between compact_signature_store's two renames leaves only
    sigs._pre_compact.  Both the next compaction AND the next sink batch
    must restore it — never bootstrap an empty store (which would
    silently disable all history dedup)."""
    import os
    import shutil

    from big_data_engineering_financial_analysis_spark.operators import dedup as ded

    docs = spark.read.parquet(f"{SF_MEDIUM}/documents.parquet").limit(60)
    store = str(tmp_path / "store")
    os.makedirs(f"{store}/sigs", exist_ok=True)
    ded.minhash_signatures(docs.select("doc_id", "text")).write.mode(
        "overwrite"
    ).parquet(f"{store}/sigs")
    n_rows = spark.read.parquet(f"{store}/sigs").count()

    # simulate the crash window: sigs renamed aside, replacement missing
    os.rename(f"{store}/sigs", f"{store}/sigs._pre_compact")

    # sink discovery heals it: an exact-duplicate arrival is flagged,
    # proving the history was restored, not bootstrapped empty
    dup_arrivals = docs.selectExpr("doc_id + 5000000 AS doc_id", "text").limit(5)
    out = str(tmp_path / "dec")
    corpus.incremental_dedup_sink(store, out, threshold=0.5)(dup_arrivals, 0)
    decided = {r["doc_id"]: r["is_dup"] for r in spark.read.parquet(out).collect()}
    assert decided and all(v == 1 for v in decided.values())
    assert not os.path.exists(f"{store}/sigs._pre_compact")

    # crash after the swap: superseded aside + dead stage are reaped
    shutil.copytree(f"{store}/sigs", f"{store}/sigs._pre_compact")
    os.makedirs(f"{store}/sigs._compact_stage")
    stats = corpus.compact_signature_store(spark, store)
    assert stats["rows_before"] >= n_rows  # read the LIVE store, not the aside
    assert not os.path.exists(f"{store}/sigs._pre_compact")
    assert not os.path.exists(f"{store}/sigs._compact_stage")


def test_signature_compaction_watermark_horizon(spark, tmp_path):
    """retain_min_id eviction: decisions whose partners are in-horizon
    are untouched; an arrival whose ONLY near-duplicate was evicted is
    now kept — the documented horizon semantics, not an accident."""
    import os

    from big_data_engineering_financial_analysis_spark.operators import dedup as ded

    t_old = "alpha beta gamma delta epsilon zeta eta theta"
    t_new = "one two three four five six seven eight nine"
    store_docs = spark.createDataFrame(
        [(10, t_old), (100, t_new)], "doc_id long, text string"
    )

    def build_store(tag):
        store = str(tmp_path / f"wm_store_{tag}")
        os.makedirs(f"{store}/sigs", exist_ok=True)
        ded.minhash_signatures(store_docs).write.mode("overwrite").parquet(
            f"{store}/sigs"
        )
        return store

    arrivals = spark.createDataFrame(
        [(201, t_old), (202, t_new)], "doc_id long, text string"
    )

    def decide(store):
        out = str(tmp_path / f"wm_dec_{os.path.basename(store)}")
        sink = corpus.incremental_dedup_sink(store, out, threshold=0.5)
        sink(arrivals, 0)
        return {r["doc_id"]: r["is_dup"] for r in spark.read.parquet(out).collect()}

    full = decide(build_store("full"))
    assert full == {201: 1, 202: 1}

    pruned_store = build_store("pruned")
    stats = corpus.compact_signature_store(
        spark, pruned_store, retain_min_id=50, dedupe_signatures=False
    )
    assert (stats["rows_before"], stats["rows_after"]) == (2, 1)
    pruned = decide(pruned_store)
    assert pruned == {201: 0, 202: 1}  # evicted partner -> kept; in-horizon unchanged


def test_signature_compaction_empty_store_noop(spark, tmp_path):
    store = str(tmp_path / "empty_store")
    assert corpus.compact_signature_store(spark, store) == {
        "rows_before": 0,
        "rows_after": 0,
    }


def test_incremental_sink_rejects_remote_store_path(spark):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="driver-local"):
        corpus.incremental_dedup_sink("s3://bucket/store", "/tmp/dec")


# ---------------------------------------------------------------------------
# incremental cluster-label maintenance (labels store)
# ---------------------------------------------------------------------------


def _run_cluster_sink(spark, tmp_path, tag, batches, n_buckets=8):
    """Feed document batches through incremental_cluster_sink; return
    ({node: component}, store_path)."""
    store = str(tmp_path / f"cstore_{tag}")
    sink = corpus.incremental_cluster_sink(store, threshold=0.5, n_buckets=n_buckets)
    for i, batch in enumerate(batches):
        sink(batch, i)
    labels = {
        r["node"]: r["component"]
        for r in spark.read.parquet(f"{store}/labels").collect()
    }
    return labels, store


def test_cluster_sink_batch_boundary_invariant(spark, tmp_path):
    """The live labeling is invariant to micro-batch split, covers every
    arrival exactly once, and equals connected components over the
    operator-level pair stream."""
    from big_data_engineering_financial_analysis_spark.operators import dedup as ded

    docs = spark.read.parquet(f"{SF_MEDIUM}/documents.parquet")
    odds = docs.filter("doc_id % 2 = 1")
    median = odds.approxQuantile("doc_id", [0.5], 0.0)[0]

    one, _ = _run_cluster_sink(spark, tmp_path, "one", [odds])
    two, _ = _run_cluster_sink(
        spark,
        tmp_path,
        "two",
        [odds.filter(f"doc_id <= {median}"), odds.filter(f"doc_id > {median}")],
    )
    assert one == two
    assert len(one) == odds.count()

    # ground truth: star-CC over the single-shot pair emission, plus
    # self-labels for pair-less docs
    empty = ded.minhash_signatures(odds.limit(0))
    pairs, sigs = ded.incremental_minhash_pairs(odds, empty, threshold=0.5)
    cc = {
        r.node: r.component
        for r in ded.connected_components_star(pairs).collect()
    }
    sigs.unpersist()
    expected = {
        r.doc_id: cc.get(r.doc_id, r.doc_id) for r in odds.select("doc_id").collect()
    }
    assert one == expected
    assert any(k != v for k, v in one.items()), "fixture has near-dup clusters"
    spark.catalog.clearCache()


def test_cluster_sink_merges_components_across_batches(spark, tmp_path):
    """A later arrival near-duplicating docs from two earlier batches
    merges their components into one (min-id label), and a replayed
    batch changes nothing."""
    import os

    base = (
        "spark window merge batch table a big join batch table window big "
        "the join line agg small slow filter value small value table the "
        "part data"
    )
    v1 = base
    v2 = base.replace("filter value", "filter changed")   # near-dup of v1
    v3 = base.replace("part data", "part rows")           # near-dup of v1

    def df(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    store = str(tmp_path / "cstore_merge")
    sink = corpus.incremental_cluster_sink(store, threshold=0.5, n_buckets=4)
    sink(df([(1, v1), (50, "totally different words about fish " * 4)]), 0)
    sink(df([(2, v2)]), 1)     # joins component 1
    sink(df([(3, v3)]), 2)     # also joins component 1
    labels = {
        r["node"]: r["component"]
        for r in spark.read.parquet(f"{store}/labels").collect()
    }
    assert labels == {1: 1, 2: 1, 3: 1, 50: 50}

    # replay batch 2: marker short-circuits, stores byte-identical
    before = sorted(os.listdir(f"{store}/labels"))
    sink(df([(3, v3)]), 2)
    assert sorted(os.listdir(f"{store}/labels")) == before
    labels2 = {
        r["node"]: r["component"]
        for r in spark.read.parquet(f"{store}/labels").collect()
    }
    assert labels2 == labels
    spark.catalog.clearCache()


def test_cluster_sink_rewrites_only_affected_buckets(spark, tmp_path):
    """The store-write contract: a batch touching one small cluster
    leaves every unaffected bucket directory untouched on disk."""
    import os

    filler = [
        (i, f"unique filler document number {i} with its own words {i*7} "
            f"{i*13} nothing shared across rows {i}")
        for i in range(100, 140)
    ]
    base = (
        "spark window merge batch table a big join batch table window big "
        "the join line agg small slow filter value small value table the "
        "part data"
    )

    def df(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    store = str(tmp_path / "cstore_buckets")
    n_buckets = 16
    sink = corpus.incremental_cluster_sink(store, threshold=0.5, n_buckets=n_buckets)
    sink(df(filler + [(1, base)]), 0)

    labels_dir = f"{store}/labels"
    mtimes = {
        d: os.path.getmtime(os.path.join(labels_dir, d))
        for d in os.listdir(labels_dir)
        if d.startswith("bucket=")
    }
    import time as _t

    _t.sleep(1.1)  # mtime resolution guard
    # batch 1: one near-dup of doc 1 — affects bucket(1) and bucket(2) only
    sink(df([(2, base.replace("filter value", "filter changed"))]), 1)
    from pyspark.sql import functions as F

    want = {
        f"bucket={r.b}"
        for r in spark.range(1)
        .select(F.pmod(F.hash(F.lit(1).cast("long")), F.lit(n_buckets)).alias("b"))
        .union(
            spark.range(1).select(
                F.pmod(F.hash(F.lit(2).cast("long")), F.lit(n_buckets)).alias("b")
            )
        )
        .collect()
    }
    after = {
        d: os.path.getmtime(os.path.join(labels_dir, d))
        for d in os.listdir(labels_dir)
        if d.startswith("bucket=")
    }
    changed = {d for d in mtimes if after.get(d, 0) != mtimes[d]} | (
        set(after) - set(mtimes)
    )
    assert changed <= want and changed, (changed, want)
    # and the labeling is still right
    labels = {
        r["node"]: r["component"]
        for r in spark.read.parquet(labels_dir).collect()
    }
    assert labels[2] == 1 and labels[1] == 1 and len(labels) == 42
    spark.catalog.clearCache()


def test_cluster_sink_rejects_remote_store_path(spark):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="driver-local"):
        corpus.incremental_cluster_sink("hdfs://nn/store")
