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
