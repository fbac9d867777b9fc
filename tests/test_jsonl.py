"""JSONL corpus source/sink: schema-explicit reads, corrupt-line
capture, seeded-shuffle shard export, and the parquet bridge."""

from __future__ import annotations

import gzip
import json
import os

import pytest
from pyspark.sql import functions as F

from big_data_engineering_financial_analysis_spark.sources import jsonl

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    from big_data_engineering_financial_analysis_spark.sources.parquet import load_table

    return load_table(spark, SF_DIR, "documents").cache()


def _write_jsonl(path: str, lines: list[str]) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")


def test_read_documents_jsonl_roundtrip(spark, docs, tmp_path):
    """documents.parquet -> JSONL -> read back == original rows."""
    p = str(tmp_path / "corpus")
    docs.write.mode("overwrite").json(p)
    back = jsonl.read_documents_jsonl(spark, p)
    assert back.schema.fieldNames() == docs.schema.fieldNames()
    a = sorted(map(tuple, docs.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


def test_corrupt_lines_captured_not_fatal(spark, tmp_path):
    p = str(tmp_path / "dirty" / "part-0.jsonl")
    _write_jsonl(
        p,
        [
            json.dumps({"doc_id": 1, "text": "ok", "lang": "en",
                        "source": "web", "n_chars": 2}),
            "{this is not json",
            json.dumps({"doc_id": 2, "text": "also ok", "lang": "en",
                        "source": "web", "n_chars": 7}),
        ],
    )
    d = os.path.dirname(p)
    assert jsonl.corrupt_line_count(spark, d) == 1
    parsed = jsonl.read_documents_jsonl(spark, d)
    assert sorted(r.doc_id for r in parsed.collect()) == [1, 2]


def test_missing_keys_are_null(spark, tmp_path):
    """A JSONL record without a field yields NULL — parquet-read parity."""
    p = str(tmp_path / "sparse" / "part-0.jsonl")
    _write_jsonl(p, [json.dumps({"doc_id": 5, "text": "no lang key"})])
    row = jsonl.read_documents_jsonl(spark, os.path.dirname(p)).first()
    assert row.doc_id == 5 and row.lang is None and row.n_chars is None


def test_write_corpus_jsonl_shards_match_parquet_sharder(spark, docs, tmp_path):
    """Same seed => the JSONL export's shard assignment and within-shard
    order equal write_corpus_shards' (the parquet exporter)."""
    from big_data_engineering_financial_analysis_spark.operators.export import corpus_shuffle

    p = str(tmp_path / "shards")
    jsonl.write_corpus_jsonl(docs, p, n_shards=4, seed=7)
    expected = {
        (r.shard, r.pos): r.doc_id
        for r in corpus_shuffle(docs, n_shards=4, seed=7).collect()
    }
    shard_dirs = sorted(
        d for d in os.listdir(p) if d.startswith("shard=")
    )
    assert len(shard_dirs) == 4
    got = {}
    for d in shard_dirs:
        shard = int(d.split("=")[1])
        lines = []
        for f in sorted(os.listdir(os.path.join(p, d))):
            if f.endswith(".json"):
                with open(os.path.join(p, d, f)) as fh:
                    lines += [json.loads(ln) for ln in fh if ln.strip()]
        for pos, rec in enumerate(lines):
            got[(shard, pos)] = rec["doc_id"]
    assert got == expected


def test_write_corpus_jsonl_gzip(spark, docs, tmp_path):
    """Compressed export: one .gz member per shard, readable by both the
    engine and plain gzip (the trainer-side contract)."""
    p = str(tmp_path / "gz")
    jsonl.write_corpus_jsonl(docs, p, n_shards=2, seed=0, compression="gzip")
    gz_files = [
        os.path.join(root, f)
        for root, _, files in os.walk(p)
        for f in files
        if f.endswith(".json.gz")
    ]
    assert len(gz_files) == 2
    with gzip.open(gz_files[0], "rt") as fh:
        first = json.loads(fh.readline())
    assert "doc_id" in first and "text" in first
    back = jsonl.read_documents_jsonl(spark, p)
    assert back.count() == docs.count()


def test_stream_documents_jsonl_feeds_corpus_pipeline(spark, tmp_path):
    """Streaming JSONL drop directory -> gate+dedup chain: malformed
    lines dropped by the source, duplicate content suppressed by state."""
    from big_data_engineering_financial_analysis_spark.streaming import corpus

    # the proven gate-passing fixture text (test_streaming_corpus.py):
    # mostly-stopword tokens -> quality ~0.55, lang_guess 'en'
    body = "the and of the and of the and of the"
    src = tmp_path / "drop"
    _write_jsonl(
        str(src / "b0.jsonl"),
        [
            json.dumps({"doc_id": 1, "text": body, "lang": "en",
                        "source": "web", "n_chars": len(body)}),
            "{broken",
        ],
    )
    _write_jsonl(
        str(src / "b1.jsonl"),
        [
            json.dumps({"doc_id": 2, "text": body.upper(), "lang": "en",
                        "source": "web", "n_chars": len(body)}),
            json.dumps({"doc_id": 3,
                        "text": "and the of and the of and the of and",
                        "lang": "en", "source": "web", "n_chars": 36}),
        ],
    )
    stream = jsonl.stream_documents_jsonl(spark, str(src), max_files_per_trigger=1)
    out = corpus.corpus_ingest_stream(stream).select("doc_id")
    q = (
        out.writeStream.format("memory")
        .queryName("jsonl_surv")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    ids = sorted(r.doc_id for r in spark.sql("SELECT * FROM jsonl_surv").collect())
    # 1 survives; 2 is a canonical dup (case); 3 is new; the broken line
    # never reaches the pipeline
    assert ids == [1, 3]


def test_jsonl_to_parquet_bridge(spark, docs, tmp_path):
    src = str(tmp_path / "in")
    dst = str(tmp_path / "out")
    docs.write.mode("overwrite").json(src)
    n = jsonl.jsonl_to_parquet(spark, src, dst)
    assert n == docs.count()
    back = spark.read.parquet(dst)
    assert back.filter(F.col("text").isNull()).count() == 0
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, docs.collect()))
