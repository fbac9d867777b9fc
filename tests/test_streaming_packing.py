"""Streaming sequence packing == batch packing for in-order feeds."""

from __future__ import annotations

import json

from big_data_engineering_financial_analysis_spark.operators.packing import pack_chunks
from big_data_engineering_financial_analysis_spark.streaming.packing import pack_stream

SCHEMA = "doc_id long, text string, source string"


def _write_batch(path, rows):
    path.write_text("\n".join(json.dumps(r) for r in rows) + "\n")


def test_stream_packing_matches_batch_across_microbatches(spark, tmp_path):
    """Two micro-batches, two shards; chunk ids continue across batches
    (shard A's batch-0 partial chunk is finished by batch 1) and the
    result equals batch pack_chunks over the concatenated input."""
    src = tmp_path / "in"
    src.mkdir()
    # shard A: 3 + 6 tokens in batch 0, 5 more in batch 1 (chunk 4 spans)
    _write_batch(
        src / "b0.json",
        [
            {"doc_id": 1, "text": "t t t", "source": "A"},
            {"doc_id": 2, "text": "u u u u u u", "source": "A"},
            {"doc_id": 3, "text": "w w", "source": "B"},
        ],
    )
    _write_batch(
        src / "b1.json",
        [
            {"doc_id": 4, "text": "v v v v v", "source": "A"},
            {"doc_id": 5, "text": "x x x", "source": "B"},
        ],
    )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        pack_stream(stream, chunk_tokens=4)
        .writeStream.format("memory")
        .queryName("packed_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.shard, r.chunk_id, r.doc_id): (r.seg_start, r.seg_len)
        for r in spark.sql("SELECT * FROM packed_stream").collect()
    }

    batch_df = spark.read.schema(SCHEMA).json(str(src))
    want = {
        (r.shard, r.chunk_id, r.doc_id): (r.seg_start, r.seg_len)
        for r in pack_chunks(batch_df, chunk_tokens=4).collect()
    }
    assert got == want
    # continuation specifically: doc 4 starts mid-chunk-2 of shard A
    # (stream position 9 of chunks [8,12) ...), i.e. its first slice is
    # NOT seg_start 0 in a fresh chunk
    a4 = [(c, s) for (sh, c, d), (s, _) in got.items() if sh == "A" and d == 4]
    assert min(a4)[0] == 2  # first chunk doc 4 touches is chunk 2
