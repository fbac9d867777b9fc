"""Streaming sequence packing == batch packing for in-order feeds."""

from __future__ import annotations

import json

from big_data_engineering_financial_analysis_spark.operators.packing import pack_chunks
from big_data_engineering_financial_analysis_spark.streaming.packing import pack_stream

SCHEMA = "doc_id long, text string, source string"


def _write_batch(path, rows):
    path.write_text("\n".join(json.dumps(r) for r in rows) + "\n")


def _run_available(spark, src, ckpt, out):
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    q = (
        pack_stream(stream, chunk_tokens=4)
        .writeStream.format("parquet")
        .option("path", str(out))
        .outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return {
        (r.shard, r.chunk_id, r.doc_id): (r.seg_start, r.seg_len)
        for r in spark.read.parquet(str(out)).collect()
    }


def test_stream_packing_matches_batch_across_restarts(spark, tmp_path):
    """Second run resumes from checkpointed per-shard positions (shard
    A's partial chunk 2 is continued, not restarted), and the combined
    output equals batch pack_chunks over the concatenated input.  Two
    sequential availableNow runs make the batch order deterministic
    (a single run with maxFilesPerTrigger can list files in any order).
    """
    src = tmp_path / "in"
    src.mkdir()
    ckpt = tmp_path / "ckpt"
    # run 1 — shard A: 3 + 6 tokens (ends mid-chunk 2), shard B: 2 tokens
    _write_batch(
        src / "b0.json",
        [
            {"doc_id": 1, "text": "t t t", "source": "A"},
            {"doc_id": 2, "text": "u u u u u u", "source": "A"},
            {"doc_id": 3, "text": "w w", "source": "B"},
        ],
    )
    out = tmp_path / "out"
    got = dict(_run_available(spark, src, ckpt, out))
    # run 2 — new files only (checkpoint remembers b0): A +5, B +3 tokens
    _write_batch(
        src / "b1.json",
        [
            {"doc_id": 4, "text": "v v v v v", "source": "A"},
            {"doc_id": 5, "text": "x x x", "source": "B"},
        ],
    )
    got = _run_available(spark, src, ckpt, out)  # parquet dir accumulates both runs

    batch_df = spark.read.schema(SCHEMA).json(str(src))
    want = {
        (r.shard, r.chunk_id, r.doc_id): (r.seg_start, r.seg_len)
        for r in pack_chunks(batch_df, chunk_tokens=4).collect()
    }
    assert got == want
    # continuation specifically: doc 4 starts at stream position 9, so
    # the first chunk it touches is chunk 2 (shard A's partial), not a
    # fresh chunk 0
    a4 = [(c, s) for (sh, c, d), (s, _) in got.items() if sh == "A" and d == 4]
    assert min(a4)[0] == 2
