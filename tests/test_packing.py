"""Hand-computable semantics + invariants for sequence packing."""

from __future__ import annotations

import pytest

from big_data_engineering_financial_analysis_spark.operators.packing import pack_chunks


@pytest.fixture(scope="module")
def packed(spark):
    # shard A stream: doc1 (3 tokens) + doc2 (6 tokens) = 9 tokens,
    # chunked at 4: chunks 0..2.  doc2 straddles chunks 0->2.
    # shard B: doc4 (4 tokens) exactly one chunk.
    rows = [
        ("A", 1, "t t t"),
        ("A", 2, "u u u u u u"),
        ("B", 4, "v v v v"),
    ]
    df = spark.createDataFrame(rows, "source string, doc_id long, text string")
    out = pack_chunks(df, chunk_tokens=4)
    return out.collect()


def test_chunk_assignments(packed):
    got = {(r["shard"], r["chunk_id"], r["doc_id"]): (r["seg_start"], r["seg_len"]) for r in packed}
    assert got == {
        ("A", 0, 1): (0, 3),   # doc1 fully in chunk 0
        ("A", 0, 2): (0, 1),   # doc2 token 0 finishes chunk 0
        ("A", 1, 2): (1, 4),   # doc2 tokens 1-4 fill chunk 1
        ("A", 2, 2): (5, 1),   # doc2 token 5 starts chunk 2 (final, short)
        ("B", 0, 4): (0, 4),   # doc4 exactly fills chunk 0
    }


def test_zero_token_doc_dropped(spark):
    """Zero-token documents occupy no stream positions and emit no rows
    (via the materialized n_tokens_col path — whitespace-split text can
    never be 0 tokens since split('') is [''])."""
    rows = [("A", 1, 3), ("A", 2, 0), ("A", 3, 2)]
    df = spark.createDataFrame(rows, "source string, doc_id long, nt long")
    out = pack_chunks(df, chunk_tokens=4, n_tokens_col="nt").collect()
    assert all(r["doc_id"] != 2 for r in out)
    # doc3 still starts at stream position 3 (doc2 contributed nothing)
    got = {(r["chunk_id"], r["doc_id"]): (r["seg_start"], r["seg_len"]) for r in out}
    assert got == {(0, 1): (0, 3), (0, 3): (0, 1), (1, 3): (1, 1)}


def test_chunks_tile_exactly(packed):
    """Within every chunk the segments sum to chunk_tokens (except each
    shard's final chunk)."""
    from collections import defaultdict

    by_chunk = defaultdict(list)
    for r in packed:
        by_chunk[(r["shard"], r["chunk_id"])].append(r)
    last = {s: max(c for (s2, c) in by_chunk if s2 == s) for (s, _) in by_chunk}
    for (shard, chunk), rows in by_chunk.items():
        total = sum(r["seg_len"] for r in rows)
        assert total <= 4
        if chunk != last[shard]:
            assert total == 4


def test_duplicate_ids_fail_loudly(spark):
    """Duplicate (shard, id) rows violate the determinism contract (the
    cumsum tie order would be nondeterministic); the in-plan lag() guard
    fails the job instead of silently mis-packing."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    rows = [("A", 1, "t t t"), ("A", 1, "u u"), ("A", 2, "v")]
    df = spark.createDataFrame(rows, "source string, doc_id long, text string")
    with pytest.raises(SparkRuntimeException, match="duplicate"):
        pack_chunks(df, chunk_tokens=4).collect()


# ---------------------------------------------------------------------------
# sliding_chunks (per-document overlapping windows)
# ---------------------------------------------------------------------------


def _py_sliding(tokens_, w, s):
    """Driver-side reference: standard sliding-window chunking."""
    n = len(tokens_)
    if n == 0:
        return []
    n_extra = (max(n - w, 0) + s - 1) // s
    out = []
    for i in range(n_extra + 1):
        start = i * s
        length = min(w, n - start)
        out.append((i, start, length, " ".join(tokens_[start : start + length])))
    return out


def test_sliding_chunks_matches_reference(spark):
    from big_data_engineering_financial_analysis_spark.operators.packing import sliding_chunks

    docs = {
        1: "a b c d e f g h i j",   # 10 tokens: chunks at 0, 4 (W=8,S=4)
        2: "x y z",                 # short: single chunk of 3
        3: " ".join(f"t{i}" for i in range(17)),  # 17: starts 0,4,8,12 (last len 5)
        4: "p q r s t u v w",       # exactly W: single chunk
        5: "k " * 12,               # 12 tokens, (12-8+3)//4=1 -> starts 0,4
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in docs.items()], "doc_id long, text string"
    )
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["chunk_start"], r["chunk_len"], r["chunk_text"])
        for r in sliding_chunks(df, window_tokens=8, stride=4).collect()
    }
    want = {}
    for i, t in docs.items():
        for idx, start, length, text in _py_sliding(t.split(), 8, 4):
            want[(i, idx)] = (start, length, text)
    assert got == want


def test_sliding_chunks_coverage_and_overlap(spark):
    """Every token is covered; consecutive chunks overlap by exactly W-S
    except possibly the last (which may overlap more, never less)."""
    from big_data_engineering_financial_analysis_spark.operators.packing import sliding_chunks

    df = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(n))) for i, n in enumerate([1, 5, 6, 7, 11, 29, 48])],
        "doc_id long, text string",
    )
    rows = sliding_chunks(df, window_tokens=6, stride=4).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_idx"])
        covered = set()
        for r in chunks:
            assert 1 <= r["chunk_len"] <= 6
            covered.update(range(r["chunk_start"], r["chunk_start"] + r["chunk_len"]))
        n_tokens = max(covered) + 1
        assert covered == set(range(n_tokens))
        # last chunk reaches the document end
        last = chunks[-1]
        assert last["chunk_start"] + last["chunk_len"] == n_tokens


def test_sliding_chunks_rejects_bad_stride(spark):
    from big_data_engineering_financial_analysis_spark.operators.packing import sliding_chunks

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        sliding_chunks(df, window_tokens=4, stride=5)
    with pytest.raises(ValueError):
        sliding_chunks(df, window_tokens=4, stride=0)
