"""Property-based checks for repetition metrics and sequence packing
against pure-Python models.

Few hypothesis examples (Spark-job cost per example); the deterministic
hand-computed cases live in test_text.py / test_packing.py.
"""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

from big_data_engineering_financial_analysis_spark.operators.packing import pack_chunks
from big_data_engineering_financial_analysis_spark.operators.text import with_repetition

WORDS = st.sampled_from(["a", "bb", "ccc", "dd", "e"])
DOC = st.lists(WORDS, min_size=1, max_size=30).map(" ".join)


def _model(text: str):
    toks = text.split()
    n = len(toks)
    nc = len(text)
    mx = Counter(toks).most_common(1)[0][1]
    out = {"max_token_ratio": round(mx / n, 6)}
    bigrams = [" ".join(toks[i : i + 2]) for i in range(n - 1)]
    if bigrams:
        c = Counter(bigrams)
        top = min(sorted(c), key=lambda g: (-c[g], g))
        out["top_bigram_char_ratio"] = round(c[top] * len(top) / nc, 6)
    else:
        out["top_bigram_char_ratio"] = None
    trigrams = [" ".join(toks[i : i + 3]) for i in range(n - 2)]
    if trigrams:
        # UNION of covered spans (each char once — the Gopher char-mask
        # rule): formulation-independent set model, cross-checking the
        # engines' island arithmetic
        c = Counter(trigrams)
        words: set[int] = set()
        gaps: set[int] = set()  # gap i = the space between word i, i+1
        for p, g in enumerate(trigrams):
            if c[g] > 1:
                words |= {p, p + 1, p + 2}
                gaps |= {p, p + 1}
        dup = sum(len(toks[i]) for i in words) + len(gaps)
        out["dup_trigram_char_ratio"] = round(dup / nc, 6)
    else:
        out["dup_trigram_char_ratio"] = None
    return out


@settings(max_examples=8, deadline=None)
@given(texts=st.lists(DOC, min_size=1, max_size=8))
def test_repetition_matches_python_model(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    rows = with_repetition(df).select(
        "doc_id", "max_token_ratio", "top_bigram_char_ratio", "dup_trigram_char_ratio"
    ).collect()
    got = {r["doc_id"]: r.asDict() for r in rows}
    for i, text in enumerate(texts):
        want = _model(text)
        for k, v in want.items():
            assert got[i][k] == v, (k, text, got[i][k], v)


@settings(max_examples=8, deadline=None)
@given(
    nts=st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=12),
    chunk=st.integers(min_value=1, max_value=16),
)
def test_packing_invariants(spark, nts, chunk):
    """Conservation (every token lands in exactly one chunk slice),
    contiguity within each doc, and chunk fill == chunk size except each
    shard's last chunk."""
    rows = [("s", i, n) for i, n in enumerate(nts)]
    df = spark.createDataFrame(rows, "source string, doc_id long, nt long")
    out = pack_chunks(df, chunk_tokens=chunk, n_tokens_col="nt").collect()
    by_doc: dict[int, int] = {}
    by_chunk: dict[int, int] = {}
    for r in out:
        assert 0 < r["seg_len"] <= chunk
        by_doc[r["doc_id"]] = by_doc.get(r["doc_id"], 0) + r["seg_len"]
        by_chunk[r["chunk_id"]] = by_chunk.get(r["chunk_id"], 0) + r["seg_len"]
    for i, n in enumerate(nts):
        assert by_doc.get(i, 0) == n          # conservation per doc
    total = sum(nts)
    if total:
        last = max(by_chunk)
        for cid, fill in by_chunk.items():
            assert fill == chunk or cid == last
        assert sum(by_chunk.values()) == total
        assert set(by_chunk) == set(range(last + 1))  # no chunk gaps


# ---------------------------------------------------------------------------
# maximal-span excision: pure-Python model of the island semantics
# ---------------------------------------------------------------------------

SPAN_WORDS = st.sampled_from(["x", "y", "z", "w"])
SPAN_DOC = st.lists(SPAN_WORDS, min_size=0, max_size=24).map(" ".join)


def _span_model(docs, span_n):
    """Pure-Python twin of span_removal_spans: dup 10-gram starts by
    first-global-occurrence, gaps-and-islands with gap > span_n."""
    occ = {}
    starts = {}  # doc_id -> [dup start positions]
    for doc_id, text in docs:
        toks = [t for t in text.split()] if text.strip() else []
        for p in range(len(toks) - span_n + 1):
            g = " ".join(toks[p : p + span_n])
            if g in occ:
                starts.setdefault(doc_id, []).append(p)
            else:
                occ[g] = (doc_id, p)
    out = []
    for doc_id, ps in starts.items():
        ps.sort()
        isl = [[ps[0], ps[0]]]
        for p in ps[1:]:
            if p - isl[-1][1] > span_n:
                isl.append([p, p])
            else:
                isl[-1][1] = p
        for s, e in isl:
            out.append(
                (doc_id, s, e + span_n - 1, e + span_n - s,
                 sum(1 for p in ps if s <= p <= e))
            )
    return sorted(out)


@settings(max_examples=8, deadline=None)
@given(st.lists(SPAN_DOC, min_size=1, max_size=6))
def test_span_islands_match_python_model(spark, texts):
    """Random small-alphabet corpora (high collision rate — the
    adversarial case for island splitting) agree with an independent
    pure-Python model, including boundaries and start counts."""
    from big_data_engineering_financial_analysis_spark.operators.dedup import span_removal_spans

    n = 3
    docs = list(enumerate(texts, start=1))
    df = spark.createDataFrame(
        [(i, t) for i, t in docs], "doc_id long, text string"
    )
    got = sorted(
        (r["doc_id"], r["span_start"], r["span_end"], r["n_words_cut"],
         r["n_dup_starts"])
        for r in span_removal_spans(df, span_n=n).collect()
    )
    assert got == _span_model(docs, n)


def _budget_model(rows, budgets):
    """Pure-Python token_budget_mix: per-domain md5(seed:id)-ordered
    prefix under a hard cumulative-token ceiling."""
    import hashlib

    out = {}
    by_dom: dict = {}
    for doc_id, dom, nt in rows:
        if dom in budgets:
            by_dom.setdefault(dom, []).append((doc_id, nt))
    for dom, docs in by_dom.items():
        docs.sort(
            key=lambda d: (hashlib.md5(f"0:{d[0]}".encode()).hexdigest(), d[0])
        )
        cum = 0
        for doc_id, nt in docs:
            cum += nt
            if cum > budgets[dom]:
                break
            out[doc_id] = cum
    return out


@settings(max_examples=6, deadline=None)
@given(
    nts=st.lists(st.integers(min_value=0, max_value=9), min_size=1, max_size=40),
    b0=st.integers(min_value=0, max_value=60),
    b1=st.integers(min_value=0, max_value=60),
)
def test_token_budget_mix_matches_python_model(spark, nts, b0, b1):
    """The distributed two-pass cumsum (operators/export.py) equals the
    naive per-domain ordered-prefix model on random token counts and
    budgets — including zero budgets, zero-token docs, and domains
    missing from the recipe."""
    from big_data_engineering_financial_analysis_spark.operators import export

    rows = [(i, ["x", "y", "z"][i % 3], nt) for i, nt in enumerate(nts)]
    budgets = {"x": b0, "y": b1}  # "z" deliberately unbudgeted
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_tokens long")
    got = {
        r.doc_id: r.cum_tokens
        for r in export.token_budget_mix(
            df.repartition(5), budgets, num_partitions=4
        ).collect()
    }
    assert got == _budget_model(rows, budgets)


# --------------------------------------------------------------------------
# _bucket_pairs (r10): grouped pair generation == the capped self-join,
# for random bucket assignments, caps, and payload carry
# --------------------------------------------------------------------------

BUCKET_ROW = st.tuples(
    st.integers(min_value=0, max_value=60),               # id
    st.one_of(st.none(), st.integers(min_value=0, max_value=4)),  # bucket key
)


def _pairs_model(rows, cap):
    """Python model: per bucket sort ALL rows by id — a duplicate
    (id, bucket) row is its own row_number row, so duplicates count
    toward the cap — keep the first ``cap`` rows, then every strict
    a < b pair over the kept ids (no self-pairs: the capped grouped
    path filters id_a < id_b, the cap=None branch joins on '<')."""
    from collections import defaultdict

    members = defaultdict(list)
    for i, b in rows:
        if b is not None:
            members[b].append(i)
    out = set()
    for b, ids in members.items():
        kept = sorted(ids)[: cap if cap is not None else None]
        out |= {(a, c) for ai, a in enumerate(kept) for c in kept[ai + 1:] if a < c}
    return out


@settings(max_examples=8, deadline=None)
@given(
    rows=st.lists(BUCKET_ROW, min_size=1, max_size=40),
    cap=st.sampled_from([None, 1, 2, 3, 1000]),
)
def test_bucket_pairs_match_python_model(spark, rows, cap):
    from pyspark.sql import functions as F

    from big_data_engineering_financial_analysis_spark.operators.dedup import _bucket_pairs

    df = spark.createDataFrame(
        [(i, b, float(i) * 2) for i, b in rows], "doc_id long, b long, p double"
    )
    got = _bucket_pairs(df, ["b"], "doc_id", cap, payload_col="p").collect()
    want = _pairs_model(rows, cap)
    assert {(r.id_a, r.id_b) for r in got} == want
    # payload rides correctly on every pair row
    assert all(r.p_a == r.id_a * 2.0 and r.p_b == r.id_b * 2.0 for r in got)
    # ids-only form agrees
    got_ids = _bucket_pairs(df, ["b"], "doc_id", cap).collect()
    assert {(r.id_a, r.id_b) for r in got_ids} == want
