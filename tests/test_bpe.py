"""BPE apply: merge-table semantics + engine parity on crafted words."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from big_data_engineering_financial_analysis_spark.operators.bpe import (
    BPE_MERGES,
    bpe_pieces,
    duck_bpe_pieces,
)


def _pieces(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(bpe_pieces(F.col("text")).alias("p")).collect()[0]["p"]


def test_vocab_words_merge_fully(spark):
    """Words the merge table was built for collapse to single pieces."""
    got = _pieces(spark, "the table line data spark batch join key")
    assert got == ["the", "table", "line", "data", "spark", "batch", "join", "key"]


def test_unknown_word_falls_back_to_subwords(spark):
    """A word outside the vocabulary splits into the best available
    subword pieces, never disappears."""
    got = _pieces(spark, "orchestrate")
    assert "".join(got) == "orchestrate"
    assert len(got) > 1
    assert got[0] == "or"  # learned merge applies at the prefix


def test_lowercase_pretokenizer(spark):
    assert _pieces(spark, "THE Table") == _pieces(spark, "the table")


def test_merge_rank_order_respected(spark):
    """(t,h) outranks later merges: 'th' inside any word merges first."""
    got = _pieces(spark, "thx")
    assert got[0] == "th"


def test_empty_ish_input(spark):
    assert _pieces(spark, "a") == ["a"]


def test_engine_parity_on_adversarial_strings(spark):
    """Overlapping repeats and mixed whitespace reproduce exactly in the
    oracle formulation (two-pass replace semantics are engine-identical)."""
    texts = ["lllll thththth", "  a   the  ", "aaaa abab ablee", "batchbatch"]
    con = duckdb.connect()
    for t in texts:
        (o,) = con.execute(f"SELECT {duck_bpe_pieces('?')}", [t]).fetchone()
        assert _pieces(spark, t) == o, t


def test_merge_table_is_well_formed():
    """Every merge's parts are producible: single chars or the result of
    an earlier merge (the invariant a learned BPE table satisfies)."""
    produced = set()
    for x, y in BPE_MERGES:
        for part in (x, y):
            assert len(part) == 1 or part in produced, (x, y)
        produced.add(x + y)


# --- vocabulary LEARNING (Sennrich et al. 2016) --------------------------


def _ref_learn(texts, n_merges):
    """Independent pure-Python twin of learn_merges: dict pair counting,
    (count DESC, pair ASC) argmax, two-pass left-to-right str.replace —
    Python's str.replace shares the exact non-overlapping semantics of
    Spark's and DuckDB's replace."""
    from collections import Counter

    freq = Counter(
        w for t in texts for w in t.lower().split() if w
    )
    spaced = {f" {' '.join(w)} ": n for w, n in freq.items()}
    merges, counts = [], []
    for _ in range(n_merges):
        pc = Counter()
        for s, n in spaced.items():
            sy = s.split()
            for i in range(len(sy) - 1):
                pc[f"{sy[i]} {sy[i+1]}"] += n
        if not pc:
            break
        pair = min(pc, key=lambda p: (-pc[p], p))
        merges.append(tuple(pair.split(" ")))
        counts.append(pc[pair])
        pat, rep = f" {pair} ", f" {pair.replace(' ', '')} "
        nxt = Counter()
        for s, n in spaced.items():
            nxt[s.replace(pat, rep).replace(pat, rep)] += n
        spaced = dict(nxt)
    return merges, counts


def test_learn_merges_matches_reference(spark):
    from big_data_engineering_financial_analysis_spark.operators.bpe import learn_merges

    texts = [
        "low low low low low",
        "lower lower newest newest",
        "newest newest newest newest widest widest widest",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got_m, got_c = learn_merges(df, n_merges=6)
    exp_m, exp_c = _ref_learn(texts, 6)
    assert got_m == exp_m
    assert got_c == exp_c


def test_learn_merges_bounded_cache_window(spark, monkeypatch):
    """learn_merges must hold at most 2 iteration frames persisted at any
    moment (sliding window) — at a production 32k-merge vocabulary the
    round-5 pin-until-the-end layout would accumulate 32k cached frames.
    Tracked by instrumenting persist/unpersist balance mid-run."""
    from pyspark.sql import DataFrame

    from big_data_engineering_financial_analysis_spark.operators.bpe import learn_merges

    live, peak = set(), [0]
    real_persist, real_unpersist = DataFrame.persist, DataFrame.unpersist

    def persist(self, *a, **kw):
        live.add(id(self))
        peak[0] = max(peak[0], len(live))
        return real_persist(self, *a, **kw)

    def unpersist(self, *a, **kw):
        live.discard(id(self))
        return real_unpersist(self, *a, **kw)

    monkeypatch.setattr(DataFrame, "persist", persist)
    monkeypatch.setattr(DataFrame, "unpersist", unpersist)

    texts = [
        "low low low low low",
        "lower lower newest newest",
        "newest newest newest newest widest widest widest",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got_m, got_c = learn_merges(df, n_merges=6)
    exp_m, exp_c = _ref_learn(texts, 6)
    assert (got_m, got_c) == (exp_m, exp_c)  # window does not change results
    assert peak[0] <= 2, f"{peak[0]} frames persisted concurrently"
    assert not live, "all frames unpersisted on return"


def test_learned_table_round_trips_through_apply(spark):
    """learn -> apply: tokenizing with the learned table reproduces the
    reference tokenization (the verdict's end-to-end tokenizer story)."""
    from big_data_engineering_financial_analysis_spark.operators.bpe import (
        bpe_pieces,
        learn_merges,
    )

    texts = ["banana bandana banana", "banana bandana", "ban ban banana"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    merges, _ = learn_merges(df, n_merges=5)
    exp_m, _ = _ref_learn(texts, 5)
    assert merges == exp_m
    # apply the learned merges with the reference's two-pass replace
    word = "bandanas"
    s = f" {' '.join(word)} "
    for x, y in merges:
        pat, rep = f" {x} {y} ", f" {x}{y} "
        s = s.replace(pat, rep).replace(pat, rep)
    expected_pieces = s.split()
    got = (
        spark.createDataFrame([(word,)], "text string")
        .select(bpe_pieces(F.col("text"), merges=merges).alias("p"))
        .first()["p"]
    )
    assert got == expected_pieces


def test_duck_bpe_learn_matches_spark(spark, tmp_path):
    """Engine parity of the unrolled SQL twin on a crafted corpus (the
    registry query proves it on the shared tables; this pins it on an
    adversarial fixture with overlapping repeats)."""
    import os

    import duckdb

    from big_data_engineering_financial_analysis_spark.operators.bpe import (
        duck_bpe_learn,
        learn_merges,
    )

    texts = ["aaaa aaa aa a", "abab ababab", "lllll llll lll"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    sf = str(tmp_path / "docs")
    df.write.parquet(os.path.join(sf, "documents.parquet"))
    got_m, got_c = learn_merges(
        spark.read.parquet(os.path.join(sf, "documents.parquet")), n_merges=5
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet/*.parquet'"
    )
    exp = con.execute(duck_bpe_learn(5)).fetchall()
    exp = sorted(exp)  # by merge_rank
    assert [(x, y) for _, x, y, _ in exp] == got_m
    assert [c for _, _, _, c in exp] == got_c


def test_learn_driver_fast_path_matches_distributed(spark):
    """r12 optimization: the vocab-sized driver merge loop must learn the
    identical (merges, counts) as the distributed aggregation loop, and
    an over-limit vocab must fall through to the distributed path."""
    from big_data_engineering_financial_analysis_spark.operators.bpe import learn_merges
    from big_data_engineering_financial_analysis_spark.sources.parquet import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    fast = learn_merges(docs, n_merges=6)
    slow = learn_merges(docs, n_merges=6, driver_vocab_limit=None)
    assert fast == slow
    overflow = learn_merges(docs, n_merges=6, driver_vocab_limit=1)
    assert overflow == slow


def test_frame_path_matches_replace_chain(spark):
    """r13 escape hatch: the Arrow-batched memoized worker path of
    bpe_pieces_frame must equal the codegen replace chain CELL-FOR-CELL
    on the real corpus plus adversarial strings (overlapping repeats,
    mixed whitespace, tabs, NULL, empty) — same merge table, worker
    path forced via chain_max=0 (the chain reference is only buildable
    at small merge counts; at 264+ the column-node conversion
    StackOverflows, which is the hatch's reason to exist)."""
    from big_data_engineering_financial_analysis_spark.operators.bpe import (
        REPLACE_CHAIN_MAX_MERGES,
        bpe_pieces_frame,
    )

    merges = list(BPE_MERGES) + [("x", "q"), ("xq", "z"), ("l", "l"), ("ll", "ll")]

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet").select(
        "doc_id", "text"
    )
    extra = spark.createDataFrame(
        [
            (9001, "lllll thththth xqz xxqqzz"),
            (9002, "  a \t the joined  "),
            (9003, ""),
            (9004, None),
            (9005, "BATCHbatch Spark TABLE"),
        ],
        "doc_id long, text string",
    )
    df = docs.unionByName(extra)

    fast = bpe_pieces_frame(df, merges=merges, chain_max=0)  # force worker path
    assert "MapInPandas" in fast._jdf.queryExecution().optimizedPlan().toString()
    chain = df.withColumn("pieces", bpe_pieces(F.col("text"), merges))

    f = {r["doc_id"]: r["pieces"] for r in fast.collect()}
    c = {r["doc_id"]: r["pieces"] for r in chain.collect()}
    assert f == c

    # default routing: the demo table keeps the chain, an oversized
    # learned table takes the worker path and still tokenizes sanely
    small = bpe_pieces_frame(df, merges=BPE_MERGES)
    assert "MapInPandas" not in small._jdf.queryExecution().optimizedPlan().toString()
    big = merges + [
        (f"{a}{b}{c}", "qq")
        for a in "bcdfghjkmnpvw"
        for b in "bcdfghjkmnpvw"
        for c in "bcdf"
    ][: REPLACE_CHAIN_MAX_MERGES]
    assert len(big) > REPLACE_CHAIN_MAX_MERGES
    routed = bpe_pieces_frame(extra, merges=big)
    assert "MapInPandas" in routed._jdf.queryExecution().optimizedPlan().toString()
    got = {r["doc_id"]: r["pieces"] for r in routed.collect()}
    assert got[9003] == [""] and got[9004] is None
    # the padding merges never fire on these strings, so the oversized
    # table tokenizes exactly like the 34-merge one
    assert got == {r["doc_id"]: r["pieces"]
                   for r in bpe_pieces_frame(extra, merges=merges, chain_max=0).collect()}
