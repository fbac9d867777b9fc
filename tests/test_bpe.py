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
