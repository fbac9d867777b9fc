"""BPE tokenizer APPLY at corpus scale (Sennrich et al. 2016).

A training pipeline needs vocabulary *application* — splitting every word
into learned subword merges — not just token counting.  Learning the merge
table is an offline, model-sized job; applying it is the 100 TB-scale
operation, and that is what this module does with a broadcast merge table
and pure JVM string expressions (no Python in the hot path).

Formulation: the classic space-separated-symbol rewrite.  Each lowercase
word becomes the spaced symbol string `` h e l l o `` (one leading/
trailing sentinel space); merge ``(x, y)`` with rank r rewrites
`` x y `` -> `` xy `` via literal ``replace``; merges apply in rank
order.  Each merge's replace runs TWICE: a single left-to-right
``replace`` pass cannot rewrite overlapping repeats (`` l l l l ``
needs a second scan after the first pass consumes alternating pairs), and
two passes make the common cases converge.  This "two-pass greedy" is a
documented approximation of to-fixpoint BPE — chosen because Spark's
``replace`` and DuckDB's ``replace`` share exact left-to-right
non-overlapping semantics, so the engine and the SQL oracle execute the
IDENTICAL algorithm and agree cell-for-cell, which a fixpoint loop could
not guarantee without recursive SQL.

Scale: the merge table is a plan literal (broadcast by construction);
tokenization is row-local `transform` + ``replace`` chains inside
whole-stage codegen — embarrassingly parallel, zero shuffle.  Swapping in
a real learned table (e.g. GPT-2's 50k merges) keeps the plan shape; at
that vocabulary size the replace chain should move to an Arrow-batched
``mapInPandas`` with a trie, which is the documented escape hatch.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from big_data_engineering_financial_analysis_spark.functions.hashing import tokens

#: Deterministic demonstration merge table (rank order), sized so the
#: synthetic corpus vocabulary ("table", "line", "data", "spark", ...)
#: compresses visibly.  In production this is the learned artifact.
BPE_MERGES: list[tuple[str, str]] = [
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("o", "r"),
    ("e", "r"), ("a", "t"), ("a", "r"), ("s", "t"), ("l", "e"),
    ("r", "o"), ("ro", "w"), ("o", "w"), ("c", "h"), ("s", "p"),
    ("a", "b"), ("ab", "le"), ("t", "able"), ("l", "in"), ("lin", "e"),
    ("d", "at"), ("dat", "a"), ("sp", "ar"), ("spar", "k"),
    ("j", "o"), ("jo", "in"), ("k", "e"), ("ke", "y"),
    ("b", "at"), ("bat", "ch"),
]


def bpe_pieces(text: Column) -> Column:
    """Array of BPE pieces for a text column (lowercase whitespace
    pre-tokenizer, then per-word merge application — see module doc)."""

    def word_pieces(w: Column) -> Column:
        s = F.concat(
            F.lit(" "),
            F.trim(F.regexp_replace(w, "(.)", "$1 ")),
            F.lit(" "),
        )
        for x, y in BPE_MERGES:
            pat, rep = F.lit(f" {x} {y} "), F.lit(f" {x}{y} ")
            s = F.replace(F.replace(s, pat, rep), pat, rep)
        return F.split(F.trim(s), " ")

    return F.flatten(F.transform(tokens(F.lower(text)), word_pieces))


def duck_bpe_pieces(expr: str) -> str:
    """DuckDB SQL twin of :func:`bpe_pieces` over a text expression —
    generated from the SAME merge table so the two can never drift."""
    s = "' ' || trim(regexp_replace(w, '(.)', '\\1 ', 'g')) || ' '"
    for x, y in BPE_MERGES:
        pat, rep = f" {x} {y} ", f" {x}{y} "
        s = f"replace({s}, '{pat}', '{rep}')"
        s = f"replace({s}, '{pat}', '{rep}')"
    return (
        "flatten(list_transform("
        f"string_split_regex(trim(lower({expr})), '\\s+'), "
        f"w -> string_split(trim({s}), ' ')))"
    )
