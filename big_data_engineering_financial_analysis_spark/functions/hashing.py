"""Deterministic, engine-portable hashing / tokenization primitives.

Everything downstream of dedup and similarity search (minhash, simhash,
LSH buckets, fingerprints) must produce *identical* values in Spark and in
the DuckDB oracle, so hashes are built only from md5 — available and
bit-identical in both engines — never from engine-native hash functions
(Spark's xxhash64 and DuckDB's hash() disagree).

``hash64`` takes the first 15 hex chars of md5 (60 bits, always positive,
fits BIGINT in both engines).  The matching DuckDB expression is
``('0x' || substr(md5(s), 1, 15))::BIGINT``.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

#: regex used to whitespace-tokenize documents (both engines).
TOKEN_SPLIT_RE = r"\s+"


def hash64(col: Column, seed: Column | str | int | None = None) -> Column:
    """60-bit positive hash of a string column (md5-derived).

    ``seed`` (appended as ``#<seed>``) yields independent hash families for
    minhash permutations / simhash bit positions.
    """
    s = col
    if seed is not None:
        seed_col = seed if isinstance(seed, Column) else F.lit(str(seed))
        s = F.concat(col, F.lit("#"), seed_col.cast("string"))
    return F.conv(F.substring(F.md5(s.cast("binary")), 1, 15), 16, 10).cast("long")


def hash64_py(s: str, seed=None) -> int:
    """Python twin of :func:`hash64` (for constants baked into oracle SQL)."""
    if seed is not None:
        s = f"{s}#{seed}"
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def duck_hash64(expr: str, seed=None) -> str:
    """DuckDB SQL twin of :func:`hash64` over an SQL expression string."""
    if seed is not None:
        expr = f"({expr} || '#{seed}')"
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


def tokens(text: Column) -> Column:
    """Whitespace tokens of trimmed text.

    DuckDB twin: ``string_split_regex(trim(text), '\\s+')``.
    """
    return F.split(F.trim(text), TOKEN_SPLIT_RE)


def shingles(toks: Column, n: int) -> Column:
    """Word n-gram shingles (space-joined), empty array when < n tokens.

    The short-input guard matters: Spark ``sequence(1, k)`` with ``k < 1``
    generates a *descending* sequence instead of an empty one.
    DuckDB twin:
    ``list_transform(generate_series(1, len(t)-n+1), i -> array_to_string(t[i:i+n-1], ' '))``.
    """
    count = F.size(toks) - F.lit(n - 1)
    return F.when(
        count >= 1,
        F.transform(
            F.sequence(F.lit(1), count),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def hyperplanes(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic random-hyperplane constants for sign-LSH.

    md5-derived so they regenerate identically anywhere (the oracle SQL
    embeds them as literals); components uniform in [-1, 1] at 1e-3
    resolution — plenty for bucketing.
    """
    return [
        [(hash64_py(f"rp#{j}#{c}") % 2001 - 1000) / 1000.0 for c in range(dim)]
        for j in range(n_planes)
    ]
