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


def hash64(col: Column, seed: Column | str | int | None = None, nhex: int = 15) -> Column:
    """Positive hash of a string column (md5-derived), ``nhex`` hex digits
    (15 -> 60 bits; 14 -> 56 bits, leaving headroom for ``h1 + i*h2``
    permutation mixing without BIGINT overflow in either engine).

    ``seed`` (appended as ``#<seed>``) yields independent hash families.
    """
    s = col
    if seed is not None:
        seed_col = seed if isinstance(seed, Column) else F.lit(str(seed))
        s = F.concat(col, F.lit("#"), seed_col.cast("string"))
    return F.conv(F.substring(F.md5(s.cast("binary")), 1, nhex), 16, 10).cast("long")


def hash64_py(s: str, seed=None) -> int:
    """Python twin of :func:`hash64` (for constants baked into oracle SQL)."""
    if seed is not None:
        s = f"{s}#{seed}"
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def duck_hash64(expr: str, seed=None, nhex: int = 15) -> str:
    """DuckDB SQL twin of :func:`hash64` over an SQL expression string."""
    if seed is not None:
        expr = f"({expr} || '#{seed}')"
    return f"('0x' || substr(md5({expr}), 1, {nhex}))::BIGINT"


#: Mersenne prime for the minhash universal-hash family.
MINHASH_PRIME = (1 << 61) - 1


def minhash_params(num_perm: int) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) for the permutation family
    ``g_i(h) = (a_i * h + b_i) mod MINHASH_PRIME``.

    Sizes are chosen so every intermediate fits signed 64-bit in BOTH
    engines (DuckDB errors on overflow): h is 32-bit, a_i < 2^30
    (product < 2^62), b_i < 2^61 (sum < 2^63).
    """
    return [
        (
            hash64_py(f"mh-a-{i}") % ((1 << 30) - 1) + 1,
            hash64_py(f"mh-b-{i}") % MINHASH_PRIME,
        )
        for i in range(num_perm)
    ]


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


def sql_double_literal(x: float | None) -> str:
    """Exact SQL text for one double.  ``CAST('<repr>' AS DOUBLE)``
    parses with ``Double.parseDouble`` — a correctly-rounded decimal →
    binary conversion — and Python ``repr`` emits the shortest
    round-trip decimal, so the reconstructed IEEE bits are identical to
    the source float for every finite, infinite and NaN value."""
    if x is None:
        return "CAST(NULL AS DOUBLE)"
    if x != x:
        return "CAST('NaN' AS DOUBLE)"
    if x == float("inf") or x == float("-inf"):
        return f"CAST('{'-' if x < 0 else ''}Infinity' AS DOUBLE)"
    return f"CAST('{x!r}' AS DOUBLE)"


def double_array_literal(nested) -> Column:
    """(Nested) array-of-doubles literal via ONE parsed SQL expression.

    The centroid / hyperplane / codebook literal tables these constants
    feed are built thousands of scalars at a time; composing them as
    ``F.array(*[F.lit(x) ...])`` costs one py4j round-trip per scalar —
    measured 0.7-1.1 s per ANN query CONSTRUCTION at 16x64 doubles (r13
    optimization round), pure driver-side Python↔JVM chatter.  A single
    ``F.expr`` ships one SQL string and parses server-side in ~ms; after
    constant folding the optimized plan holds the identical
    array literal (:func:`sql_double_literal` is bit-exact), so
    downstream plans and values are unchanged."""
    def fmt(v) -> str:
        if isinstance(v, (list, tuple)):
            return "array(" + ",".join(fmt(x) for x in v) + ")"
        return sql_double_literal(v)

    return F.expr(fmt(nested))


def ivf_centroids(n_cells: int, dim: int) -> list[list[float]]:
    """Deterministic IVF coarse-quantizer centroids (md5-derived),
    scaled to the UNIT SHELL: uniform [-1,1] coordinates have
    E||c||^2 = dim/3 (norm ~4.6 at dim 64), and in
    argmin ||x-c||^2 = argmin(||c||^2 - 2 x.c) that centroid-norm
    spread drowns the query-dependent term for ~unit-norm data — 82% of
    the sf0.1 embeddings landed in ONE of 16 cells (r9 measurement).
    Multiplying by sqrt(3/dim) puts E||c||^2 = 1, the shell cosine-ANN
    data lives on: all 16 cells populated, max cell 1646 -> 348 rows —
    the same data-shell rescale pq_codebooks already applies per
    subspace.

    Fixed pseudo-random centroids instead of trained k-means: assignment is
    reproducible anywhere (the oracle embeds them as literals) and at scale
    a periodic k-means refit (``ivf_refit_centroids``) would simply
    replace this constant table.
    """
    scale = (3.0 / dim) ** 0.5
    return [
        [(hash64_py(f"ivf-{k}-{c}") % 2001 - 1000) / 1000.0 * scale for c in range(dim)]
        for k in range(n_cells)
    ]


def pq_codebooks(m: int, k: int, dsub: int) -> list[list[list[float]]]:
    """Deterministic product-quantization codebooks: ``m`` subspaces, each
    with ``k`` centroids of ``dsub`` dims (md5-derived).

    Fixed pseudo-random codebooks instead of per-subspace k-means for the
    same reason as :func:`ivf_centroids`: encoding is reproducible anywhere
    (the DuckDB oracle embeds the identical literals), and at scale a
    trained codebook would simply replace this constant table — the
    encode / ADC plans are codebook-agnostic.

    Components are uniform in ``[-s, s]`` with ``s = sqrt(3/(m*dsub))``,
    which puts E[centroid norm] at ~``1/sqrt(m)`` — the norm of a subvector
    of an evenly-spread UNIT vector (PQ here always encodes L2-normalized
    vectors, :func:`operators.pq._normalized`).  Unscaled [-1, 1] centroids
    sit ~4x outside the data shell, where argmin degenerates to "whichever
    centroid is least far" and recall collapses (measured 0.08 -> 0.18
    recall@10 at m=8 from this change alone).
    """
    s = (3.0 / (m * dsub)) ** 0.5
    return [
        [
            [(hash64_py(f"pq-{j}-{c}-{d}") % 2001 - 1000) / 1000.0 * s for d in range(dsub)]
            for c in range(k)
        ]
        for j in range(m)
    ]


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
