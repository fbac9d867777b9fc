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

from pyspark.sql import Column, DataFrame
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


def bpe_pieces(text: Column, merges: list[tuple[str, str]] | None = None) -> Column:
    """Array of BPE pieces for a text column (lowercase whitespace
    pre-tokenizer, then per-word merge application — see module doc).
    ``merges`` defaults to :data:`BPE_MERGES`; pass the output of
    :func:`learn_merges` to apply a corpus-learned vocabulary."""
    if merges is None:
        merges = BPE_MERGES

    def word_pieces(w: Column) -> Column:
        s = F.concat(
            F.lit(" "),
            F.trim(F.regexp_replace(w, "(.)", "$1 ")),
            F.lit(" "),
        )
        for x, y in merges:
            pat, rep = F.lit(f" {x} {y} "), F.lit(f" {x}{y} ")
            s = F.replace(F.replace(s, pat, rep), pat, rep)
        return F.split(F.trim(s), " ")

    return F.flatten(F.transform(tokens(F.lower(text)), word_pieces))


#: bpe_pieces_frame switches from the codegen replace chain to the
#: Arrow-batched worker path above this many merges.  The chain is the
#: right plan for demonstration-sized tables (row-local, zero Python,
#: oracle-twinned SQL); at production vocabularies it is not even
#: constructible — 2 nested replace expressions per merge overflow the
#: JVM stack in column-node conversion at ~192 merges (measured on
#: Spark 4.1.2), well before a GPT-2-sized 50k table.  128 keeps a 33%
#: stack margin; measured at the bound (sf0.1 documents, warm): chain
#: 4.1 s vs worker 0.5-0.9 s, and the worker path is FLAT in the merge
#: count (0.5-0.6 s at 1024 and 2227 merges — per-distinct-word
#: memoization + first-char screening make cost Zipf-bounded).
REPLACE_CHAIN_MAX_MERGES = 128


def _word_pieces_py(w: str, merges: list[tuple[str, str]]) -> list[str]:
    """Python twin of :func:`bpe_pieces`' per-word merge application —
    the IDENTICAL two-pass-greedy algorithm on the identical spaced
    symbol string (``str.replace`` shares Spark/DuckDB ``replace``'s
    left-to-right non-overlapping semantics), so outputs are
    cell-for-cell equal (pinned by
    tests/test_bpe.py::test_frame_path_matches_replace_chain).  A
    first-character screen skips merges whose symbols cannot occur in
    the word — rank order is untouched, a skipped replace was a no-op."""
    s = f" {' '.join(w)} "
    chars = set(w)
    for x, y in merges:
        if x[0] not in chars or y[0] not in chars:
            continue
        pat = f" {x} {y} "
        if pat not in s:
            continue
        rep = f" {x}{y} "
        s = s.replace(pat, rep)
        s = s.replace(pat, rep)
    return s.strip().split(" ")


def bpe_pieces_frame(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "pieces",
    merges: list[tuple[str, str]] | None = None,
    chain_max: int = REPLACE_CHAIN_MAX_MERGES,
) -> DataFrame:
    """DataFrame-level BPE apply with automatic path selection — the
    production escape hatch the module doc promises (r13).

    At or under :data:`REPLACE_CHAIN_MAX_MERGES` merges this is exactly
    ``withColumn(out_col, bpe_pieces(...))`` — the row-local codegen
    replace chain, zero Python, the shape every registered query keeps.
    Above the bound (a real learned vocabulary: 32k-50k merges) the
    chain's expression tree is unbuildable, so the apply moves to ONE
    Arrow-batched ``mapInPandas`` stage: still row-local and
    shuffle-free, per-word work is memoized per task (corpus word
    frequency follows Zipf — a batch of documents repeats a small
    distinct-word set), and each distinct word pays only the merges its
    characters admit instead of the full table.  Outputs are
    cell-for-cell identical on both routes (the Python kernel is the
    same two-pass-greedy algorithm; parity is pytest-pinned), with the
    standard caveat that exotic Unicode case-mapping edge cases follow
    Python's ``str.lower`` on the worker path vs UTF8String.toLowerCase
    on the chain path — identical on ASCII and on every fixture.
    ``chain_max`` overrides the route bound (parity tests force the
    worker path at chain-buildable sizes — at 264+ merges the chain
    reference is not even constructible: the column-node conversion
    StackOverflows).
    """
    if merges is None:
        merges = BPE_MERGES
    if len(merges) <= chain_max:
        return df.withColumn(out_col, bpe_pieces(F.col(text_col), merges))

    import re

    out_fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    )
    out_schema = f"{out_fields}, `{out_col}` array<string>"
    # Java-regex-exact whitespace class: Spark's \s+ is ASCII-only
    # ([ \t\n\x0B\f\r], no UNICODE_CHARACTER_CLASS), while Python's \s
    # is Unicode; and F.trim strips SPACE characters only, hence
    # .strip(" ") rather than .strip().
    ws = re.compile(r"[ \t\n\x0b\f\r]+")
    merge_list = list(merges)

    def apply_batches(batches):
        memo: dict[str, list[str]] = {}

        def doc_pieces(text):
            if text is None:
                return None
            toks = ws.split(text.lower().strip(" "))
            out: list[str] = []
            for w in toks:
                got = memo.get(w)
                if got is None:
                    got = memo[w] = _word_pieces_py(w, merge_list)
                out.extend(got)
            return out

        for pdf in batches:
            pdf[out_col] = pdf[text_col].map(doc_pieces)
            yield pdf

    return df.mapInPandas(apply_batches, out_schema)


def duck_bpe_pieces(expr: str, merges: list[tuple[str, str]] | None = None) -> str:
    """DuckDB SQL twin of :func:`bpe_pieces` over a text expression —
    generated from the SAME merge table so the two can never drift."""
    if merges is None:
        merges = BPE_MERGES
    s = "' ' || trim(regexp_replace(w, '(.)', '\\1 ', 'g')) || ' '"
    for x, y in merges:
        # single quotes in learned symbols (a corpus containing "don't"
        # yields symbols like "'t") must double for the SQL literal, or
        # the generated oracle is a syntax error exactly where the
        # docstring promises it cannot drift
        qx, qy = x.replace("'", "''"), y.replace("'", "''")
        pat, rep = f" {qx} {qy} ", f" {qx}{qy} "
        s = f"replace({s}, '{pat}', '{rep}')"
        s = f"replace({s}, '{pat}', '{rep}')"
    return (
        "flatten(list_transform("
        f"string_split_regex(trim(lower({expr})), '\\s+'), "
        f"w -> string_split(trim({s}), ' ')))"
    )


# ---------------------------------------------------------------------------
# vocabulary LEARNING (Sennrich et al. 2016, the other half of the story)
# ---------------------------------------------------------------------------


#: learn_merges switches to its driver-side execution regime when the
#: word vocabulary (distinct words after the corpus-scale count — NOT the
#: corpus) fits under this many rows.  Same contract as the
#: connected-components TINY_GRAPH_EDGES fast path: below the bound the
#: model-sized frame iterates on the driver (one Spark job total instead
#: of one aggregation job per merge); above it the distributed loop runs
#: unchanged.  65k distinct words ≈ a few MB of strings.
TINY_VOCAB_ROWS = 65_536


def _driver_learn_merges(
    rows: list, n_merges: int
) -> tuple[list[tuple[str, str]], list[int]]:
    """Driver-side twin of the distributed merge loop — the IDENTICAL
    algorithm step by step (two-pass left-to-right ``str.replace`` has
    the same non-overlapping semantics as Spark's ``replace``; the
    argmax tie-break (count DESC, pair ASC) compares Python str by code
    point, which equals Spark's UTF8 binary order), so a table learned
    here is bit-equal to the distributed path's — pinned by
    tests/test_bpe.py."""
    vocab = [(s, int(f)) for s, f in rows]
    merges: list[tuple[str, str]] = []
    counts: list[int] = []
    for _ in range(n_merges):
        cnt: dict[str, int] = {}
        for s, f in vocab:
            syms = s.strip(" ").split(" ")
            for i in range(len(syms) - 1):
                pair = syms[i] + " " + syms[i + 1]
                cnt[pair] = cnt.get(pair, 0) + f
        if not cnt:
            break
        pair = min(cnt, key=lambda p: (-cnt[p], p))
        x, y = pair.split(" ")
        merges.append((x, y))
        counts.append(cnt[pair])
        pat, rep = f" {x} {y} ", f" {x}{y} "
        vocab = [(s.replace(pat, rep).replace(pat, rep), f) for s, f in vocab]
    return merges, counts


def learn_merges(
    df,
    text_col: str = "text",
    n_merges: int = 8,
    driver_vocab_limit: int | None = TINY_VOCAB_ROWS,
):
    """Learn a BPE merge table from a corpus — classic Sennrich et al.
    2016: start from characters, repeatedly merge the most frequent
    adjacent symbol pair.

    Distribution story: the only corpus-scale job is the initial word
    count (one explode + one shuffle).  Everything after runs on the
    VOCABULARY — a model-sized frame (distinct words x frequencies) that
    stays distributed but is orders of magnitude smaller than the corpus,
    exactly how production BPE trainers work.  Each iteration is one
    pair-count aggregation over the vocab plus a 1-row ``limit(1)``
    collect (the argmax — model-sized by design, like the k-means partial
    collect in ``similarity.ivf_refit_centroids``).

    Determinism: argmax tie-break is (count DESC, pair ASC) — a pure
    function of the data.  The merge rewrite is the SAME two-pass
    left-to-right ``replace`` the apply path uses (module doc), so a
    table learned here and applied with :func:`bpe_pieces` round-trips
    exactly, and the unrolled SQL oracle (:func:`duck_bpe_learn`)
    executes the identical algorithm stage by stage.

    Returns ``(merges, counts)``: the ordered ``[(left, right), ...]``
    list (feed to :func:`bpe_pieces`) and the pair frequency at each
    selection.
    """
    from big_data_engineering_financial_analysis_spark.operators.partitioning import spread

    wc = (
        spread(df)
        .select(F.explode(tokens(F.lower(F.col(text_col)))).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    spaced = wc.select(
        F.concat(
            F.lit(" "),
            F.trim(F.regexp_replace(F.col("word"), "(.)", "$1 ")),
            F.lit(" "),
        ).alias("s"),
        "freq",
    )
    # Driver fast path (r12 optimization round): the corpus-scale work is
    # the word count above; everything after iterates on the vocab.  When
    # the vocab fits under the bound, the limit-collect below is the ONLY
    # job — vs one pair-count aggregation job per merge (8 for the
    # registry query, 32k for a production tokenizer).  The +1 row
    # overflow probe makes oversized vocabs fall through to the
    # distributed loop, whose per-iteration work is unchanged.
    if driver_vocab_limit is not None:
        head = spaced.limit(driver_vocab_limit + 1).collect()
        if len(head) <= driver_vocab_limit:
            return _driver_learn_merges([(r["s"], r["freq"]) for r in head], n_merges)
    spaced = spaced.persist()
    # Cache policy: SLIDING WINDOW of the last 2 iteration frames.  Each
    # frame is vocab-sized (distinct words), so the per-frame cost is
    # small — but the merge COUNT scales with the target vocabulary
    # (32k merges for a production tokenizer), and pinning every
    # iteration's frame until the end (the round-5 layout) would hold
    # 32k cached frames at once.  The iteration-i argmax collect()
    # materializes frame i's cache; frame i+1 derives only from frame i,
    # so once frame i is materialized every frame <= i-1 has no future
    # reference and is unpersisted immediately.  Keeping TWO frames (the
    # materialized current one plus its parent) means an executor-side
    # cache eviction of the current frame recomputes one replace() step
    # from its cached parent instead of climbing the whole lineage back
    # to the corpus scan.  No force-materialize cycle is added: the
    # argmax collect each iteration already does it (skipping a separate
    # count() per iteration is what took 14.1 s -> ~7 s at sf0.1).
    cached = [spaced]
    merges: list[tuple[str, str]] = []
    counts: list[int] = []
    try:
        for _ in range(n_merges):
            syms = F.split(F.trim(F.col("s")), " ")
            # guard: Spark sequence(1, 0) is DESCENDING, not empty
            prs = F.when(
                F.size(syms) >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size(syms) - 1),
                    lambda i: F.concat(
                        F.element_at(syms, i), F.lit(" "), F.element_at(syms, i + 1)
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
            top = (
                spaced.select(F.explode(prs).alias("pair"), "freq")
                .groupBy("pair")
                .agg(F.sum("freq").alias("cnt"))
                .orderBy(F.desc("cnt"), F.asc("pair"))
                .limit(1)
                .collect()
            )
            if not top:
                break
            pair, cnt = top[0]["pair"], int(top[0]["cnt"])
            x, y = pair.split(" ")
            merges.append((x, y))
            counts.append(cnt)
            pat, rep = F.lit(f" {x} {y} "), F.lit(f" {x}{y} ")
            spaced = spaced.select(
                F.replace(F.replace(F.col("s"), pat, rep), pat, rep).alias("s"),
                "freq",
            ).persist()
            cached.append(spaced)
            # slide the window: the argmax collect above materialized the
            # new frame's PARENT, and the new frame derives only from it,
            # so every frame two or more generations back has no future
            # lineage reference — unpersist immediately (>= 2 frames would
            # otherwise accumulate to the merge count, 32k for a real
            # tokenizer vocabulary)
            while len(cached) > 2:
                cached.pop(0).unpersist()
    finally:
        for c in cached:
            c.unpersist()
    return merges, counts


def duck_bpe_learn(n_merges: int = 8, table: str = "documents") -> str:
    """Unrolled DuckDB SQL twin of :func:`learn_merges`: one CTE stage per
    merge (pair-count -> argmax -> two-pass replace), generated by the
    same loop so the algorithms cannot drift.  Output: (merge_rank,
    left_sym, right_sym, cnt), one row per learned merge."""
    sql = f"""
        WITH wc AS MATERIALIZED (
          SELECT word, count(*) AS freq FROM (
            SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS word
            FROM {table})
          WHERE word != '' GROUP BY word
        ),
        w0 AS MATERIALIZED (
          SELECT ' ' || trim(regexp_replace(word, '(.)', '\\1 ', 'g')) || ' ' AS s,
                 freq
          FROM wc
        )"""
    for r in range(n_merges):
        sql += f""",
        p{r} AS MATERIALIZED (
          SELECT pair, CAST(sum(freq) AS BIGINT) AS cnt FROM (
            SELECT unnest(CASE WHEN len(sy) >= 2
                     THEN list_transform(generate_series(1, len(sy) - 1),
                                         i -> sy[i] || ' ' || sy[i+1])
                     ELSE []::VARCHAR[] END) AS pair, freq
            FROM (SELECT string_split(trim(s), ' ') AS sy, freq FROM w{r}))
          GROUP BY pair
        ),
        b{r} AS MATERIALIZED (SELECT pair, cnt FROM p{r} ORDER BY cnt DESC, pair LIMIT 1),
        w{r + 1} AS MATERIALIZED (
          SELECT replace(replace(s,
                   ' ' || (SELECT pair FROM b{r}) || ' ',
                   ' ' || (SELECT replace(pair, ' ', '') FROM b{r}) || ' '),
                   ' ' || (SELECT pair FROM b{r}) || ' ',
                   ' ' || (SELECT replace(pair, ' ', '') FROM b{r}) || ' ') AS s,
                 freq
          FROM w{r}
        )"""
    sql += "\n        " + "\n        UNION ALL ".join(
        f"SELECT {r} AS merge_rank, string_split(pair, ' ')[1] AS left_sym,"
        f" string_split(pair, ' ')[2] AS right_sym, cnt FROM b{r}"
        for r in range(n_merges)
    )
    return sql
