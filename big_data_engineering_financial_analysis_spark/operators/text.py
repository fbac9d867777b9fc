"""Text-analysis operators for training-data pipelines.

The reference pipeline has no text processing (its only strings are symbol
names), so this module is pure engine extension surface — the operations a
100 TB document-corpus pipeline needs, each expressed as JVM-side column
expressions (no Python in the hot path):

* token counting — whitespace tokens plus a BPE-ish word-piece regex count;
* quality scoring — length/stopword/punctuation features folded into a
  deterministic [0, 1] score;
* language ID — marker-stopword profile scoring with a deterministic
  priority tie-break (a heuristic, not a model: good enough for routing,
  cheap enough for 100 TB);
* fingerprinting — canonical-text md5 plus a 1-permutation minhash of
  3-gram shingles.

Everything is order-free row-local arithmetic -> embarrassingly parallel,
no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from big_data_engineering_financial_analysis_spark.functions.hashing import hash64, shingles, tokens
from big_data_engineering_financial_analysis_spark.operators.partitioning import spread

#: marker stopwords per language, with a deterministic priority used to
#: break score ties (higher wins).  Keep in sync with LANG_MARKERS_SQL.
LANG_MARKERS: dict[str, tuple[int, list[str]]] = {
    "en": (5, ["the", "a", "and", "of", "to", "is"]),
    "fr": (4, ["le", "la", "et", "de", "un", "est"]),
    "es": (3, ["el", "la", "y", "de", "un", "es"]),
    "de": (2, ["der", "die", "und", "das", "ein", "ist"]),
    "zh": (1, ["de", "le", "shi", "bu", "wo"]),
}

#: BPE-ish word-piece pattern: letter runs, digit runs, or single symbols.
WORDPIECE_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"

PUNCT_RE = "[^a-zA-Z0-9\\s]"


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token/char counts: whitespace tokens, word-piece tokens, distinct."""
    t = tokens(F.col(text_col))
    return (
        df.withColumn("n_chars_calc", F.length(F.col(text_col)).cast("long"))
        .withColumn("n_tokens", F.size(t).cast("long"))
        .withColumn("n_distinct_tokens", F.size(F.array_distinct(t)).cast("long"))
        .withColumn(
            "n_wordpieces",
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(WORDPIECE_RE), 0)).cast("long"),
        )
        .withColumn(
            "avg_token_len",
            F.round(
                F.aggregate(t, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x))
                / F.nullif(F.size(t).cast("double"), F.lit(0.0)),
                6,
            ),
        )
    )


def _marker_count(toks: Column, markers: list[str]) -> Column:
    return F.size(F.filter(toks, lambda x: x.isin(markers))).cast("long")


def with_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic quality features + composite score in [0, 1].

    Pure linear arithmetic (no exp/log) so the score is bit-identical
    across engines.
    """
    t = tokens(F.col(text_col))
    n_tokens = F.size(t).cast("double")
    n_chars = F.length(F.col(text_col)).cast("double")
    stop = _marker_count(t, LANG_MARKERS["en"][1]).cast("double")
    punct = (
        n_chars - F.length(F.regexp_replace(F.col(text_col), PUNCT_RE, ""))
    ).cast("double")
    stop_ratio = stop / F.nullif(n_tokens, F.lit(0.0))
    punct_ratio = punct / F.nullif(n_chars, F.lit(0.0))
    length_score = F.least(F.lit(1.0), n_tokens / F.lit(100.0))
    return (
        df.withColumn("stopword_ratio", F.round(stop_ratio, 6))
        .withColumn("punct_ratio", F.round(punct_ratio, 6))
        # emitted (not just folded into quality_score): the classifier
        # scorer's DEFAULT_WEIGHTS name length_score, and hiding it
        # forced callers to re-derive the formula by hand (it drifted
        # into two registry copies before this column existed)
        .withColumn("length_score", length_score)
        .withColumn(
            "quality_score",
            F.round(
                length_score * 0.5
                + F.coalesce(stop_ratio, F.lit(0.0)) * 0.3
                + (F.lit(1.0) - F.coalesce(punct_ratio, F.lit(0.0))) * 0.2,
                6,
            ),
        )
    )


def with_lang_guess(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-profile language ID with deterministic tie-break.

    Each language's score is ``count(marker tokens) * 8 + priority``; the
    arg-max decodes back to the language.  Integer arithmetic only, so the
    SQL oracle agrees exactly.
    """
    # bind each language's encoded score to a REAL column: HOF arguments
    # are not common-subexpression-eliminated (the with_repetition rule),
    # so inlining _marker_count into both greatest() and every decode
    # branch re-tokenizes and re-filters the text 2x per language
    t = tokens(F.col(text_col))
    score_of = {lang: f"_lg_{lang}" for lang in LANG_MARKERS}
    out = df
    for lang, (prio, markers) in LANG_MARKERS.items():
        out = out.withColumn(
            score_of[lang], _marker_count(t, markers) * 8 + F.lit(prio)
        )
    best = F.greatest(*[F.col(c) for c in score_of.values()])
    expr = None
    for lang, _ in sorted(LANG_MARKERS.items(), key=lambda kv: -kv[1][0]):
        cond = best == F.col(score_of[lang])
        expr = F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
    return out.withColumn("lang_guess", expr.otherwise(F.lit("und"))).drop(
        *score_of.values()
    )


def _run_starts(arr: Column, n: Column) -> Column:
    """1-based indices opening each run of equal adjacent elements in a
    SORTED array (empty when ``n`` is 0).

    Run-length encoding via an int-index filter instead of a fold carrying
    a struct accumulator: higher-order functions evaluate interpreted, and
    a struct-per-element accumulator allocates a row per step — measured
    5-20x slower end-to-end (GC-bound) than this primitive formulation.
    The ``when(i == 1, ...)`` guard keeps ``element_at(arr, 0)`` from ever
    evaluating (ANSI mode errors on index 0).
    """
    starts = F.filter(
        F.sequence(F.lit(1), n),
        lambda i: F.when(i == 1, F.lit(True)).otherwise(
            F.element_at(arr, i) != F.element_at(arr, (i - 1).cast("int"))
        ),
    )
    # sequence(1, 0) counts DOWN ([1, 0]) instead of returning empty —
    # same Spark quirk guarded in hashing.shingles
    return F.when(n >= 1, starts).otherwise(F.array().cast("array<int>"))


def _run_lengths(starts: Column, n_starts: Column, n: Column) -> Column:
    """Run lengths from run-start indices: diff against the next start,
    with the array end (n+1) as sentinel.  All primitive array ops,
    empty-safe (slice length clamped at 0)."""
    shifted = F.concat(
        F.slice(starts, 2, F.greatest(n_starts - 1, F.lit(0))),
        F.when(n_starts >= 1, F.array((n + 1).cast("int"))).otherwise(
            F.array().cast("array<int>")
        ),
    )
    return F.zip_with(starts, shifted, lambda a, b: b - a)


def with_repetition(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021, table A1) as pure
    row-local column expressions — the quality gates an LLM corpus build
    applies before dedup:

    * ``max_token_ratio`` — count of the most frequent token / token count
      (catches "foo foo foo ..." degenerate pages);
    * ``top_bigram_char_ratio`` — characters covered by occurrences of the
      most frequent word 2-gram / total characters (ties keep the
      lexicographically smallest bigram: first maximum of the ascending
      sorted runs, matching the oracle's ``ORDER BY c DESC, g``);
    * ``dup_trigram_char_ratio`` — characters covered by the UNION of all
      duplicated word-3-gram occurrences / total characters (each char
      once, the Gopher char-mask rule — bounded by 1.0; top-n-gram above
      deliberately keeps the count*len convention of the public
      Gopher-repro implementations, which CAN double-count overlaps).

    Each metric sorts the token/shingle array once and run-length-encodes
    it with primitive index arrays (O(n log n) row-local) — no explode, no
    shuffle, embarrassingly parallel at 100 TB.  The SQL oracle computes
    the same statistics relationally (unnest -> GROUP BY), so the RLE
    logic is independently cross-checked.  NULL when the document has no
    bigrams/trigrams (shorter than n tokens), mirrored by the oracle.

    The input is :func:`spread` first: shingle construction + sort is the
    dominant cost, and a small-file corpus otherwise runs it all on one
    task (no-op on well-partitioned input).  Intermediate arrays are bound
    to real columns — HOF arguments are not common-subexpression-
    eliminated, so inlining them would recompute the sort per consumer.

    CAUTION — do not FILTER directly on these columns inside a larger
    plan: predicate pushdown inlines the aliased intermediates into the
    filter, and HOF lambdas re-evaluate free-variable subtrees per
    element (quadratic per row).  Gate on
    :func:`max_token_ratio_agg`'s aggregate output instead (an Aggregate
    is a pushdown barrier) — see corpus_prep.
    """
    df = spread(df)
    t = tokens(F.col(text_col))
    n_chars = F.length(F.col(text_col)).cast("double")

    # --- most frequent token (tokens are never empty: split('') = ['']) ---
    d = df.withColumn("_rt", F.array_sort(t)).withColumn("_rn", F.size("_rt"))
    d = d.withColumn("_rs", _run_starts(F.col("_rt"), F.col("_rn")))
    max_run = F.array_max(
        _run_lengths(F.col("_rs"), F.size("_rs"), F.col("_rn"))
    )
    d = d.withColumn(
        "max_token_ratio",
        F.round(
            max_run.cast("double") / F.nullif(F.col("_rn").cast("double"), F.lit(0.0)), 6
        ),
    )

    # --- most frequent bigram ---
    d = d.withColumn("_bg", F.array_sort(shingles(t, 2))).withColumn(
        "_bn", F.size("_bg")
    )
    d = d.withColumn("_bs", _run_starts(F.col("_bg"), F.col("_bn")))
    d = d.withColumn(
        "_brl", _run_lengths(F.col("_bs"), F.size("_bs"), F.col("_bn"))
    )
    b_best = F.array_max(F.col("_brl"))
    b_idx = F.array_position(F.col("_brl"), b_best).cast("int")
    b_elem = F.element_at(F.col("_bg"), F.element_at(F.col("_bs"), b_idx))
    d = d.withColumn(
        "top_bigram_char_ratio",
        F.when(
            F.col("_bn") >= 1,
            F.round(
                (b_best * F.length(b_elem)).cast("double")
                / F.nullif(n_chars, F.lit(0.0)),
                6,
            ),
        ),
    )

    # --- duplicated trigram characters (UNION of covered spans) ---
    # Gopher's duplicated-n-gram family counts each character ONCE even
    # when occurrences overlap (the datatrove/Gopher-repro char mask);
    # the count*len form double-counts shared words and exceeds 1.0 on
    # repetitive text ("x x x x" -> 10/7), mis-calibrating gates tuned
    # to the published [0,1] thresholds.  Form here: duplicated trigram
    # START positions -> overlap-merged islands (starts within 2 share a
    # word) -> per island, token chars over [a, e] plus its e-a interior
    # separators (all inside some occurrence by the merge invariant).
    d = d.withColumn("_tk", t).withColumn(
        "_tgu", shingles(F.col("_tk"), 3)
    ).withColumn("_tn", F.size("_tgu"))
    d = d.withColumn("_tg", F.array_sort(F.col("_tgu")))
    d = d.withColumn("_ts", _run_starts(F.col("_tg"), F.col("_tn")))
    d = d.withColumn(
        "_trl", _run_lengths(F.col("_ts"), F.size("_ts"), F.col("_tn"))
    )
    # values occurring more than once (distinct-dup-trigram-sized)
    d = d.withColumn(
        "_dv",
        F.filter(
            F.zip_with(
                F.col("_trl"),
                F.col("_ts"),
                lambda rl, st: F.when(rl > 1, F.element_at(F.col("_tg"), st)),
            ),
            lambda x: x.isNotNull(),
        ),
    )
    # their start positions in text order (ascending by construction);
    # the sequence(1, 0)-counts-DOWN quirk needs the same >= 1 guard as
    # _run_starts on both position scans
    d = d.withColumn(
        "_dp",
        F.when(
            F.col("_tn") >= 1,
            F.filter(
                F.sequence(F.lit(1), F.col("_tn")),
                lambda p: F.array_contains(
                    F.col("_dv"), F.element_at(F.col("_tgu"), p)
                ),
            ),
        ).otherwise(F.array().cast("array<int>")),
    )
    # island OPEN indices into _dp: first member, or gap > 2 from the
    # previous start (<= 2 means the occurrences share at least a word)
    d = d.withColumn(
        "_do",
        F.when(
            F.size("_dp") >= 1,
            F.filter(
                F.sequence(F.lit(1), F.size("_dp")),
                lambda j: F.when(j == 1, F.lit(True)).otherwise(
                    F.element_at(F.col("_dp"), j)
                    - F.element_at(F.col("_dp"), (j - 1).cast("int"))
                    > 2
                ),
            ),
        ).otherwise(F.array().cast("array<int>")),
    )
    # chars per island [a, e]: sum of token lengths + (e - a) separators
    island_next = F.concat(
        F.slice(F.col("_do"), 2, F.greatest(F.size("_do") - 1, F.lit(0))),
        F.when(F.size("_do") >= 1, F.array(F.size("_dp") + 1)).otherwise(
            F.array().cast("array<int>")
        ),
    )
    dup_chars = F.aggregate(
        F.zip_with(
            F.col("_do"),
            island_next,
            lambda o, nxt: F.aggregate(
                F.sequence(
                    F.element_at(F.col("_dp"), o.cast("int")),
                    F.element_at(F.col("_dp"), (nxt - 1).cast("int")) + 2,
                ),
                F.lit(0).cast("long"),
                lambda acc, i: acc
                + F.length(F.element_at(F.col("_tk"), i.cast("int"))),
            )
            + (
                F.element_at(F.col("_dp"), (nxt - 1).cast("int"))
                + 2
                - F.element_at(F.col("_dp"), o.cast("int"))
            ),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    d = d.withColumn(
        "dup_trigram_char_ratio",
        F.when(
            F.col("_tn") >= 1,
            F.round(dup_chars.cast("double") / F.nullif(n_chars, F.lit(0.0)), 6),
        ),
    )
    return d.drop(
        "_rt", "_rn", "_rs", "_bg", "_bn", "_bs", "_brl",
        "_tk", "_tgu", "_tg", "_tn", "_ts", "_trl", "_dv", "_dp", "_do",
    )


def max_token_ratio_agg(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, max_token_ratio) via explode + two-level aggregate — the
    relational twin of :func:`with_repetition`'s RLE column, for use
    UNDER filters.

    Why it exists: a predicate on the RLE column gets pushed through the
    projection, which inlines the aliased intermediate arrays into the
    filter — and HOF lambda bodies re-evaluate free-variable subtrees per
    element, so the inlined predicate re-sorts the token array once per
    array element (quadratic per row; measured 52 s vs 3 s at sf0.1).
    An Aggregate is a pushdown barrier Catalyst respects, so filtering
    this output stays O(n).  Cost: one shuffle of distinct (id, token)
    partial counts — the standard relational price, acceptable inside
    composed pipelines; for pure feature EXTRACTION (no filter on the
    result) prefer the shuffle-free :func:`with_repetition`.
    """
    t = tokens(F.col(text_col))
    return (
        df.select(F.col(id_col), F.explode(t).alias("_tok"))
        .groupBy(id_col, "_tok")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy(id_col)
        .agg(
            F.round(
                F.max("_c").cast("double") / F.sum("_c").cast("double"), 6
            ).alias("max_token_ratio")
        )
    )


# --- C4-style heuristic scrub (Raffel et al. 2020, appendix) -------------
#
# Patterns are deliberately brace-free (no {m,n} quantifiers): the corpus
# oracle composes SQL via str.format, and keeping the patterns brace-clean
# lets them substitute into templates verbatim.

#: terminal-punctuation rule: a "sentence-like" line ends with . ! or ?
#: (optionally followed by a closing double quote) — C4's line keeper.
TERMINAL_PUNCT_RE = '[.!?]"?$'

#: email-ish PII flag (simplified; brace-free by design).
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+"

MIN_LINE_WORDS = 5   # C4: keep lines with at least 5 words
MIN_KEPT_LINES = 3   # C4: keep pages with at least 3 retained sentences
MIN_PAGE_WORDS = 20  # Gopher-style page-level word floor


def with_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """C4-style line + page scrub flags and the scrubbed text.

    Line rules (applied per ``\\n`` line): keep lines that end in terminal
    punctuation AND have >= MIN_LINE_WORDS words.  Page rules: flag curly
    braces (code/boilerplate), "lorem ipsum" (placeholder), and email-ish
    strings (PII); ``scrub_ok`` requires >= MIN_KEPT_LINES surviving lines
    and no page flag.  ``scrubbed_text`` is the surviving lines rejoined —
    the text a C4-style build would actually train on.

    Everything is row-local native expressions (split / HOF filter /
    rlike / array_join): no shuffle, no Python, embarrassingly parallel
    at 100 TB, and each rule reproduces exactly in the DuckDB oracle.
    """
    c = F.col(text_col)
    lines = F.split(c, "\n")

    def _line_ok(ln: Column) -> Column:
        t = F.trim(ln)
        return t.rlike(TERMINAL_PUNCT_RE) & (
            F.size(F.split(t, "\\s+")) >= MIN_LINE_WORDS
        )

    kept = F.filter(lines, _line_ok)
    return (
        df.withColumn("n_lines", F.size(lines).cast("long"))
        .withColumn("n_kept_lines", F.size(kept).cast("long"))
        .withColumn("scrubbed_text", F.array_join(kept, "\n"))
        .withColumn("has_brace", c.contains("{").cast("int"))
        .withColumn("has_lorem", F.lower(c).contains("lorem ipsum").cast("int"))
        .withColumn("has_email", c.rlike(EMAIL_RE).cast("int"))
        .withColumn(
            "scrub_ok",
            (
                (F.size(kept) >= MIN_KEPT_LINES)
                & ~c.contains("{")
                & ~F.lower(c).contains("lorem ipsum")
                & ~c.rlike(EMAIL_RE)
            ).cast("int"),
        )
    )


def page_scrub_ok(text_col: str = "text") -> Column:
    """Page-level scrub predicate for corpora WITHOUT line structure (the
    line rules of :func:`with_scrub` assume sentence-per-line text):
    blocklist flags plus a minimum word count.  Row-local and native, so
    Catalyst pushes it into the scan — use as the first corpus_prep gate.
    """
    c = F.col(text_col)
    return (
        ~c.contains("{")
        & ~F.lower(c).contains("lorem ipsum")
        & ~c.rlike(EMAIL_RE)
        & (F.size(tokens(c)) >= MIN_PAGE_WORDS)
    )


# --- PII redaction --------------------------------------------------------
#
# The standard pre-training privacy stage (BigScience ROOTS-style): replace
# well-formed PII spans with typed tags rather than dropping documents.
# Heuristic by nature; patterns err toward OVER-redaction (losing a token
# of text) because the failure direction that matters is leaking PII into
# a training corpus, never the reverse.  Unlike the C4 patterns above,
# these are not substituted into SQL templates, so they use {m,n}
# quantifiers freely — semantics are identical in Java regex (Spark) and
# RE2 (DuckDB): plain classes, groups, and bounded repeats only (no
# backreferences or lookaround, which RE2 lacks).

#: dotted quad; octet ranges deliberately unchecked (over-redaction-safe).
IPV4_RE = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

#: three shapes, ordered from least to most ambiguous; spaces are only
#: legal separators in the UNambiguous shapes so dates and timestamps
#: ("2024-01-05 12:00") survive:
#: 1. leading "+" (international): digits with any ( ) . - space mix;
#: 2. "(NNN…)" area code (≤4 digits, closed) then ≥6 more digits;
#: 3. bare run of 9-15 digits with single ( ) . - separators (no spaces —
#:    the 9-digit floor keeps 8-digit ISO dates out).
#: IPs are redacted before phones so dotted quads never double-count.
PHONE_RE = (
    "(\\+[0-9][0-9() .\\-]{6,18}[0-9])"
    "|(\\([0-9]{1,4}\\)[ .\\-]?([0-9][() .\\-]?){5,13}[0-9])"
    "|(([0-9][().\\-]?){8,14}[0-9])"
)


def with_pii_redaction(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Typed PII redaction: emails → ``<EMAIL>``, dotted quads → ``<IP>``,
    phone-like digit runs → ``<PHONE>``, plus per-type counts and a
    ``pii_ok`` flag for gate composition (`page_scrub_ok` style).

    Counting and redaction run SEQUENTIALLY (emails, then IPs on the
    email-redacted text, then phones on the IP-redacted text) so each
    count is exactly the number of spans its stage redacted — an IP's
    digits can never also be counted as a phone.  All stages are native
    ``regexp_count`` / ``regexp_replace`` expressions: row-local, no
    shuffle, no Python, whole-stage-codegen at 100 TB; each reproduces
    verbatim in DuckDB (RE2 and Java regex agree on this pattern subset,
    asserted oracle-style in tests/test_text_pii.py).

    The reference has no privacy stage at all; this is part of the
    training-data extension surface (same family as `with_scrub`).
    """
    c = F.col(text_col)
    t1 = F.regexp_replace(c, EMAIL_RE, "<EMAIL>")
    t2 = F.regexp_replace(t1, IPV4_RE, "<IP>")
    t3 = F.regexp_replace(t2, PHONE_RE, "<PHONE>")
    n_emails = F.regexp_count(c, F.lit(EMAIL_RE))
    n_ips = F.regexp_count(t1, F.lit(IPV4_RE))
    n_phones = F.regexp_count(t2, F.lit(PHONE_RE))
    return (
        df.withColumn("n_emails", n_emails.cast("long"))
        .withColumn("n_ips", n_ips.cast("long"))
        .withColumn("n_phones", n_phones.cast("long"))
        .withColumn("text_redacted", t3)
        .withColumn(
            "pii_ok",
            ((n_emails == 0) & (n_ips == 0) & (n_phones == 0)).cast("int"),
        )
    )


DECONTAM_SHINGLE = 5


def contamination_hits(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = DECONTAM_SHINGLE,
) -> DataFrame:
    """Benchmark decontamination: corpus documents sharing at least one
    word ``shingle_n``-gram with any benchmark document, with the count
    of distinct overlapping n-grams — the standard eval-leakage filter a
    training-data build runs before shipping a corpus (n-gram collision
    flagging as in GPT-3 appendix C / PaLM).

    Plan shape for 100 TB: both sides reduce to DISTINCT 64-bit shingle
    hashes (never the shingle strings — the shuffle carries 8 bytes per
    gram), the benchmark side is orders of magnitude smaller and
    broadcast, so the corpus side never shuffles: explode -> hash ->
    broadcast-semi-join -> per-doc count.  Output: (id, n_hits) for
    contaminated documents only.
    """
    c_sh = spread(corpus).select(
        F.col(id_col),
        F.explode(
            F.array_distinct(shingles(tokens(F.col(text_col)), shingle_n))
        ).alias("_g"),
    ).select(F.col(id_col), hash64(F.col("_g"), "decontam").alias("gh"))
    b_sh = (
        benchmark.select(
            F.explode(
                F.array_distinct(shingles(tokens(F.col(text_col)), shingle_n))
            ).alias("_g")
        )
        .select(hash64(F.col("_g"), "decontam").alias("gh"))
        .distinct()
    )
    return (
        c_sh.join(F.broadcast(b_sh), "gh", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


WINNOW_WINDOW = 4


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    window: int = WINNOW_WINDOW,
) -> DataFrame:
    """Winnowing fingerprints (Schleimer et al.): hash every shingle, keep
    the minimum hash of each sliding window of ``window`` consecutive
    shingle hashes, emit the distinct minima.

    The standard rolling-hash document fingerprint: two documents sharing a
    run of >= window+shingle_n-1 tokens are guaranteed to share a
    fingerprint, so a groupBy on (fingerprint) finds overlapping passages
    at corpus scale with output linear in document length / window.
    Row-local until the final explode; no shuffle.

    The shingle-hash array is bound to a column BEFORE the windowed
    ``transform``: HOF lambda bodies are not common-subexpression-eliminated,
    so an inlined ``hs`` would re-run every md5 per window index — O(n^2)
    hashing per document (measured 128.8s -> linear after this fix at the
    10x corpus).  ``CollapseProject`` keeps the materialization because the
    alias is non-cheap and referenced more than once.
    """
    toks = tokens(F.col(text_col))
    hashed = df.withColumn(
        "_winnow_hs",
        F.transform(shingles(toks, shingle_n), lambda s: hash64(s, None, 14)),
    )
    hs = F.col("_winnow_hs")
    n_windows = F.size(hs) - F.lit(window - 1)
    mins = F.when(
        n_windows >= 1,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n_windows),
                lambda i: F.array_min(F.slice(hs, i, window)),
            )
        ),
    )
    return hashed.select(F.col(id_col), F.explode(mins).alias("fingerprint"))


def with_fingerprints(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprints: canonical md5 + 1-perm minhash of 3-shingles.

    ``content_fp`` detects byte-identical (post-normalization) texts;
    ``minhash_fp`` is a locality-sensitive 60-bit sketch — equal values
    imply high shingle overlap with high probability.
    """
    canonical = F.regexp_replace(F.lower(F.trim(F.col(text_col))), "\\s+", " ")
    sh = shingles(tokens(F.col(text_col)), 3)
    return (
        df.withColumn("content_fp", F.md5(canonical.cast("binary")))
        .withColumn(
            "minhash_fp",
            F.array_min(F.transform(sh, lambda s: hash64(s, 0))),
        )
    )
