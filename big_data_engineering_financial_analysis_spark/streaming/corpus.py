"""Streaming corpus ingest: incremental dedup + quality gating.

The batch datapipe operators (operators/dedup.py, operators/text.py) are
row-local or hash-keyed, so their streaming twins come almost for free:

* quality / language gates are stateless projections — identical columns
  on a stream;
* exact dedup becomes state-store-backed ``dropDuplicates`` on the
  canonical content hash: the first document with a given hash wins
  across micro-batches AND restarts (checkpointed state), which is the
  incremental version of ``exact_dedup_groups``'s keep-min semantics
  under arrival order.

State bounds: content-hash dedup state grows with distinct documents.
With an event-time column, pass ``watermark_ts`` to get
``dropDuplicatesWithinWatermark`` eviction; without one (the synthetic
``documents`` table has none) state is unbounded — at 100 TB ingest you
either carry an ingest timestamp (recommended; any real feed has one) or
periodically compact via the batch pipeline.  Near-dup (minhash) streaming
dedup is deliberately NOT incremental here: LSH bucket joins need the
full signature store; run the batch ``corpus_prep`` over compacted
windows instead (the standard lambda split for this workload).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from big_data_engineering_financial_analysis_spark.operators.dedup import canonical_text
from big_data_engineering_financial_analysis_spark.operators.partitioning import pushdown_barrier
from big_data_engineering_financial_analysis_spark.operators.text import (
    with_lang_guess,
    with_quality,
    with_repetition,
)


def corpus_gate_stream(
    docs: DataFrame,
    lang: str = "en",
    quality_floor: float = 0.5,
    rep_cap: float | None = None,
) -> DataFrame:
    """Stateless lang/quality(/repetition) gates on a document stream —
    the same expressions as the batch corpus_prep stages, so streamed and
    batch-gated corpora are row-identical.  ``rep_cap`` engages the
    Gopher max-token-ratio filter (row-local, so it streams unchanged;
    ``spread()`` passes streaming frames through)."""
    scored = with_quality(with_lang_guess(docs))
    kept = scored.filter(
        (F.col("lang_guess") == lang) & (F.col("quality_score") >= quality_floor)
    )
    if rep_cap is not None:
        # Filtering directly on with_repetition's RLE column would let
        # predicate pushdown inline the aliased sort/HOF intermediates into
        # the filter (quadratic per row — text.py CAUTION).  The batch
        # corpus_prep gates behind an Aggregate; a streaming gate must stay
        # stateless, so block the pushdown with a non-deterministic no-op
        # instead (plan shape asserted in tests/test_streaming_corpus.py).
        kept = with_repetition(kept).withColumn(
            "max_token_ratio", pushdown_barrier(F.col("max_token_ratio"))
        ).filter(F.col("max_token_ratio") <= rep_cap)
    return kept


def corpus_dedup_stream(
    docs: DataFrame,
    text_col: str = "text",
    watermark_ts: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """First-writer-wins exact dedup across micro-batches by canonical
    content hash (incremental ``exact_dedup_groups``)."""
    hashed = docs.withColumn(
        "content_hash", F.md5(canonical_text(F.col(text_col)).cast("binary"))
    )
    if watermark_ts is not None:
        return hashed.withWatermark(watermark_ts, watermark).dropDuplicatesWithinWatermark(
            ["content_hash"]
        )
    return hashed.dropDuplicates(["content_hash"])


def corpus_ingest_stream(
    docs: DataFrame,
    lang: str = "en",
    quality_floor: float = 0.5,
    rep_cap: float | None = None,
    watermark_ts: str | None = None,
) -> DataFrame:
    """Gate then dedup — the streaming front half of ``corpus_prep``.

    Gating BEFORE dedup keeps rejected documents out of the dedup state
    entirely (state size tracks accepted distinct docs only).
    """
    return corpus_dedup_stream(
        corpus_gate_stream(docs, lang, quality_floor, rep_cap),
        watermark_ts=watermark_ts,
    )
