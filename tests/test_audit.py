"""Corpus-prep audit: every input row labeled with its FIRST failing
gate, survivors labeled NULL and provably identical to corpus_prep's
output set."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from big_data_engineering_financial_analysis_spark.operators.audit import (
    STAGES,
    corpus_prep_audit,
    funnel_report,
)
from big_data_engineering_financial_analysis_spark.plans.registry_datapipe import (
    JACCARD_THRESHOLD,
    QUALITY_FLOOR,
    REP_CAP,
    q_corpus_prep,
)
from big_data_engineering_financial_analysis_spark.sources.parquet import load_table

from tests.conftest import SF_SMALL


def _audit(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    return corpus_prep_audit(
        docs,
        lang="en",
        quality_floor=QUALITY_FLOOR,
        rep_cap=REP_CAP,
        threshold=JACCARD_THRESHOLD,
    )


def test_covers_every_input_row_once(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    audit = _audit(spark)
    assert audit.count() == docs.count()
    assert audit.select("doc_id").distinct().count() == docs.count()
    reasons = {
        r["drop_reason"] for r in audit.select("drop_reason").distinct().collect()
    }
    assert reasons <= set(STAGES) | {None}


def test_survivors_equal_corpus_prep(spark):
    """The audit's NULL rows ARE the registered pipeline's survivors —
    same operators, same staging, pinned not assumed."""
    surv_audit = _audit(spark).filter("drop_reason IS NULL").select("doc_id")
    surv_pipe = q_corpus_prep(spark, SF_SMALL).select("doc_id")
    assert surv_audit.exceptAll(surv_pipe).count() == 0
    assert surv_pipe.exceptAll(surv_audit).count() == 0


def test_first_fail_precedence(spark):
    """A document failing several gates is labeled with the EARLIEST —
    e.g. non-English AND low quality -> 'lang', never 'quality'."""
    rows = [
        # passes everything (enough english stopwords, clean, long)
        Row(
            doc_id=1,
            text=(
                "the quick brown fox jumps over the lazy dog and then "
                "the dog was very happy with that outcome because it "
                "could rest in the sun for the whole afternoon with joy"
            ),
        ),
        # fails scrub (under the 20-word page floor) AND lang: -> scrub
        Row(doc_id=2, text="s'il vous plait merci bien le la et de un est"),
        # passes scrub (>=20 words) but German AND low quality: -> lang
        Row(
            doc_id=3,
            text=(
                "der die und das ein ist der die und das ein ist "
                "der die und das ein ist der die und das"
            ),
        ),
        # NULL text: the scrub predicate is NULL — must still label
        # 'scrub' (the pipeline drops it there), never 'lang'
        Row(doc_id=4, text=None),
    ]
    audit = corpus_prep_audit(
        spark.createDataFrame(rows), quality_floor=QUALITY_FLOOR, rep_cap=REP_CAP
    )
    by_id = {r["doc_id"]: r["drop_reason"] for r in audit.collect()}
    assert by_id[2] == "scrub"
    assert by_id[3] == "lang"
    assert by_id[4] == "scrub"
    assert by_id[1] in (None, "quality")  # 1 must at least clear scrub+lang
    idx = {s: i for i, s in enumerate(STAGES)}
    assert all(r is None or idx[r] >= 0 for r in by_id.values())


def test_funnel_report_sums_to_input(spark):
    audit = _audit(spark)
    rep = funnel_report(audit)
    rows = rep.collect()
    assert sum(r["n"] for r in rows) == audit.count()
    assert abs(sum(r["share"] for r in rows) - 1.0) < 0.01
