"""Format-edge release pipeline composed end-to-end: crawl-format JSONL
in → curation → budgeted selection → seeded JSONL shards out → content
manifest → verify.  Every stage is proven in isolation elsewhere; this
pins that the NEW format edges (r9) compose with the standing curation
and export operators — the full "raw crawl drop to verifiable release"
path a training-data pipeline runs.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from big_data_engineering_financial_analysis_spark.operators import export_manifest as em
from big_data_engineering_financial_analysis_spark.operators.dedup import exact_dedup_groups
from big_data_engineering_financial_analysis_spark.operators.export import token_budget_mix
from big_data_engineering_financial_analysis_spark.sources import jsonl
from tests.conftest import SF_SMALL


def test_jsonl_crawl_to_verified_release(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")

    # --- landing: crawl drop as JSONL, with junk lines mixed in -------
    drop = str(tmp_path / "drop")
    docs.write.mode("overwrite").json(drop)
    with open(f"{drop}/zz-junk.json", "w") as fh:  # a mangled landing file
        fh.write('{"doc_id": broken\nnot json either\n')
    assert jsonl.corrupt_line_count(spark, drop) == 2
    landed = jsonl.read_documents_jsonl(spark, drop)
    assert landed.count() == docs.count()

    # --- curation: exact dedup survivors only -------------------------
    keepers = exact_dedup_groups(landed).select(
        F.col("keeper_id").alias("doc_id")
    )
    curated = landed.join(keepers, "doc_id", "leftsemi").withColumn(
        "n_tokens", F.size(F.split(F.trim("text"), "\\s+")).cast("long")
    )

    # --- selection: per-language token budgets -------------------------
    budgets = {"en": 4000, "de": 2000}
    selected = token_budget_mix(curated, budgets, domain_col="lang", seed=3)
    by_lang = {
        r["lang"]: r["t"]
        for r in selected.groupBy("lang").agg(F.sum("n_tokens").alias("t")).collect()
    }
    assert set(by_lang) <= set(budgets)
    assert all(by_lang[d] <= budgets[d] for d in by_lang)

    # --- export: seeded JSONL shards + content manifest ----------------
    release = str(tmp_path / "release")
    jsonl.write_corpus_jsonl(
        selected.drop("cum_tokens"), release, n_shards=3, seed=3
    )
    manifest = em.write_export_manifest(
        spark, release, extra={"seed": 3, "budgets": budgets}
    )
    assert manifest["n_files"] == 3
    assert em.verify_export(spark, release)["ok"]

    # --- consume: a trainer-side read sees exactly the selection -------
    back = jsonl.read_documents_jsonl(spark, release)
    assert sorted(r.doc_id for r in back.collect()) == sorted(
        r.doc_id for r in selected.collect()
    )

    # --- rebuild determinism: same inputs => identical release bytes ---
    release2 = str(tmp_path / "release2")
    jsonl.write_corpus_jsonl(
        selected.drop("cum_tokens"), release2, n_shards=3, seed=3
    )
    manifest2 = em.write_export_manifest(
        spark, release2, extra={"seed": 3, "budgets": budgets}
    )
    def content(m):
        return sorted(
            (rel.split("/")[0], v["md5"], v["bytes"])
            for rel, v in m["files"].items()
        )
    assert content(manifest2) == content(manifest)
