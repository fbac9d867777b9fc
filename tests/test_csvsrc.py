"""Checked CSV ingest: explicit schemas, corrupt-line capture + health
count, clean serving view, parquet bridge — the JSONL contract, comma-
shaped."""

from __future__ import annotations

from pyspark.sql import types as T

from big_data_engineering_financial_analysis_spark.sources import csvsrc

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("lang", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ]
)


def _write_csv(tmp_path):
    p = tmp_path / "drop"
    p.mkdir()
    (p / "a.csv").write_text(
        "doc_id,lang,score\n"
        "1,en,0.5\n"
        "2,de,0.25\n"
        "not-a-long,en,0.1\n"  # corrupt: doc_id fails the long parse
        "3,en,0.75\n"
    )
    return str(p)


def test_checked_read_captures_corrupt_lines(spark, tmp_path):
    src = _write_csv(tmp_path)
    checked = csvsrc.read_csv_checked(spark, src, SCHEMA)
    assert checked.count() == 4
    assert csvsrc.corrupt_csv_count(checked) == 1
    bad = checked.filter("_corrupt_record IS NOT NULL").collect()
    assert len(bad) == 1 and bad[0]["_corrupt_record"].startswith("not-a-long")


def test_clean_view_drops_malformed(spark, tmp_path):
    src = _write_csv(tmp_path)
    clean = csvsrc.read_csv_clean(spark, src, SCHEMA)
    assert "_corrupt_record" not in clean.columns
    rows = {r["doc_id"]: r for r in clean.collect()}
    assert sorted(rows) == [1, 2, 3]
    assert rows[3]["score"] == 0.75


def test_parquet_bridge_lands_in_clustered_layout(spark, tmp_path):
    import os

    src = _write_csv(tmp_path)
    dest = str(tmp_path / "ds")
    csvsrc.csv_to_parquet(
        spark, src, dest, SCHEMA, partition_cols=["lang"], sort_cols=["doc_id"]
    )
    assert sorted(d for d in os.listdir(dest) if d.startswith("lang=")) == [
        "lang=de",
        "lang=en",
    ]
    back = spark.read.parquet(dest)
    assert back.count() == 3
    assert back.filter("lang = 'en'").count() == 2


def test_corrupt_only_schema_raises_contract_error(spark):
    """Advice r9: a checked frame whose schema is ONLY the corrupt
    column must fail with the stated contract, not a bare
    StopIteration escaping from next()."""
    import pytest

    df = spark.createDataFrame(
        [("x",)],
        T.StructType([T.StructField(csvsrc.CORRUPT_COL, T.StringType())]),
    )
    with pytest.raises(ValueError, match="at least one data column"):
        csvsrc.corrupt_csv_count(df)
