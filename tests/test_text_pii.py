"""PII redaction (operators/text.py with_pii_redaction): behavioral cases
plus a DuckDB oracle sweep — the operator is SQL-expressible, so even
though it holds no registry slot it gets registry-grade proof here (same
regexes, same sequential count-then-redact composition, hash-equal on
the real documents table)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from big_data_engineering_financial_analysis_spark.operators import text as tx

SF = "/root/testdata/sf0.001"

CASES = [
    ("mail me at jane.doe+spam@example.co.uk please", 1, 0, 0),
    ("server at 10.0.0.1 and backup at 192.168.255.7", 0, 2, 0),
    ("call +1 (415) 555-0142 today", 0, 0, 1),
    ("released 2024-01-05, version 1.2.3", 0, 0, 0),  # date+semver survive
    ("a@b.io from 127.0.0.1 dialed +44 7700 900123", 1, 1, 1),
    ("no pii here at all", 0, 0, 0),
    ("us office (415) 555-0142, hotline 09123456789", 0, 0, 2),
    ("logged 2024-01-05 12:00 and (2023-11-30) too", 0, 0, 0),  # paren date survives
]


def test_redaction_cases(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (t, *_e) in enumerate(CASES)], ["doc_id", "text"]
    )
    out = {
        r.doc_id: r
        for r in tx.with_pii_redaction(df).collect()
    }
    for i, (text, n_e, n_i, n_p) in enumerate(CASES):
        r = out[i]
        assert (r.n_emails, r.n_ips, r.n_phones) == (n_e, n_i, n_p), text
        assert r.pii_ok == int(n_e == n_i == n_p == 0)
        if n_e:
            assert "<EMAIL>" in r.text_redacted and "@" not in r.text_redacted
        if n_i:
            assert "<IP>" in r.text_redacted
        if n_p:
            assert "<PHONE>" in r.text_redacted
    # clean text passes through byte-identical
    assert out[5].text_redacted == CASES[5][0]


def test_ip_digits_never_double_count_as_phone(spark):
    df = spark.createDataFrame([(0, "ping 123.456.789.012 now")], ["doc_id", "text"])
    r = tx.with_pii_redaction(df).collect()[0]
    assert (r.n_ips, r.n_phones) == (1, 0)
    assert r.text_redacted == "ping <IP> now"


def test_duckdb_oracle_parity_on_documents(spark):
    """Same patterns + same sequential composition in DuckDB over the real
    documents table must agree row-for-row — proves the Java/RE2 regex
    subset claim, not just the happy paths."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = (
        tx.with_pii_redaction(docs)
        .select("doc_id", "n_emails", "n_ips", "n_phones", "text_redacted")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    email, ip, phone = tx.EMAIL_RE, tx.IPV4_RE, tx.PHONE_RE
    exp = con.execute(
        f"""
        WITH t AS (
          SELECT doc_id, text,
                 regexp_replace(text, ?, '<EMAIL>', 'g') AS t1
          FROM read_parquet('{SF}/documents.parquet')
        ), u AS (
          SELECT *, regexp_replace(t1, ?, '<IP>', 'g') AS t2 FROM t
        )
        SELECT doc_id,
               len(regexp_extract_all(text, ?)) AS n_emails,
               len(regexp_extract_all(t1, ?)) AS n_ips,
               len(regexp_extract_all(t2, ?)) AS n_phones,
               regexp_replace(t2, ?, '<PHONE>', 'g') AS text_redacted
        FROM u ORDER BY doc_id
        """,
        [email, ip, email, ip, phone, phone],
    ).df()
    assert len(got) == len(exp) > 0
    for col in ("n_emails", "n_ips", "n_phones", "text_redacted"):
        assert got[col].tolist() == exp[col].tolist(), col


def test_phone_pattern_properties():
    """Hypothesis sweep of the date/phone boundary in pure Python (same
    Java-compatible RE2 subset, so `re` agrees with both engines):
    ISO dates, datetimes, and semver strings are NEVER redacted; compact
    digit runs of 9-15 digits ALWAYS are."""
    import re

    from hypothesis import given, settings
    from hypothesis import strategies as st

    pat = re.compile(tx.PHONE_RE)

    @settings(max_examples=300, deadline=None)
    @given(
        y=st.integers(1900, 2099), mo=st.integers(1, 12), d=st.integers(1, 28),
        h=st.integers(0, 23), mi=st.integers(0, 59), s=st.integers(0, 59),
    )
    def dates_survive(y, mo, d, h, mi, s):
        for text in (
            f"{y:04d}-{mo:02d}-{d:02d}",
            f"{y:04d}-{mo:02d}-{d:02d} {h:02d}:{mi:02d}:{s:02d}",
            f"v{y % 100}.{mo}.{d}",
        ):
            assert pat.search(text) is None, text

    @settings(max_examples=200, deadline=None)
    @given(digits=st.text(alphabet="0123456789", min_size=9, max_size=15))
    def digit_runs_redact(digits):
        m = pat.search(f"id {digits} end")
        assert m is not None and m.group(0) == digits

    dates_survive()
    digit_runs_redact()


def test_gate_composition_is_pushable(spark):
    """pii_ok composes as a scan-level gate: the filtered plan contains no
    Python and no shuffle (row-local expressions only)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = (
        tx.with_pii_redaction(docs)
        .filter(F.col("pii_ok") == 1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan
