"""calendar_ffill / backtest equity / PSI drift semantics on fixtures."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

T0 = dt.datetime(2024, 1, 1)


def _d(i):
    return T0 + dt.timedelta(days=i)


def test_calendar_ffill_fills_gaps_with_last_observation(spark):
    from big_data_engineering_financial_analysis_spark.operators.timegrid import (
        calendar_ffill,
    )

    rows = [
        {"stock_symbol": "A", "bucket": _d(0), "close": 10.0},
        {"stock_symbol": "A", "bucket": _d(2), "close": 12.0},
        {"stock_symbol": "A", "bucket": _d(5), "close": 15.0},
        {"stock_symbol": "B", "bucket": _d(1), "close": 7.0},
        {"stock_symbol": "B", "bucket": _d(2), "close": 8.0},
    ]
    out = calendar_ffill(spark.createDataFrame(rows)).collect()
    a = {r["bucket"]: r for r in out if r["stock_symbol"] == "A"}
    b = {r["bucket"]: r for r in out if r["stock_symbol"] == "B"}
    # A spans its own range 0..5 (6 rows), B spans 1..2 (2 rows)
    assert len(a) == 6 and len(b) == 2
    assert [a[_d(i)]["close"] for i in range(6)] == [10.0, 10.0, 12.0, 12.0, 12.0, 15.0]
    assert [a[_d(i)]["is_filled"] for i in range(6)] == [0, 1, 0, 1, 1, 0]
    assert b[_d(1)]["close"] == 7.0 and b[_d(1)]["is_filled"] == 0


def test_backtest_equity_no_lookahead_and_compounding(spark):
    """The registered query's core math on one symbol: equity compounds
    (1 + ret) exactly on days where YESTERDAY's signal was long."""
    from big_data_engineering_financial_analysis_spark.plans.registry_tech import (
        q_backtest_equity,
    )

    # use the real query at sf0.001 for an end-to-end smoke of the math
    out = q_backtest_equity(spark, "/root/testdata/sf0.001").collect()
    by_sym = {}
    for r in out:
        by_sym.setdefault(r["stock_symbol"], []).append(r)
    checked = 0
    for sym, rows in by_sym.items():
        rows.sort(key=lambda r: r["bucket"])
        eq = 1.0
        for i, r in enumerate(rows):
            if r["pos"] == 1 and r["ret"] is not None:
                eq *= 1.0 + r["ret"]
            # rounded-column drift only: compare loosely
            assert r["equity"] == pytest.approx(eq, rel=5e-4), (sym, i)
            checked += 1
        # flat days never move equity; first row is always flat (lagged pos)
        assert rows[0]["pos"] == 0
    assert checked > 50


def test_psi_flags_shifted_distribution_only(spark):
    from big_data_engineering_financial_analysis_spark.operators.drift import (
        psi_report,
    )

    rows = []
    # group "stable": same uniform values in both periods
    for i in range(500):
        rows.append(("stable", "ref", float(i % 100)))
        rows.append(("stable", "cur", float((i * 7) % 100)))
    # group "shifted": cur values pushed to the top decile
    for i in range(500):
        rows.append(("shifted", "ref", float(i % 100)))
        rows.append(("shifted", "cur", 90.0 + (i % 10)))
    df = spark.createDataFrame(rows, "g string, p string, v double")
    out = {
        r["grp"]: r
        for r in psi_report(df, "v", F.col("p"), "g").collect()
    }
    assert out["stable"]["drift"] == 0 and out["stable"]["psi"] < 0.05
    assert out["shifted"]["drift"] == 1 and out["shifted"]["psi"] > 1.0
    assert out["stable"]["n_ref"] == out["stable"]["n_cur"] == 500


def test_psi_is_partition_invariant(spark):
    """Bin-ordered fold: PSI identical under any physical layout."""
    from big_data_engineering_financial_analysis_spark.operators.drift import (
        psi_report,
    )

    rows = [("g", "ref" if i % 2 else "cur", float(i % 37)) for i in range(400)]
    df = spark.createDataFrame(rows, "g string, p string, v double")
    a = psi_report(df.repartition(13), "v", F.col("p"), "g").first()["psi"]
    b = psi_report(df.coalesce(1), "v", F.col("p"), "g").first()["psi"]
    assert a == b
