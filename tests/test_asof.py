"""As-of join tolerance bound vs the pandas merge_asof model (the
no-tolerance path is oracle-proven via the registered asof_join query)."""

from __future__ import annotations

from datetime import datetime, timedelta

import pandas as pd

from big_data_engineering_financial_analysis_spark.operators.asof import asof_join

T = datetime(2024, 1, 1)


def _ts(minutes):
    return T + timedelta(minutes=minutes)


def test_tolerance_matches_pandas_merge_asof(spark):
    left_rows = [("A", _ts(m)) for m in (0, 5, 12, 30)] + [("B", _ts(7))]
    right_rows = [
        ("A", _ts(0), 1.0),
        ("A", _ts(10), 2.0),
        ("B", _ts(1), 9.0),
    ]
    left = spark.createDataFrame(left_rows, "k string, ts timestamp")
    right = spark.createDataFrame(right_rows, "k string, ts timestamp, v double")
    got = (
        asof_join(left, right, "k", "ts", ["v"], tolerance_seconds=300)
        .toPandas()
        .sort_values(["k", "ts"])
        .reset_index(drop=True)
    )
    lp = pd.DataFrame(left_rows, columns=["k", "ts"]).sort_values(["ts", "k"])
    rp = pd.DataFrame(right_rows, columns=["k", "ts", "v"]).sort_values(["ts", "k"])
    want = (
        pd.merge_asof(lp, rp, on="ts", by="k", tolerance=pd.Timedelta(seconds=300))
        .sort_values(["k", "ts"])
        .reset_index(drop=True)
    )
    assert list(got["v_asof"].fillna(-1)) == list(want["v"].fillna(-1))


def test_no_tolerance_keeps_stale_matches(spark):
    left = spark.createDataFrame([("A", _ts(60))], "k string, ts timestamp")
    right = spark.createDataFrame([("A", _ts(0), 1.0)], "k string, ts timestamp, v double")
    loose = asof_join(left, right, "k", "ts", ["v"]).collect()[0]
    tight = asof_join(left, right, "k", "ts", ["v"], tolerance_seconds=60).collect()[0]
    assert loose.v_asof == 1.0
    assert tight.v_asof is None
