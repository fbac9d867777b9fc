"""Regression tests for the round-7 review findings: NULL-keyed unique
checks, NULL-volume oracle parity, compaction crash recovery, rollup
version pruning, and pandas-path MACD tie determinism."""

from __future__ import annotations

import os

import pandas as pd


def test_check_unique_ignores_null_keys(spark):
    from big_data_engineering_financial_analysis_spark.operators.validation import check_unique

    df = spark.createDataFrame(
        [(1,), (None,), (None,), (2,), (2,)], "id int"
    )
    r = check_unique(df, ["id"]).first()
    # two NULL-keyed rows are NOT duplicates; the real duplicate pair is 2
    assert r["n_violations"] == 1
    assert r["n_checked"] == 3


def test_vwap_oracle_survives_null_volume(spark, tmp_path):
    """A props row without 'k' must not NULL-poison the oracle's
    cumulative fold (Spark's sum skips NULLs; the FILTER mirrors it)."""
    import duckdb

    from big_data_engineering_financial_analysis_spark.plans.registry import ORACLES, QUERIES

    import datetime as dt

    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 0), 5, "view", 10.0, '{"k": 3}'),
        (2, dt.datetime(2024, 1, 1, 0, 1), 5, "view", 12.0, "{}"),
        (3, dt.datetime(2024, 1, 1, 0, 2), 5, "view", 14.0, '{"k": 1}'),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    sf = str(tmp_path / "sf_null_k")
    ev.write.parquet(os.path.join(sf, "events.parquet"))

    got = (
        QUERIES["vwap_obv"](spark, sf)
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet/*.parquet'"
    )
    exp = (
        con.execute(ORACLES["vwap_obv"])
        .fetchdf()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert list(got["vwap"]) == list(exp["vwap"])
    # and the value itself: the NULL bar leaves the running VWAP unchanged
    assert got["vwap"].iloc[1] == got["vwap"].iloc[0]
    assert not pd.isna(got["vwap"].iloc[2])


def test_compaction_crash_recovery(spark, tmp_path):
    from big_data_engineering_financial_analysis_spark.sources.dataset import (
        compact_dataset,
        read_dataset,
        recover_compaction,
        write_sharded,
    )
    from big_data_engineering_financial_analysis_spark.sources.parquet import load_table

    from tests.conftest import SF_SMALL

    docs = load_table(spark, SF_SMALL, "documents")
    path = str(tmp_path / "ds")
    write_sharded(docs, path, ["lang"], ["doc_id"])
    n = read_dataset(spark, path).count()

    # crash between the two renames: only the aside copy exists
    os.rename(path, path + "._pre_compact")
    recover_compaction(path)
    assert read_dataset(spark, path).count() == n

    # crash after the swap: stale aside copy beside a live dataset
    os.makedirs(path + "._pre_compact")
    compact_dataset(spark, path, ["lang"], ["doc_id"])  # heals, then compacts
    assert not os.path.exists(path + "._pre_compact")
    assert read_dataset(spark, path).count() == n


def test_rollup_prunes_old_versions(spark, tmp_path):
    from big_data_engineering_financial_analysis_spark.streaming.rollup import RollupSink

    sink = RollupSink(spark, str(tmp_path / "r"), keys=["k"], value_col="v")
    batch = spark.createDataFrame([("a", 1.0)], "k string, v double")
    for epoch in range(4):
        sink(batch, epoch_id=epoch)
    versions = sorted(
        d for d in os.listdir(str(tmp_path / "r")) if d.startswith("v")
    )
    # only the live version and its predecessor survive
    assert versions == ["v2", "v3"]
    assert sink.current().first()["n"] == 4


def test_macd_auto_deterministic_under_ties(spark):
    import datetime as dt

    from pyspark.sql import functions as F

    from big_data_engineering_financial_analysis_spark.functions.indicators_ext import (
        macd_auto,
        with_macd,
    )

    t0 = dt.datetime(2024, 1, 1)
    # 1100 rows (> fold_limit -> pandas path) with a timestamp TIE pair
    rows = [
        {
            "event_id": i,
            "stock_symbol": "A",
            "local_time": t0 + dt.timedelta(minutes=min(i, 500)),  # ties at 500+
            "close": 100.0 + (i % 37),
        }
        for i in range(1100)
    ]
    df = spark.createDataFrame(rows)
    fold = with_macd(df).toPandas().sort_values("event_id").reset_index(drop=True)
    auto = macd_auto(df).toPandas().sort_values("event_id").reset_index(drop=True)
    import numpy as np

    for c in ("macd", "macd_signal"):
        fa, aa = fold[c].to_numpy(), auto[c].to_numpy()
        assert ((fa == aa) | (np.isnan(fa) & np.isnan(aa))).all(), c
