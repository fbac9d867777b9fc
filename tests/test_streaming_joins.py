"""Stream-stream interval join: batch parity and outer-join watermark
semantics, via the file-source replay harness."""

from __future__ import annotations

import datetime as dt

import pandas as pd

from big_data_engineering_financial_analysis_spark.streaming.joins import interval_join_streams

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)

TRADE_SCHEMA = "stock_symbol string, local_time timestamp, close double"
QUOTE_SCHEMA = "stock_symbol string, quote_time timestamp, bid double"


def _write_batches(spark, path, schema, batches):
    """One parquet file per batch so maxFilesPerTrigger=1 replays them as
    separate micro-batches."""
    for rows in batches:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(path)


def _trades():
    # batch 1: two trades for A, one for B; batch 2: later trades
    return [
        [("A", T0 + dt.timedelta(minutes=3), 10.0),
         ("A", T0 + dt.timedelta(minutes=8), 11.0),
         ("B", T0 + dt.timedelta(minutes=4), 20.0)],
        [("A", T0 + dt.timedelta(minutes=14), 12.0),
         ("C", T0 + dt.timedelta(minutes=15), 30.0)],
    ]


def _quotes():
    # quotes land in / out of each trade's 5-minute lookback
    return [
        [("A", T0 + dt.timedelta(minutes=1), 9.9),    # in for trade@3 only
         ("A", T0 + dt.timedelta(minutes=7), 10.8),   # in for trade@8
         ("B", T0 + dt.timedelta(minutes=4), 19.9)],  # boundary: == trade time
        [("A", T0 + dt.timedelta(minutes=13), 11.9),  # in for trade@14
         ("B", T0 + dt.timedelta(minutes=30), 21.0)], # matches nothing
    ]


def _stream(spark, path, schema):
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def _run(joined, name, ckpt):
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()


def test_inner_interval_join_matches_batch(spark, tmp_path):
    tdir, qdir = str(tmp_path / "t"), str(tmp_path / "q")
    _write_batches(spark, tdir, TRADE_SCHEMA, _trades())
    _write_batches(spark, qdir, QUOTE_SCHEMA, _quotes())

    joined = interval_join_streams(
        _stream(spark, tdir, TRADE_SCHEMA), _stream(spark, qdir, QUOTE_SCHEMA)
    )
    _run(joined, "ssj_inner", str(tmp_path / "ck1"))
    got = spark.sql("SELECT * FROM ssj_inner").toPandas()

    batch = interval_join_streams(
        spark.read.parquet(tdir), spark.read.parquet(qdir)
    ).toPandas()

    key = ["stock_symbol", "local_time", "quote_time"]
    got_s = got.sort_values(key).reset_index(drop=True)
    exp_s = batch.sort_values(key).reset_index(drop=True)
    assert len(got_s) == len(exp_s)
    pd.testing.assert_frame_equal(
        got_s[key + ["close", "bid"]], exp_s[key + ["close", "bid"]]
    )
    # semantics spot-checks: trade A@3 sees quote@1 but NOT quote@7;
    # boundary quote (== trade time) matches; C has no quotes
    a3 = exp_s[(exp_s.stock_symbol == "A") & (exp_s.close == 10.0)]
    assert list(a3["bid"]) == [9.9]
    b = exp_s[exp_s.stock_symbol == "B"]
    assert list(b["bid"]) == [19.9]
    assert (exp_s.stock_symbol != "C").all()


def test_left_outer_emits_nulls_after_watermark_flush(spark, tmp_path):
    tdir, qdir = str(tmp_path / "t"), str(tmp_path / "q")
    # add a far-future flush batch on BOTH sides so the watermark advances
    # past every real row and null-extensions for unmatched trades emit
    far = T0 + dt.timedelta(hours=6)
    _write_batches(
        spark, tdir, TRADE_SCHEMA, _trades() + [[("Z", far, 0.0)]]
    )
    _write_batches(
        spark, qdir, QUOTE_SCHEMA, _quotes() + [[("Z", far, 0.0)]]
    )

    joined = interval_join_streams(
        _stream(spark, tdir, TRADE_SCHEMA),
        _stream(spark, qdir, QUOTE_SCHEMA),
        how="leftOuter",
    )
    _run(joined, "ssj_outer", str(tmp_path / "ck2"))
    got = spark.sql(
        "SELECT * FROM ssj_outer WHERE stock_symbol <> 'Z'"
    ).toPandas()

    # trade C@15 has no quotes: must appear exactly once with NULL bid
    c = got[got.stock_symbol == "C"]
    assert len(c) == 1
    assert c["bid"].isna().all() and c["quote_time"].isna().all()
    # matched trades carry their quotes exactly as in the inner join
    matched = got[got["bid"].notna()]
    batch_inner = interval_join_streams(
        spark.read.parquet(tdir), spark.read.parquet(qdir)
    ).toPandas()
    batch_inner = batch_inner[batch_inner.stock_symbol != "Z"]
    assert len(matched) == len(batch_inner)
