"""Incremental Heikin-Ashi: bit-identical to the batch fold, in batch
(applyInPandas) and across streaming micro-batches with checkpointed
state."""

from __future__ import annotations

import datetime as dt
import math

import pandas as pd

from big_data_engineering_financial_analysis_spark.functions.indicators_ta import (
    with_heikin_ashi,
)
from big_data_engineering_financial_analysis_spark.streaming.state_ha import (
    HaState,
    OUT_COLS,
    ha_stream,
    process_group,
)

T0 = dt.datetime(2024, 1, 1)
KEY = ["stock_symbol", "bucket"]
BAR_SCHEMA = (
    "stock_symbol string, bucket timestamp, open double, high double, "
    "low double, close double"
)


def _bars(n_days=30, symbols=("A", "B")):
    rows = []
    for s_i, sym in enumerate(symbols):
        px = 100.0 + 7 * s_i
        for d in range(n_days):
            close = px * (1 + 0.01 * math.sin(d + s_i))
            rows.append(
                {
                    "stock_symbol": sym,
                    "bucket": T0 + dt.timedelta(days=d),
                    "open": round(px, 4),
                    "high": round(max(px, close) * 1.01, 4),
                    "low": round(min(px, close) * 0.99, 4),
                    "close": round(close, 4),
                }
            )
            px = close
    return rows


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    return pdf.sort_values(KEY).reset_index(drop=True)[KEY + OUT_COLS]


def _assert_bit_identical(a: pd.DataFrame, b: pd.DataFrame) -> None:
    a, b = _canon(a), _canon(b)
    assert len(a) == len(b) > 0
    for c in OUT_COLS:
        for x, y in zip(a[c], b[c]):
            assert x == y, (c, x, y)  # EXACT: same FP op order, no NULLs


def test_incremental_ha_bit_identical_to_batch(spark):
    df = spark.createDataFrame(_bars(), BAR_SCHEMA)
    batch = with_heikin_ashi(df).toPandas()

    fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    )
    inc = (
        df.groupBy("stock_symbol")
        .applyInPandas(
            lambda pdf: process_group(HaState(), pdf),
            schema=fields + ", " + ", ".join(f"{c} double" for c in OUT_COLS),
        )
        .toPandas()
    )
    _assert_bit_identical(batch, inc)


def test_streaming_ha_matches_batch(spark, tmp_path):
    rows = _bars()
    src = str(tmp_path / "src")
    for lo, hi in [(0, 10), (10, 20), (20, 30)]:
        chunk = [
            r
            for r in rows
            if T0 + dt.timedelta(days=lo) <= r["bucket"] < T0 + dt.timedelta(days=hi)
        ]
        spark.createDataFrame(chunk, BAR_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    stream = (
        spark.readStream.schema(BAR_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        ha_stream(stream)
        .writeStream.format("memory")
        .queryName("ha_out")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    streamed = spark.sql("SELECT * FROM ha_out").toPandas()

    batch = with_heikin_ashi(spark.createDataFrame(rows, BAR_SCHEMA)).toPandas()
    _assert_bit_identical(batch, streamed)


def test_late_duplicate_bar_is_dropped(spark):
    st = HaState()
    r1 = process_group(
        st,
        pd.DataFrame(
            [
                {"stock_symbol": "A", "bucket": pd.Timestamp(T0), "open": 10.0, "high": 11.0, "low": 9.0, "close": 10.5},
                {"stock_symbol": "A", "bucket": pd.Timestamp(T0 + dt.timedelta(days=1)), "open": 10.5, "high": 12.0, "low": 10.0, "close": 11.0},
            ]
        ),
    )
    assert len(r1) == 2
    open_after = st.ha_open_prev
    r2 = process_group(
        st,
        pd.DataFrame(
            [{"stock_symbol": "A", "bucket": pd.Timestamp(T0), "open": 99.0, "high": 99.0, "low": 1.0, "close": 50.0}]
        ),
    )
    assert len(r2) == 0
    assert st.ha_open_prev == open_after
