"""Incremental ADX/DMI: bit-identical to the batch fold, in batch
(applyInPandas) and across streaming micro-batches with checkpointed
state."""

from __future__ import annotations

import datetime as dt
import math

import pandas as pd

from big_data_engineering_financial_analysis_spark.functions.indicators_ta import (
    with_adx_dmi,
)
from big_data_engineering_financial_analysis_spark.streaming.state_adx import (
    AdxState,
    OUT_COLS,
    adx_stream,
    process_group,
)

T0 = dt.datetime(2024, 1, 1)
KEY = ["stock_symbol", "bucket"]
BAR_SCHEMA = "stock_symbol string, bucket timestamp, high double, low double, close double"


def _bars(n_days=40, symbols=("A", "B")):
    rows = []
    for s_i, sym in enumerate(symbols):
        px = 100.0 + 7 * s_i
        for d in range(n_days):
            close = px * (1 + 0.01 * math.sin(d + s_i))
            high = close * 1.02 + (d % 3)
            low = close * 0.985 - (d % 2)
            rows.append(
                {
                    "stock_symbol": sym,
                    "bucket": T0 + dt.timedelta(days=d),
                    "high": round(high, 4),
                    "low": round(low, 4),
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
            xn = x is None or (isinstance(x, float) and math.isnan(x))
            yn = y is None or (isinstance(y, float) and math.isnan(y))
            if xn or yn:
                assert xn and yn, (c, x, y)
            else:
                assert x == y, (c, x, y)  # EXACT: same FP op order


def test_incremental_adx_bit_identical_to_batch(spark):
    df = spark.createDataFrame(_bars(), BAR_SCHEMA)
    batch = with_adx_dmi(df).toPandas()

    def run(pdf):
        return process_group(AdxState(), pdf)

    fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    )
    inc = (
        df.groupBy("stock_symbol")
        .applyInPandas(
            run, schema=fields + ", " + ", ".join(f"{c} double" for c in OUT_COLS)
        )
        .toPandas()
    )
    _assert_bit_identical(batch, inc)


def test_incremental_adx_flat_stretch_parity(spark):
    """A flat stretch drives both DIs to 0 -> NULL dx mid-series; the
    incremental ADX must skip it exactly like the batch fold."""
    rows = _bars(n_days=20, symbols=("A",))
    for d in range(20, 30):
        rows.append(
            {
                "stock_symbol": "A",
                "bucket": T0 + dt.timedelta(days=d),
                "high": 100.0,
                "low": 100.0,
                "close": 100.0,
            }
        )
    for r in _bars(n_days=12, symbols=("A",)):
        r["bucket"] = r["bucket"] + dt.timedelta(days=30)
        rows.append(r)
    df = spark.createDataFrame(rows, BAR_SCHEMA)
    batch = with_adx_dmi(df).toPandas()
    inc = process_group(AdxState(), df.toPandas())
    _assert_bit_identical(batch, inc)


def test_streaming_adx_matches_batch(spark, tmp_path):
    rows = _bars()
    src = str(tmp_path / "src")
    for lo, hi in [(0, 14), (14, 28), (28, 40)]:
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
        adx_stream(stream)
        .writeStream.format("memory")
        .queryName("adx_out")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    streamed = spark.sql("SELECT * FROM adx_out").toPandas()

    batch = with_adx_dmi(spark.createDataFrame(rows, BAR_SCHEMA)).toPandas()
    _assert_bit_identical(batch, streamed)


def test_late_duplicate_bar_is_dropped(spark):
    st = AdxState()
    r1 = process_group(
        st,
        pd.DataFrame(
            [
                {"stock_symbol": "A", "bucket": pd.Timestamp(T0), "high": 11.0, "low": 9.0, "close": 10.0},
                {"stock_symbol": "A", "bucket": pd.Timestamp(T0 + dt.timedelta(days=1)), "high": 12.0, "low": 10.0, "close": 11.0},
            ]
        ),
    )
    assert len(r1) == 2
    atr_after, splus_after = st.atr, st.s_plus
    r2 = process_group(
        st,
        pd.DataFrame(
            [{"stock_symbol": "A", "bucket": pd.Timestamp(T0), "high": 99.0, "low": 1.0, "close": 50.0}]
        ),
    )
    assert len(r2) == 0
    assert st.atr == atr_after and st.s_plus == splus_after
