"""Incremental MACD: bit-identical to the batch HOF fold, in batch
(applyInPandas) and across streaming micro-batches (applyInPandasWithState
with checkpointed state)."""

from __future__ import annotations

import math

import pandas as pd

from big_data_engineering_financial_analysis_spark.functions.indicators_ext import with_macd
from big_data_engineering_financial_analysis_spark.schemas import CANDLE_SCHEMA
from big_data_engineering_financial_analysis_spark.sources import feeder
from big_data_engineering_financial_analysis_spark.streaming.state_macd import (
    MacdState,
    macd_stream,
    process_group,
)

KEY = ["stock_symbol", "local_time"]
MCOLS = ["ema_12", "ema_26", "macd", "macd_signal", "macd_hist"]


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    out = pdf.sort_values(KEY).reset_index(drop=True)
    return out[KEY + MCOLS]


def _assert_bit_identical(a: pd.DataFrame, b: pd.DataFrame) -> None:
    a, b = _canon(a), _canon(b)
    assert len(a) == len(b)
    for c in MCOLS:
        for x, y in zip(a[c], b[c]):
            xn = x is None or (isinstance(x, float) and math.isnan(x))
            yn = y is None or (isinstance(y, float) and math.isnan(y))
            if xn or yn:
                assert xn and yn, (c, x, y)
            else:
                assert x == y, (c, x, y)  # EXACT: same FP op order


def test_incremental_macd_bit_identical_to_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    full = feeder.feed_parquet_batches(spark, src, n_batches=3, minutes_per_batch=15)

    batch = with_macd(full, id_col="local_time").toPandas()

    def run(pdf):
        return process_group(MacdState(), pdf)

    fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in full.schema.fields
    )
    inc = (
        full.groupBy("stock_symbol")
        .applyInPandas(run, schema=fields + ", " + ", ".join(f"{c} double" for c in MCOLS))
        .toPandas()
    )
    _assert_bit_identical(batch, inc)


def test_streaming_macd_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    full = feeder.feed_parquet_batches(spark, src, n_batches=3, minutes_per_batch=15)

    stream = (
        spark.readStream.schema(CANDLE_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        macd_stream(stream)
        .writeStream.format("memory")
        .queryName("macd_out")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    streamed = spark.sql("SELECT * FROM macd_out").toPandas()

    batch = with_macd(full, id_col="local_time").toPandas()
    _assert_bit_identical(batch, streamed)
