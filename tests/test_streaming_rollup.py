"""Streaming rollup maintenance: merged partials over micro-batches equal
a direct batch aggregation of the full input; redelivered batches are
idempotent."""

from __future__ import annotations

import pandas as pd

from big_data_engineering_financial_analysis_spark.operators.incremental import (
    finalize,
    to_partials,
)
from big_data_engineering_financial_analysis_spark.schemas import CANDLE_SCHEMA
from big_data_engineering_financial_analysis_spark.sources import feeder
from big_data_engineering_financial_analysis_spark.streaming.rollup import (
    RollupSink,
    maintain_rollup,
)


def test_streaming_rollup_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    full = feeder.feed_parquet_batches(spark, src, n_batches=3, minutes_per_batch=20)

    sink = RollupSink(
        spark, str(tmp_path / "rollup"), keys=["stock_symbol"], value_col="close"
    )
    stream = (
        spark.readStream.schema(CANDLE_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = maintain_rollup(stream, sink, str(tmp_path / "ck"))
    q.processAllAvailable()
    q.stop()

    got = (
        finalize(sink.current())
        .toPandas()
        .sort_values("stock_symbol")
        .reset_index(drop=True)
    )
    exp = (
        finalize(to_partials(full, ["stock_symbol"], "close"))
        .toPandas()
        .sort_values("stock_symbol")
        .reset_index(drop=True)
    )
    assert list(got["stock_symbol"]) == list(exp["stock_symbol"])
    for c in ("n", "min_v", "max_v"):
        assert (got[c] == exp[c]).all(), c
    assert (abs(got["sum_v"] - exp["sum_v"]) < 1e-9).all()
    assert (abs(got["avg_v"] - exp["avg_v"]) < 1e-12).all()


def test_redelivered_batch_is_skipped(spark, tmp_path):
    src = str(tmp_path / "src2")
    feeder.feed_parquet_batches(spark, src, n_batches=2, minutes_per_batch=10)
    sink = RollupSink(
        spark, str(tmp_path / "rollup2"), keys=["stock_symbol"], value_col="close"
    )
    batch = spark.read.parquet(src)
    sink(batch, epoch_id=0)
    before = finalize(sink.current()).toPandas().sort_values("stock_symbol")
    # redelivery of the SAME epoch must be a no-op (exactly-once discipline)
    sink(batch, epoch_id=0)
    after = finalize(sink.current()).toPandas().sort_values("stock_symbol")
    pd.testing.assert_frame_equal(
        before.reset_index(drop=True), after.reset_index(drop=True)
    )
    # a NEW epoch does merge
    sink(batch, epoch_id=1)
    doubled = finalize(sink.current()).toPandas().sort_values("stock_symbol")
    assert (doubled["n"].to_numpy() == 2 * before["n"].to_numpy()).all()
