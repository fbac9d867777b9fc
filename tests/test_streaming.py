"""Streaming semantics tests (SURVEY §5.2 item 3).

(a) incremental keyed-state enrichment == batch window kernel on the union
    of in-order micro-batches (bit-level for doubles);
(b) first-writer-wins dedup across batches (reference consumer.py:199-205);
(c) restart from checkpoint does not re-emit;
(d) Kafka JSON wire expressions round-trip the candle and enriched schemas.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from big_data_engineering_financial_analysis_spark.functions.indicators import enrich
from big_data_engineering_financial_analysis_spark.schemas import CANDLE_SCHEMA
from big_data_engineering_financial_analysis_spark.sources import feeder, kafka as kafka_mod
from big_data_engineering_financial_analysis_spark.streaming.pipeline import dedup_stream, enrich_stream

NUM_COLS = ["sma_5", "ema_10", "delta", "gain", "loss", "avg_gain_10", "avg_loss_10", "rs", "rsi_10"]


def _run_stream_over_files(spark, src_dir, transform, out_name, checkpoint):
    stream = (
        spark.readStream.schema(CANDLE_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = (
        transform(stream)
        .writeStream.format("memory")
        .queryName(out_name)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {out_name}")


def test_incremental_enrich_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    full = feeder.feed_parquet_batches(spark, src, n_batches=3, minutes_per_batch=15)

    streamed = _run_stream_over_files(
        spark, src, enrich_stream, "enrich_out", str(tmp_path / "ckpt")
    ).toPandas()
    expected = enrich(full).toPandas()

    assert len(streamed) == len(expected)
    s = streamed.sort_values(["stock_symbol", "local_time"]).reset_index(drop=True)
    e = expected.sort_values(["stock_symbol", "local_time"]).reset_index(drop=True)
    for c in NUM_COLS:
        np.testing.assert_array_equal(  # bit-identical, not just close
            s[c].to_numpy(dtype=float), e[c].to_numpy(dtype=float), err_msg=c
        )
    assert (s["signal"] == e["signal"]).all()


def test_streaming_dedup_first_writer_wins(spark, tmp_path):
    src = str(tmp_path / "dsrc")
    # batch 0 and batch 1 overlap in (symbol, time): replay the same window
    rows0 = feeder.candle_rows(symbols=["BTCIRT"], minutes=10)
    rows1 = feeder.candle_rows(symbols=["BTCIRT"], minutes=10)  # identical keys
    df0 = spark.createDataFrame(rows0, CANDLE_SCHEMA)
    df1 = spark.createDataFrame(rows1, CANDLE_SCHEMA)
    df0.coalesce(1).write.mode("append").parquet(src)
    df1.coalesce(1).write.mode("append").parquet(src)

    out = _run_stream_over_files(
        spark, src, dedup_stream, "dedup_out", str(tmp_path / "dckpt")
    ).toPandas()
    assert len(out) == 10  # duplicates across micro-batches suppressed


def test_restart_from_checkpoint_no_reemit(spark, tmp_path):
    # memory sink cannot recover from a checkpoint; use the real parquet
    # sink (the engine's at-rest store) for the restart semantics
    from big_data_engineering_financial_analysis_spark.streaming.pipeline import write_parquet_sink

    src = str(tmp_path / "rsrc")
    ckpt = str(tmp_path / "rckpt")
    out = str(tmp_path / "rout")
    feeder.feed_parquet_batches(spark, src, n_batches=2, minutes_per_batch=10)

    def run_once():
        stream = (
            spark.readStream.schema(CANDLE_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = write_parquet_sink(enrich_stream(stream), out, ckpt).start()
        q.processAllAvailable()
        q.stop()
        return spark.read.parquet(out).count()

    first = run_once()
    assert first > 0
    # restart over the same checkpoint: no new source files -> no re-emission
    assert run_once() == first


def test_kafka_json_roundtrip(spark):
    df = feeder.candles_df(spark, minutes=5)
    wire = kafka_mod.candle_to_json(df)
    assert set(wire.columns) == {"key", "value", "topic"}
    topics = {r.topic for r in wire.select("topic").distinct().collect()}
    assert topics == {f"{s.lower()}_topic" for s in feeder.SYMBOLS}

    back = kafka_mod.parse_candle_json(wire).toPandas()
    orig = df.toPandas()
    back = back.sort_values(["stock_symbol", "local_time"]).reset_index(drop=True)
    orig = orig.sort_values(["stock_symbol", "local_time"]).reset_index(drop=True)
    assert (back["stock_symbol"] == orig["stock_symbol"]).all()
    assert (back["local_time"] == orig["local_time"]).all()  # second-granularity wire
    np.testing.assert_allclose(back["close"], orig["close"], rtol=1e-12)


def test_enriched_json_has_17_fields(spark):
    import json

    df = enrich(feeder.candles_df(spark, minutes=12))
    wire = kafka_mod.enriched_to_json(df)
    row = wire.limit(1).collect()[0]
    payload = json.loads(row.value)
    # NULL indicator fields are dropped by to_json; warm-up rows carry fewer
    assert {"stock_symbol", "local_time", "open", "close", "signal"} <= set(payload)


def _has_protobuf() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithStateInPandas needs google.protobuf (state-server "
    "protocol), not installed in this container",
)
def test_tws_enrich_matches_batch(spark, tmp_path):
    """transformWithStateInPandas variant: bit-identical to the batch
    kernel (and therefore to the applyInPandasWithState path) for in-order
    micro-batches."""
    from big_data_engineering_financial_analysis_spark.streaming.pipeline import enrich_stream_tws

    src = str(tmp_path / "tws_src")
    full = feeder.feed_parquet_batches(spark, src, n_batches=3, minutes_per_batch=15)

    # transformWithState requires the RocksDB state store provider
    prov_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(prov_key, None)
    spark.conf.set(
        prov_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        streamed = _run_stream_over_files(
            spark, src, enrich_stream_tws, "tws_out", str(tmp_path / "tws_ckpt")
        ).toPandas()
    finally:
        if prev is None:
            spark.conf.unset(prov_key)
        else:
            spark.conf.set(prov_key, prev)
    expected = enrich(full).toPandas()

    assert len(streamed) == len(expected)
    s = streamed.sort_values(["stock_symbol", "local_time"]).reset_index(drop=True)
    e = expected.sort_values(["stock_symbol", "local_time"]).reset_index(drop=True)
    for c in NUM_COLS:
        np.testing.assert_array_equal(
            s[c].to_numpy(dtype=float), e[c].to_numpy(dtype=float), err_msg=c
        )
    assert (s["signal"] == e["signal"]).all()


def test_enrich_stream_on_rocksdb_state_store(spark, tmp_path):
    """The keyed-state pipeline on the RocksDB state store provider —
    the larger-than-heap state backend a 100 TB stream needs (HDFS-backed
    in-memory maps OOM once key cardinality x state size outgrows the
    executor heap).  Same results as the default provider."""
    from big_data_engineering_financial_analysis_spark.schemas import CANDLE_SCHEMA
    from big_data_engineering_financial_analysis_spark.sources import feeder
    from big_data_engineering_financial_analysis_spark.streaming.pipeline import enrich_stream

    src = str(tmp_path / "src")
    full = feeder.feed_parquet_batches(spark, src, n_batches=2, minutes_per_batch=10)

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = (
            spark.readStream.schema(CANDLE_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            enrich_stream(stream)
            .writeStream.format("memory")
            .queryName("rocks_out")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .outputMode("append")
            .start()
        )
        q.processAllAvailable()
        q.stop()
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)

    got = spark.sql("SELECT count(*) c FROM rocks_out").first()["c"]
    assert got == full.dropDuplicates(["stock_symbol", "local_time"]).count()
    # spot-check an enriched value exists (state machine actually ran)
    sample = spark.sql(
        "SELECT * FROM rocks_out WHERE sma_5 IS NOT NULL LIMIT 1"
    ).collect()
    assert sample
