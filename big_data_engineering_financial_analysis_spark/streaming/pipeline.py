"""Structured Streaming pipeline builders.

Re-expresses the reference's streaming job (SURVEY §3.1) without the
driver-side pandas bottleneck:

    reference                               this engine
    ---------------------------------       --------------------------------
    foreachBatch -> toPandas() on the       applyInPandasWithState keyed by
    driver, Arrow disabled, full-history    symbol: Arrow-batched, executor-
    recompute per batch (consumer.py:       side, O(batch) work, O(1) state
    160-223)                                per key, checkpointable
    in-memory ``already_sent`` set          withWatermark + dropDuplicates
    (consumer.py:28,199-205), lost on       (state-store backed, survives
    restart                                 restart)
    fresh KafkaProducer per batch           native Kafka sink / parquet sink

The indicator math lives in streaming/state.py and is bit-identical to the
batch kernel for in-order input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from big_data_engineering_financial_analysis_spark.streaming.state import (
    STATE_DDL,
    SymbolState,
    process_group,
)


def enrich_stream(
    candles: DataFrame,
    symbol_col: str = "stock_symbol",
    time_col: str = "local_time",
    close_col: str = "close",
) -> DataFrame:
    """Stateful incremental enrichment of a candle stream.

    Input: a streaming DataFrame with at least (symbol, time, close).
    Output: input columns + the 10 indicator/signal columns, in append
    mode; late/duplicate rows per key are dropped (first-writer-wins, the
    reference's observable semantics).

    Scale: state is ~25 doubles per symbol; parallelism is the number of
    symbols; each micro-batch does O(rows) work.  Contrast with the
    reference's O(history) per batch.
    """
    from big_data_engineering_financial_analysis_spark.streaming.state import enriched_ddl_suffix

    in_fields = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in candles.schema.fields)
    out_schema = f"{in_fields}, {enriched_ddl_suffix()}"

    def update(key, pdfs, group_state):
        import pandas as pd

        if group_state.exists:
            st = SymbolState.from_tuple(group_state.get)
        else:
            st = SymbolState()
        # CONCATENATE the Arrow chunks before the event-time sort: a key
        # whose micro-batch exceeds arrow.maxRecordsPerBatch arrives as
        # several chunks in arbitrary order, and sorting each alone would
        # advance the dedup watermark past later-chunk rows (silently
        # dropped as "late") and feed the EMA/RSI recursion out of order
        # — the same hazard streaming/packing.pack_stream documents.
        chunks = [p for p in pdfs if len(p)]
        if not chunks:
            group_state.update(st.to_tuple())
            return
        out = process_group(
            st, pd.concat(chunks, ignore_index=True), time_col, close_col
        )
        group_state.update(st.to_tuple())
        # a batch can be entirely late/duplicate rows -> nothing to emit
        if len(out):
            yield out

    return candles.groupBy(symbol_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=STATE_DDL,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def dedup_stream(
    df: DataFrame,
    keys: list[str] = ("stock_symbol", "local_time"),
    time_col: str = "local_time",
    watermark: str = "10 minutes",
) -> DataFrame:
    """First-writer-wins streaming dedup (reference J1/T5) — state-store
    backed and restart-safe, with an explicit watermark bound instead of
    the reference's unbounded in-memory key set.

    ``dropDuplicates`` only EVICTS state when the event-time column is
    part of the dedup keys — with pure-id keys the watermark is silently
    ignored and state grows forever (the exact failure mode this
    operator exists to fix).  Keys without ``time_col`` therefore route
    to ``dropDuplicatesWithinWatermark``: same first-writer-wins output
    for events arriving inside the watermark horizon, state bounded by
    it."""
    wm = df.withWatermark(time_col, watermark)
    if time_col in keys:
        return wm.dropDuplicates(list(keys))
    return wm.dropDuplicatesWithinWatermark(list(keys))


def windowed_stats_stream(
    candles: DataFrame,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    time_col: str = "local_time",
    symbol_col: str = "stock_symbol",
) -> DataFrame:
    """Event-time tumbling aggregation with late-data bound (T4).

    The watermark lets the state store evict closed windows — without it a
    streaming aggregation retains every window forever (the same unbounded
    -state failure mode as the reference's global_data, just in the store).
    """
    return (
        candles.withWatermark(time_col, watermark)
        .groupBy(F.window(time_col, window), symbol_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("close").alias("avg_close"),
            F.max("close").alias("max_close"),
            F.min("close").alias("min_close"),
        )
        .select(
            F.col("window.start").alias("bucket_start"),
            symbol_col,
            "n",
            "avg_close",
            "max_close",
            "min_close",
        )
    )


def ohlc_stream(
    ticks: DataFrame,
    bar: str = "1 minute",
    watermark: str = "10 minutes",
    time_col: str = "local_time",
    symbol_col: str = "stock_symbol",
    close_col: str = "close",
) -> DataFrame:
    """Streaming tick -> OHLC candle resampling (the streaming twin of
    ``functions.indicators_ext.ohlc_bars``).

    open/close use ``min_by``/``max_by`` on the event timestamp — ordinary
    aggregates, so they run incrementally in the streaming state store (no
    per-window buffering of ticks).  Within-timestamp ties resolve
    arbitrarily here (the state store sees arrival order); the batch twin's
    (time, id) row_number is the deterministic formulation — use it
    wherever replay determinism matters more than latency.
    """
    return (
        ticks.withWatermark(time_col, watermark)
        .groupBy(F.window(time_col, bar), symbol_col)
        .agg(
            F.min_by(close_col, time_col).alias("open"),
            F.max(close_col).alias("high"),
            F.min(close_col).alias("low"),
            F.max_by(close_col, time_col).alias("close"),
            F.count(F.lit(1)).alias("n_ticks"),
        )
        .select(
            F.col("window.start").alias("bucket"), symbol_col,
            "open", "high", "low", "close", "n_ticks",
        )
    )


def session_stats_stream(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    time_col: str = "local_time",
    key_col: str = "stock_symbol",
) -> DataFrame:
    """Session-window aggregation (gap-based), the streaming twin of the
    batch ``analytics_ext.sessionize`` lag+cumsum formulation."""
    return (
        events.withWatermark(time_col, watermark)
        .groupBy(F.session_window(time_col, gap), key_col)
        .agg(F.count(F.lit(1)).alias("n_events"), F.avg("close").alias("avg_close"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            key_col,
            "n_events",
            "avg_close",
        )
    )


def write_parquet_sink(df: DataFrame, path: str, checkpoint: str, time_col: str = "local_time"):
    """Partitioned parquet append sink — the engine-native replacement for
    the reference's row-at-a-time QuestDB inserts (K3/K4), keeping the
    daily-partition pruning of ``PARTITION BY DAY``."""
    return (
        df.withColumn("dt", F.to_date(F.col(time_col)))
        .writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .partitionBy("dt")
        .outputMode("append")
    )


def enrich_stream_tws(
    candles: DataFrame,
    symbol_col: str = "stock_symbol",
    time_col: str = "local_time",
    close_col: str = "close",
) -> DataFrame:
    """`transformWithStateInPandas` variant of :func:`enrich_stream`.

    Same per-key indicator state machine (streaming/state.py) on Spark 4's
    arbitrary-state API: state lives in a typed ValueState instead of the
    applyInPandasWithState tuple, which buys per-state-variable TTLs,
    multiple state variables per key, and timers when the pipeline needs
    them.  Output is identical row-for-row for in-order input (asserted in
    tests against both the applyInPandasWithState path and the batch
    kernel).

    Environment note: the TWS state-server protocol needs
    ``google.protobuf`` and the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass``); the parity test is
    skipped where protobuf is absent (this build container).
    ``enrich_stream`` (applyInPandasWithState) is the default path and has
    no such dependency.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import StructType

    from big_data_engineering_financial_analysis_spark.streaming.state import enriched_ddl_suffix

    in_fields = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in candles.schema.fields)
    out_schema = f"{in_fields}, {enriched_ddl_suffix()}"
    state_schema = StructType.fromDDL(STATE_DDL)

    class EnrichProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("indicators", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            if self._state.exists():
                st = SymbolState.from_tuple(self._state.get())
            else:
                st = SymbolState()
            # concat-before-sort, same multi-chunk hazard as enrich_stream
            chunks = [p for p in rows if len(p)]
            if not chunks:
                self._state.update(st.to_tuple())
                return
            out = process_group(
                st, pd.concat(chunks, ignore_index=True), time_col, close_col
            )
            self._state.update(st.to_tuple())
            if len(out):
                yield out

        def close(self) -> None:
            pass

    return candles.groupBy(symbol_col).transformWithStateInPandas(
        statefulProcessor=EnrichProcessor(),
        outputStructType=out_schema,
        outputMode="append",
        timeMode="None",
    )
