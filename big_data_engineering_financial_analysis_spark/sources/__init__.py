"""Source/sink builders: parquet test tables, Kafka streams, REST feeder."""

from big_data_engineering_financial_analysis_spark.sources.parquet import (  # noqa: F401
    load_table,
    load_tables,
    candles_from_events,
    TABLES,
)
