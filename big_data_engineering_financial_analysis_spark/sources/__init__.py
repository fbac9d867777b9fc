"""Source/sink builders and the at-rest storage layer.

Ingest/egress: parquet test tables (`parquet`), Kafka streams (`kafka`),
REST poller (`rest_poller`), JDBC (`jdbc`), ILP socket (`ilp`).

At-rest layout and serving: sharded writer + compaction + introspection
(`dataset`), bucketed co-located joins (`bucketed`), zone-map range
skipping (`zonemap`), Bloom-sidecar equality skipping (`bloomskip`),
snapshot isolation / time travel / increments (`snapshots`), and the
shared driver-local path contract (`localfs`).
"""

from big_data_engineering_financial_analysis_spark.sources.parquet import (  # noqa: F401
    load_table,
    load_tables,
    candles_from_events,
    TABLES,
)
