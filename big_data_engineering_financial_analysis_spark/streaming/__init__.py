"""Structured Streaming pipeline: incremental keyed-state indicators,
watermarked dedup, Kafka candle sources/sinks."""
