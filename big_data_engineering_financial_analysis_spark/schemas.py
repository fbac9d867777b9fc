"""Fixed schemas of the data plane.

The reference declares its stream-input schema by hand
(services/stream-processing/app/consumer.py:235-243: 7 fields, symbol string,
naive local timestamp, OHLCV doubles) and its at-rest schema as QuestDB DDL
(db/init_questdb.sql:1-21: the 7 candle columns + 9 indicator doubles +
signal string).  Nothing is inferred at runtime; we keep that discipline —
every source is read with an explicit schema so malformed input surfaces as
NULL columns, never as a silently inferred wrong type.
"""

from __future__ import annotations

from pyspark.sql import types as T

SYMBOLS = ["BTCIRT", "USDTIRT", "ETHIRT", "ETCIRT", "SHIBIRT"]

#: Raw candle message — reference consumer.py:235-243 / ingest.py:89-97.
CANDLE_SCHEMA = T.StructType(
    [
        T.StructField("stock_symbol", T.StringType(), True),
        T.StructField("local_time", T.TimestampType(), True),
        T.StructField("open", T.DoubleType(), True),
        T.StructField("high", T.DoubleType(), True),
        T.StructField("low", T.DoubleType(), True),
        T.StructField("close", T.DoubleType(), True),
        T.StructField("volume", T.DoubleType(), True),
    ]
)

#: Indicator columns appended by the enrichment pipeline, in reference
#: emission order (db/init_questdb.sql:10-18 + signal at :3).
INDICATOR_COLUMNS = [
    "sma_5",
    "ema_10",
    "delta",
    "gain",
    "loss",
    "avg_gain_10",
    "avg_loss_10",
    "rs",
    "rsi_10",
]

#: Enriched row — candle + indicators + signal (17 columns total), the
#: shape of the reference's output Kafka topic and QuestDB table.
ENRICHED_SCHEMA = T.StructType(
    list(CANDLE_SCHEMA.fields)
    + [T.StructField(c, T.DoubleType(), True) for c in INDICATOR_COLUMNS]
    + [T.StructField("signal", T.StringType(), True)]
)

#: The 17-column whitelist the reference's REST API validates against
#: (services/aggregator_django/aggregator/serializers.py:3-7).
API_FIELD_WHITELIST = [f.name for f in ENRICHED_SCHEMA.fields]

# --- driver test tables (/root/testdata/sf*/, see TESTDATA.md) -----------

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

EMBEDDINGS_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), True),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("label", T.IntegerType(), True),
    ]
)

#: Multimodal asset row — opaque binary payload + typed metadata.  The
#: reference has no binary columns; this is the engine's extension surface
#: for image/audio/video training data (see operators/multimodal.py).
ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("media_type", T.StringType(), True),  # MIME
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)
