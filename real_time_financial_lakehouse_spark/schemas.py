"""Explicit schemas, mirroring the reference's explicit-schema discipline.

The reference declares its bronze trade schema as a StructType and parses
JSON against it rather than inferring (consumer_lake.py:29-34); schema
inference on a 100 TB hot path is a full extra pass over the data, so we
keep every schema declared here.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Bronze / raw trade schema (consumer_lake.py:29-34; producer.py:16-21).
# ``timestamp`` is deliberately a *string* -- the reference serializes
# ISO-8601 text onto Kafka and casts downstream (process_silver.py:47);
# that cast is part of the surface under test.
TRADE_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("quantity", T.DoubleType()),
        T.StructField("timestamp", T.StringType()),
    ]
)

# Silver schema (process_silver.py:50-57,75-80): windowed aggregates plus
# the ML prediction column.
SILVER_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType()),
        T.StructField("volatility", T.DoubleType()),
        T.StructField("average_price", T.DoubleType()),
        T.StructField("processed_time", T.TimestampType()),
        T.StructField("predicted_price", T.DoubleType()),
    ]
)

# Gold schema (dbt_project/models/gold_market_summary.sql:4-11).
GOLD_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType()),
        T.StructField("minute_window", T.TimestampType()),
        T.StructField("avg_price", T.DoubleType()),
        T.StructField("max_price", T.DoubleType()),
        T.StructField("min_price", T.DoubleType()),
        T.StructField("avg_volatility", T.DoubleType()),
        T.StructField("transaction_count", T.LongType()),
    ]
)

# Fixture ``events`` table as the engine sees it after the catalog converts
# the raw nanosecond long back to a microsecond timestamp.
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

# JSON payload schema for events.props ({"k": <int>}).
PROPS_SCHEMA = T.StructType([T.StructField("k", T.LongType())])

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)

# Multimodal asset table (engine extension): media payloads are opaque
# binary columns with typed metadata, the standard lakehouse shape for
# image/audio/video at scale (payload stays columnar-compressed; metadata
# columns drive partition pruning so decode UDFs only ever see the rows
# they must touch).
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("codec", T.StringType()),
    ]
)
