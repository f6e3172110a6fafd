"""Static schemas for the engine (reference data model, SURVEY.md §1.2).

The reference declares these as Kotlin data classes serialized as JSON
(``model/StockTransaction.kt:5-10``, ``model/CandleStick.kt:5-14``,
``model/MultiTimeFrameCandleStick.kt:18-28``). Here they are Spark
``StructType``s; JSON appears only at Kafka boundaries (``from_json`` /
``to_json``), columnar Parquet everywhere else.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Input trade event. Reference: StockTransaction(symbol, price, quantity,
# timestamp). quantity widened Int -> Long (SURVEY §2.7 Q7: overflow at scale).
TRADE_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType(), nullable=False),
        T.StructField("price", T.DoubleType(), nullable=False),
        T.StructField("quantity", T.LongType(), nullable=False),
        T.StructField("ts", T.TimestampType(), nullable=False),
    ]
)

# Serving-table candle. Reference: MultiTimeFrameCandleStick; the Redis
# string key candle:{symbol}:{frame}:{yyyyMMdd[HH[mm]]} becomes native
# typed columns (symbol, time_frame, bucket_start).
CANDLE_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType(), nullable=False),
        T.StructField("time_frame", T.StringType(), nullable=False),
        T.StructField("bucket_start", T.TimestampType(), nullable=False),
        T.StructField("bucket_end", T.TimestampType(), nullable=False),
        T.StructField("open", T.DoubleType(), nullable=False),
        T.StructField("high", T.DoubleType(), nullable=False),
        T.StructField("low", T.DoubleType(), nullable=False),
        T.StructField("close", T.DoubleType(), nullable=False),
        T.StructField("volume", T.LongType(), nullable=False),
    ]
)

# Kafka wire schema for the trade topic (reference topic
# ``stock-transactions``, JSON values; KafkaConfig.kt:78-105).
KAFKA_TRADE_JSON_SCHEMA = TRADE_SCHEMA

CANDLE_COLUMNS = [f.name for f in CANDLE_SCHEMA.fields]

# Unique / MERGE key of the serving table (SURVEY §2.7 Q8).
CANDLE_KEY = ["symbol", "time_frame", "bucket_start"]
