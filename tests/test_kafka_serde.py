"""Kafka serde evidence without a broker (reference S1/S2 wire shapes).

The sandbox has no Kafka, so the byte-level contracts are pinned directly:
- candle payloads match the reference's ``CandleStick`` JsonSerde shape
  (``config/KafkaConfig.kt:88-95``): field names AND declaration order
  from ``model/CandleStick.kt:5-14``, ISO-8601 UTC instants per
  ``JacksonConfig.kt:20`` (``WRITE_DATES_AS_TIMESTAMPS`` disabled);
- trade encode/decode round-trips exactly (micros precision), and corrupt
  or null-field payloads drop per the decode contract (reference P5).
"""

import datetime as dt
import json

from pyspark.sql import functions as F

from stock_chart_kafka_streams_spark import candles, load_trades
from stock_chart_kafka_streams_spark.sources.trades import (
    decode_kafka_trades,
    encode_kafka_trades,
)
from stock_chart_kafka_streams_spark.streaming.pipeline import candle_kafka_payload

SF_DIR = "/root/testdata/sf0.001"


def test_candle_payload_shape_matches_reference_serde(spark):
    base = candles(load_trades(spark, SF_DIR), "MINUTE").limit(50)
    rows = {r["key"]: r["value"] for r in candle_kafka_payload(base).collect()}
    src = {(r["symbol"], r["bucket_start"]): r for r in base.collect()}
    assert rows
    for key, value in rows.items():
        obj = json.loads(value)
        # Jackson writes data-class fields in declaration order.
        assert list(obj.keys()) == [
            "symbol", "open", "high", "low", "close", "volume",
            "startTime", "endTime",
        ]
        # key is the symbol, duplicated inside the payload
        assert obj["symbol"] == key
        # ISO-8601 UTC instants, whole seconds — Jackson's Instant rendering
        start = dt.datetime.strptime(obj["startTime"], "%Y-%m-%dT%H:%M:%SZ")
        end = dt.datetime.strptime(obj["endTime"], "%Y-%m-%dT%H:%M:%SZ")
        assert end == start + dt.timedelta(minutes=1)
        ref = src[(obj["symbol"], start)]
        assert (
            obj["open"], obj["high"], obj["low"], obj["close"], obj["volume"]
        ) == (ref["open"], ref["high"], ref["low"], ref["close"], ref["volume"])


def test_trade_encode_decode_round_trip_exact(spark):
    trades = load_trades(spark, SF_DIR)
    wire = encode_kafka_trades(trades)
    # wire shape: binary key/value like the Kafka source delivers
    assert dict(wire.dtypes) == {"key": "binary", "value": "binary"}
    back = decode_kafka_trades(wire)
    assert back.exceptAll(trades).count() == 0
    assert trades.exceptAll(back).count() == 0
    # key bytes are the UTF-8 symbol
    first = wire.limit(1).collect()[0]
    assert bytes(first["key"]).decode("utf-8") == json.loads(
        bytes(first["value"]).decode("utf-8")
    )["symbol"]


def test_trade_wire_timestamp_is_iso8601_micros(spark):
    rows = [("AAPL", 1.5, 3, dt.datetime(2024, 1, 2, 3, 4, 5, 123456))]
    df = spark.createDataFrame(rows, "symbol string, price double, quantity long, ts timestamp")
    value = bytes(encode_kafka_trades(df).collect()[0]["value"]).decode()
    obj = json.loads(value)
    assert list(obj.keys()) == ["symbol", "price", "quantity", "ts"]
    assert obj["ts"] == "2024-01-02T03:04:05.123456Z"


def test_decode_drops_corrupt_and_null_field_payloads(spark):
    good = '{"symbol":"AAPL","price":1.0,"quantity":2,"ts":"2024-01-01T00:00:00Z"}'
    null_price = '{"symbol":"AAPL","quantity":2,"ts":"2024-01-01T00:00:00Z"}'
    corrupt = "not json at all"
    raw = spark.createDataFrame(
        [(b"k", v.encode()) for v in (good, null_price, corrupt)],
        "key binary, value binary",
    )
    out = decode_kafka_trades(raw).collect()
    assert len(out) == 1
    assert out[0]["symbol"] == "AAPL" and out[0]["price"] == 1.0


def test_candle_payload_round_trip_exact(spark):
    """S2 wire symmetry: the reference-shaped candle payload decodes back
    to exactly the candles that were encoded (whole-second buckets, so
    the second-precision ISO format loses nothing)."""
    from stock_chart_kafka_streams_spark.streaming.pipeline import (
        decode_candle_payload,
    )

    base = candles(load_trades(spark, SF_DIR), "MINUTE")
    wire = candle_kafka_payload(base)
    back = decode_candle_payload(wire)
    want = base.select(
        "symbol", "bucket_start", "bucket_end",
        "open", "high", "low", "close", "volume",
    )
    assert back.exceptAll(want).count() == 0
    assert want.exceptAll(back).count() == 0
