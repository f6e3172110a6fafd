"""Kafka decode path (broker-free) and the SQL surface."""

import json

from pyspark.sql import functions as F

from stock_chart_kafka_streams_spark import candles, load_trades
from stock_chart_kafka_streams_spark.plans.sql_surface import register_views
from stock_chart_kafka_streams_spark.sources.trades import decode_kafka_trades

SF_DIR = "/root/testdata/sf0.001"


def test_decode_kafka_trades_drops_corrupt_payloads(spark):
    """S1 parse semantics on a Kafka-shaped frame: valid JSON decodes,
    corrupt/nullable payloads drop (reference P5)."""
    good = json.dumps(
        {"symbol": "AAPL", "price": 10.5, "quantity": 3, "ts": "2024-01-01T00:00:05"}
    )
    missing_symbol = json.dumps({"price": 1.0, "quantity": 1, "ts": "2024-01-01T00:00:06"})
    # null price must drop on the streaming decode path too (same contract
    # as the batch adapter) — otherwise it could become open/close via
    # min_by/max_by while batch excludes it
    missing_price = json.dumps({"symbol": "AAPL", "quantity": 1, "ts": "2024-01-01T00:00:07"})
    rows = [
        ("AAPL", good),
        ("AAPL", "{not json at all"),
        ("AAPL", missing_symbol),
        ("AAPL", missing_price),
        ("MSFT", None),
    ]
    raw = spark.createDataFrame(rows, "key string, value string").select(
        F.col("key").cast("binary"), F.col("value").cast("binary")
    )
    out = decode_kafka_trades(raw).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["symbol"], r["price"], r["quantity"]) == ("AAPL", 10.5, 3)


def test_decoded_kafka_trades_feed_candles(spark):
    payloads = [
        ("A", json.dumps({"symbol": "A", "price": p, "quantity": 1, "ts": f"2024-01-01T00:00:{s:02d}"}))
        for s, p in [(1, 5.0), (2, 9.0), (3, 7.0)]
    ]
    raw = spark.createDataFrame(payloads, "key string, value string").select(
        F.col("key").cast("binary"), F.col("value").cast("binary")
    )
    c = candles(decode_kafka_trades(raw), "MINUTE").collect()
    assert len(c) == 1
    assert (c[0]["open"], c[0]["high"], c[0]["low"], c[0]["close"], c[0]["volume"]) == (
        5.0,
        9.0,
        5.0,
        7.0,
        3,
    )


def test_sql_surface_matches_api(spark):
    register_views(spark, SF_DIR)
    via_sql = spark.sql(
        "SELECT * FROM hour_candles WHERE symbol = 'click' ORDER BY bucket_start"
    )
    via_api = (
        candles(load_trades(spark, SF_DIR), "HOUR")
        .where(F.col("symbol") == "click")
        .orderBy("bucket_start")
    )
    assert via_sql.collect() == via_api.collect()
    # multi-frame view serves frame-filtered queries too
    n = spark.sql("SELECT count(*) AS n FROM candles WHERE time_frame = 'DAY'").collect()[0]["n"]
    assert n == candles(load_trades(spark, SF_DIR), "DAY").count()
