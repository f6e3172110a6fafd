"""CSV/JSON batch trade sources, rate-source generator stream, and API
validation consistency."""

import time

import pytest
from pyspark.sql import functions as F

from stock_chart_kafka_streams_spark import CandleStore, load_trades, multi_frame_candles
from stock_chart_kafka_streams_spark.sources.generator import generate_trades_stream
from stock_chart_kafka_streams_spark.sources.trades import (
    read_trades_csv,
    read_trades_json,
    read_trades_orc,
)

SF_DIR = "/root/testdata/sf0.001"


def test_csv_json_orc_roundtrip(spark, tmp_path):
    trades = load_trades(spark, SF_DIR).localCheckpoint()
    csv_dir, json_dir = str(tmp_path / "csv"), str(tmp_path / "json")
    orc_dir = str(tmp_path / "orc")
    trades.write.option("header", "true").csv(csv_dir)
    trades.write.json(json_dir)
    trades.write.orc(orc_dir)

    via_csv = read_trades_csv(spark, csv_dir)
    via_json = read_trades_json(spark, json_dir)
    via_orc = read_trades_orc(spark, orc_dir)
    n = trades.count()
    assert via_csv.count() == n
    assert via_json.count() == n
    assert via_orc.count() == n
    # identical aggregates through any format
    agg = lambda df: df.agg(
        F.sum("quantity").alias("q"), F.round(F.sum("price"), 6).alias("p")
    ).collect()[0]
    assert agg(via_csv) == agg(trades)
    assert agg(via_json) == agg(trades)
    assert agg(via_orc) == agg(trades)
    # ORC is columnar + typed: the exact rows survive, not just aggregates
    assert via_orc.exceptAll(trades).count() == 0


def test_json_source_drops_corrupt_lines(spark, tmp_path):
    p = tmp_path / "j"
    p.mkdir()
    (p / "a.json").write_text(
        '{"symbol":"A","price":1.0,"quantity":1,"ts":"2024-01-01T00:00:00"}\n'
        "this is not json\n"
        '{"price":2.0,"quantity":1,"ts":"2024-01-01T00:00:01"}\n'
    )
    out = read_trades_json(spark, str(p)).collect()
    assert len(out) == 1 and out[0]["symbol"] == "A"


def test_rate_source_generator_stream(spark, tmp_path):
    stream = generate_trades_stream(spark, rows_per_second=50)
    assert stream.isStreaming
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("gen_stream")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        deadline = time.time() + 30
        n = 0
        while time.time() < deadline:
            n = spark.sql("select count(*) n from gen_stream").collect()[0]["n"]
            if n >= 20:
                break
            time.sleep(1)
    finally:
        q.stop()
    assert n >= 20
    rows = spark.sql("select * from gen_stream").collect()
    for r in rows:
        assert r["price"] > 0 and 1 <= r["quantity"] <= 100
        assert r["symbol"] in {"AAPL", "GOOGL", "MSFT", "AMZN", "TSLA"}


def test_api_validation_consistency(spark):
    store = CandleStore(multi_frame_candles(load_trades(spark, SF_DIR)))
    with pytest.raises(ValueError):
        store.recent("click", "WEEK", 5)
    with pytest.raises(ValueError):
        store.recent("click", "DAY", 0)
    with pytest.raises(ValueError):
        store.point("click", "WEEK", 2024, 1)
