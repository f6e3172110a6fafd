"""P1 peek/observe: df.observe() metrics taps (reference
``stream/CandlestickAggregator.kt:85,115`` — log-and-pass-through)."""

from pyspark.sql import functions as F

from stock_chart_kafka_streams_spark import candles, load_trades
from stock_chart_kafka_streams_spark.sources.trades import read_trades_json_stream
from stock_chart_kafka_streams_spark.streaming.pipeline import (
    observed_candles,
    streaming_minute_candles,
)
from stock_chart_kafka_streams_spark.streaming.replay import (
    late_replay_trades,
    write_replay_batches,
)

SF_DIR = "/root/testdata/sf0.001"


def test_batch_observation_matches_aggregates(spark):
    base = candles(load_trades(spark, SF_DIR), "MINUTE")
    tapped, obs = observed_candles(base)
    # the tap changes nothing about the data
    assert tapped.exceptAll(base).count() == 0
    got = obs.get
    want = base.agg(
        F.count(F.lit(1)).alias("n"), F.sum("volume").alias("v")
    ).collect()[0]
    assert got["n_candles"] == want["n"]
    assert got["total_volume"] == want["v"]
    assert got["earliest_bucket"] <= got["latest_bucket"]


def test_streaming_observed_metrics_in_progress(spark, tmp_path):
    trades = late_replay_trades(spark, SF_DIR, batch_size=2000)
    write_replay_batches(trades, str(tmp_path / "in"))
    stream = read_trades_json_stream(spark, str(tmp_path / "in"), max_files_per_trigger=1)
    tapped, obs = observed_candles(
        streaming_minute_candles(stream, watermark_delay="0 seconds")
    )
    assert obs is None
    q = (
        tapped.writeStream.outputMode("append")
        .format("memory")
        .queryName("observed_out")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    seen = [
        p["observedMetrics"]["candle_peek"]
        for p in (q.recentProgress or [])
        if p.get("observedMetrics", {}).get("candle_peek") is not None
    ]
    # at least one micro-batch emitted candles through the tap
    assert seen
    total = sum(m["n_candles"] for m in seen)
    emitted = spark.sql("select count(*) n from observed_out").collect()[0]["n"]
    assert total == emitted > 0
