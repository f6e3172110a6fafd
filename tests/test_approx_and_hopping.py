"""Approximate aggregates (bounded error vs exact) and streaming hopping
windows (equal to batch hopping on a no-late replay)."""

from pyspark.sql import functions as F

from stock_chart_kafka_streams_spark import load_trades
from stock_chart_kafka_streams_spark.operators.windows_ext import (
    approx_daily_stats,
    daily_price_stats,
    hopping_candles,
)
from stock_chart_kafka_streams_spark.sources.trades import read_trades_json_stream
from stock_chart_kafka_streams_spark.streaming.pipeline import (
    streaming_hopping_candles,
)
from stock_chart_kafka_streams_spark.streaming.replay import (
    SENTINEL_CUTOFF,
    late_replay_trades,
    write_replay_batches,
)

SF_DIR = "/root/testdata/sf0.001"


def test_approx_stats_bounded_error(spark):
    trades = load_trades(spark, SF_DIR).cache()
    approx = approx_daily_stats(trades)
    exact = trades.groupBy(
        "symbol", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.countDistinct("price").alias("exact_distinct"),
        F.median("price").alias("exact_median"),
        F.min("price").alias("pmin"),
        F.max("price").alias("pmax"),
    )
    joined = approx.join(exact, on=["symbol", "day"]).collect()
    assert joined
    for r in joined:
        # HLL++ relative error: configured 2% rsd, allow 10% slack
        assert abs(r["approx_distinct_prices"] - r["exact_distinct"]) <= max(
            2, 0.10 * r["exact_distinct"]
        ), r
        # approx percentile is an actual data value within the day's range
        assert r["pmin"] <= r["approx_median_price"] <= r["pmax"], r


def test_streaming_hopping_matches_batch(spark, tmp_path):
    trades = late_replay_trades(spark, SF_DIR, batch_size=250)
    write_replay_batches(trades, str(tmp_path / "in"))
    stream = read_trades_json_stream(spark, str(tmp_path / "in"), max_files_per_trigger=1)
    q = (
        streaming_hopping_candles(stream, watermark_delay="31 days")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("hop_out")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = (
        spark.sql("select * from hop_out")
        .where(F.col("bucket_start") < F.lit(SENTINEL_CUTOFF).cast("timestamp"))
        .where(F.col("symbol") != "__heartbeat__")
    )
    want = hopping_candles(trades.drop("batch"))
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
