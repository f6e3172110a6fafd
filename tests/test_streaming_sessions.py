"""Streaming session-window semantics over the replay harness: sessions
merge across micro-batches and match the batch gaps-and-islands result."""

from pyspark.sql import functions as F

from stock_chart_kafka_streams_spark.operators.windows_ext import session_candles
from stock_chart_kafka_streams_spark.sources.trades import read_trades_json_stream
from stock_chart_kafka_streams_spark.streaming.pipeline import (
    streaming_session_candles,
)
from stock_chart_kafka_streams_spark.streaming.replay import (
    SENTINEL_CUTOFF,
    late_replay_trades,
    write_replay_batches,
)

SF_DIR = "/root/testdata/sf0.001"


def test_streaming_sessions_match_batch(spark, tmp_path):
    # 31-day watermark delay: the delayed rows in the replay can never be
    # late (watermark stays below their event time), so the streaming
    # result must equal the batch gaps-and-islands computation exactly;
    # the far-future sentinels still flush every session out of state.
    trades = late_replay_trades(spark, SF_DIR, batch_size=250)
    write_replay_batches(trades, str(tmp_path / "in"))
    stream = read_trades_json_stream(spark, str(tmp_path / "in"), max_files_per_trigger=1)
    q = (
        streaming_session_candles(stream, gap="30 minutes", watermark_delay="31 days")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_out")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = (
        spark.sql("select * from sess_out")
        .where(F.col("session_start") < F.lit(SENTINEL_CUTOFF).cast("timestamp"))
        .where(F.col("symbol") != "__heartbeat__")
    )
    want = session_candles(trades.drop("batch"), gap_minutes=30).withColumnRenamed(
        "session_start", "session_start"
    )
    # compare on (symbol, start, end, n, volume)
    cols = ["symbol", "session_start", "session_end", "n_trades", "volume"]
    g = sorted(map(tuple, got.select(*cols).collect()))
    w = sorted(map(tuple, want.select(*cols).collect()))
    assert g == w
