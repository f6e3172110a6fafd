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


def test_session_exact_gap_boundary(spark, duck):
    """Pin Spark's session merge rule at the exact gap boundary: an event
    arriving exactly ``gap`` after the previous one MERGES into the same
    session (measured on Spark 4.1: [0:00] + [0:30] with a 30-min gap →
    one session ending 1:00). The SQL oracle's break comparator must
    therefore be strictly ``> gap``, which session_candles_sql uses."""
    rows = [
        ("A", 1, "2024-01-01 00:00:00"),  # exactly-at-gap pair -> merge
        ("A", 2, "2024-01-01 00:30:00"),
        ("B", 1, "2024-01-01 00:00:00"),  # inside gap -> merge
        ("B", 2, "2024-01-01 00:29:59"),
        ("C", 1, "2024-01-01 00:00:00"),  # past gap -> split
        ("C", 2, "2024-01-01 00:30:01"),
    ]
    trades = spark.createDataFrame(
        rows, "symbol string, quantity long, ts_s string"
    ).select("symbol", "quantity", F.col("ts_s").cast("timestamp").alias("ts"))
    cols = ["symbol", "session_start", "session_end", "n_trades", "volume"]
    got = sorted(map(tuple, session_candles(trades, gap_minutes=30).select(*cols).collect()))

    # exactly-at-gap merges; one second past the gap splits
    n_sessions = {s: sum(1 for r in got if r[0] == s) for s in "ABC"}
    assert n_sessions == {"A": 1, "B": 1, "C": 2}

    from stock_chart_kafka_streams_spark.operators.windows_ext import (
        session_candles_sql,
    )

    values = ", ".join(f"('{s}', {q}, TIMESTAMP '{t}')" for s, q, t in rows)
    cte = f"trades AS (SELECT * FROM (VALUES {values}) AS t(symbol, quantity, ts))"
    want = sorted(
        map(
            tuple,
            duck.sql(
                "SELECT symbol, session_start, session_end, n_trades, volume "
                f"FROM ({session_candles_sql(cte)})"
            ).fetchall(),
        )
    )
    assert got == want
