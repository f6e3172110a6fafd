"""Checkpoint recovery: a streaming pipeline stopped and restarted from its
checkpoint (with new input arriving in between) must converge to the same
serving table as one uninterrupted run — state restore + MERGE idempotency
end to end."""

import json
import os

from pyspark.sql import functions as F

from stock_chart_kafka_streams_spark.sources.trades import read_trades_json_stream
from stock_chart_kafka_streams_spark.streaming.pipeline import start_candle_pipeline
from stock_chart_kafka_streams_spark.streaming.replay import (
    late_replay_trades,
    replay_candles,
    write_replay_batches,
)

SF_DIR = "/root/testdata/sf0.001"


def _run_available(spark, inp, table, ckpt):
    stream = read_trades_json_stream(spark, inp, max_files_per_trigger=1)
    q = start_candle_pipeline(
        stream, table, ckpt, frames=["MINUTE"], available_now=True
    )
    q.awaitTermination()


def test_restart_from_checkpoint_converges(spark, tmp_path):
    trades = late_replay_trades(spark, SF_DIR, batch_size=250)
    full_dir = str(tmp_path / "full_in")
    n_files = write_replay_batches(trades, full_dir)
    files = sorted(os.listdir(full_dir))
    split = len(files) // 2

    # interrupted run: first half of the files, stop, then the rest appear
    part_in = tmp_path / "part_in"
    part_in.mkdir()
    for f in files[:split]:
        data = open(os.path.join(full_dir, f)).read()
        p = part_in / f
        p.write_text(data)
        os.utime(p, (os.path.getmtime(os.path.join(full_dir, f)),) * 2)
    table = str(tmp_path / "serving")
    ckpt = str(tmp_path / "ckpt")
    _run_available(spark, str(part_in), table, ckpt)

    for f in files[split:]:
        data = open(os.path.join(full_dir, f)).read()
        p = part_in / f
        p.write_text(data)
        os.utime(p, (os.path.getmtime(os.path.join(full_dir, f)),) * 2)
    _run_available(spark, str(part_in), table, ckpt)  # same checkpoint

    interrupted = (
        spark.read.parquet(table)
        .where(F.col("symbol") != "__heartbeat__")
        .where(F.col("bucket_start") < F.lit("2099-01-01").cast("timestamp"))
        .select(
            "symbol", "time_frame", "bucket_start", "bucket_end",
            "open", "high", "low", "close", "volume",
        )
        .localCheckpoint()
    )

    # uninterrupted reference run over the identical batch sequence
    continuous = replay_candles(spark, trades, frames=["MINUTE"])

    assert interrupted.exceptAll(continuous).count() == 0
    assert continuous.exceptAll(interrupted).count() == 0


def test_stream_stream_join_restart_no_lost_or_duplicate_pairs(spark, tmp_path):
    """Kill-and-restart for the stream-stream attribution join: stopping
    after half the micro-batches and resuming from the same checkpoint
    (join state restored from the state store) must emit exactly the same
    (click, purchase) pairs as one uninterrupted run — none lost, none
    duplicated."""
    from stock_chart_kafka_streams_spark.streaming.join import (
        ATTRIBUTION_EVENT_SCHEMA,
        SENTINEL_USER,
        attribution_replay_events,
        replay_attribution_stream,
        stream_stream_attribution,
        write_attribution_batches,
    )

    events = attribution_replay_events(spark, SF_DIR, batch_size=500)
    full_dir = str(tmp_path / "full_in")
    write_attribution_batches(events, full_dir)
    files = sorted(os.listdir(full_dir))
    split = len(files) // 2

    part_in = tmp_path / "part_in"
    part_in.mkdir()
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def _run():
        stream = (
            spark.readStream.schema(ATTRIBUTION_EVENT_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .json(str(part_in))
        )
        pairs = stream_stream_attribution(
            stream, horizon="60 minutes", watermark_delay="31 days", how="inner"
        )
        q = (
            pairs.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def _copy(names):
        for f in names:
            src = os.path.join(full_dir, f)
            p = part_in / f
            p.write_text(open(src).read())
            os.utime(p, (os.path.getmtime(src),) * 2)

    _copy(files[:split])
    _run()  # interrupted run: first half, then the query stops
    _copy(files[split:])
    _run()  # resume from the same checkpoint with the rest of the input

    interrupted = (
        spark.read.parquet(out_dir)
        .where(F.col("user_id") != SENTINEL_USER)
        .select("user_id", "click_ts", "purchase_ts", "purchase_value")
        .localCheckpoint()
    )
    continuous = replay_attribution_stream(
        spark, events, horizon="60 minutes", watermark_delay="31 days", how="inner"
    )
    # exceptAll is multiset difference: catches duplicates AND losses
    assert interrupted.exceptAll(continuous).count() == 0
    assert continuous.exceptAll(interrupted).count() == 0
