"""Per-stage timing of the streaming replay's cascade sink (round 16).

Reproduces the bench's t2_stream_replay_full_1m setup (20k ticks, 50
symbols, JSON spool -> file source -> watermarked minute candles ->
foreachBatch cascade -> MERGE serving sink, availableNow) but replaces
the cascade hook with an instrumented twin that times each stage of
``_cascade_batch`` separately per micro-batch:

  is_empty    batch.isEmpty()                (1 full stateful evaluation)
  checkpoint  select + localCheckpoint       (another full evaluation)
  upsert_min  upsert_candles(minute rows)    (touched collect + publish)
  affected    per-frame distinct collect
  rollup      per-frame scoped rollup upsert (touched collect + publish)

Usage: python tools/profile_replay.py [n_runs]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from stock_chart_kafka_streams_spark.session import get_spark


def main() -> None:
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    spark = get_spark(app_name="profile-replay")
    spark.sparkContext.setLogLevel("ERROR")

    from stock_chart_kafka_streams_spark.functions.timeframes import FRAME_ORDER
    from stock_chart_kafka_streams_spark.operators.candles import rollup_candles
    from stock_chart_kafka_streams_spark.schemas import CANDLE_COLUMNS
    from stock_chart_kafka_streams_spark.sources.generator import generate_trades
    from stock_chart_kafka_streams_spark.sources.trades import (
        read_trades_json_stream,
    )
    from stock_chart_kafka_streams_spark.streaming import pipeline as pl
    from stock_chart_kafka_streams_spark.streaming.replay import (
        write_replay_batches,
    )
    from stock_chart_kafka_streams_spark.streaming.sink import (
        read_partition_dirs,
        upsert_candles,
    )

    work = tempfile.mkdtemp(prefix="profile-replay-")
    try:
        n_ticks = int(os.environ.get("SPARK_GRAFT_BENCH_TICKS_REPLAY", "20000"))
        symbols = {f"S{i:03d}": 10.0 + 7.3 * i for i in range(50)}
        trades = generate_trades(spark, n_ticks, symbols=symbols)
        lo, hi = trades.agg(F.min("ts"), F.max("ts")).collect()[0]
        span = max((hi - lo).total_seconds(), 1.0)
        width = max(int(span // 12) + 1, 1)
        tb = trades.withColumn(
            "batch",
            ((F.col("ts").cast("long") - int(lo.timestamp())) / width).cast("long"),
        )
        write_replay_batches(tb, os.path.join(work, "in"))

        frames = ["HOUR"]

        for run in range(n_runs):
            stage_t: list[dict] = []

            def hook(batch, batch_id):
                rec: dict = {"batch_id": batch_id}
                t0 = time.perf_counter()
                empty = batch.isEmpty()
                rec["is_empty"] = round(time.perf_counter() - t0, 3)
                if empty:
                    stage_t.append(rec)
                    return
                bspark = batch.sparkSession
                t0 = time.perf_counter()
                b = batch.select(*CANDLE_COLUMNS).localCheckpoint(eager=True)
                rec["checkpoint"] = round(time.perf_counter() - t0, 3)
                t0 = time.perf_counter()
                upsert_candles(bspark, b, os.path.join(work, f"serving{run}"))
                rec["upsert_min"] = round(time.perf_counter() - t0, 3)
                path = os.path.join(work, f"serving{run}")
                all_dates = pl.minute_partition_dates(bspark, path)
                for frame in frames:
                    t0 = time.perf_counter()
                    affected = b.select(
                        "symbol",
                        pl.bucket_start("bucket_start", frame).alias(
                            "bucket_start"
                        ),
                    ).distinct()
                    spans = [
                        (r["bucket_start"], pl._frame_end(r["bucket_start"], frame))
                        for r in affected.select("bucket_start").distinct().collect()
                    ]
                    rec[f"affected_{frame}"] = round(time.perf_counter() - t0, 3)
                    dates = sorted(
                        {
                            d
                            for lo_, hi_ in spans
                            for d in all_dates
                            if lo_.date() <= d <= hi_.date()
                        }
                    )
                    t0 = time.perf_counter()
                    minutes = read_partition_dirs(
                        bspark,
                        path,
                        [f"time_frame=MINUTE/bucket_date={d}" for d in dates],
                        assume_exists=True,
                    )
                    if minutes is None:
                        continue
                    scoped = minutes.withColumn(
                        "coarse", pl.bucket_start("bucket_start", frame)
                    ).join(
                        affected.withColumnRenamed("bucket_start", "coarse"),
                        on=["symbol", "coarse"],
                        how="left_semi",
                    )
                    upsert_candles(bspark, rollup_candles(scoped, frame), path)
                    rec[f"rollup_{frame}"] = round(time.perf_counter() - t0, 3)
                stage_t.append(rec)

            stream = read_trades_json_stream(
                spark, os.path.join(work, "in"), max_files_per_trigger=2
            )
            candles = pl.streaming_minute_candles(stream, "0 seconds")
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            q = (
                candles.writeStream.outputMode("append")
                .option("checkpointLocation", os.path.join(work, f"ck{run}"))
                .foreachBatch(hook)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            wall = round(time.perf_counter() - t0, 3)
            print(json.dumps({"run": run, "wall_s": wall, "stages": stage_t}))
            totals: dict = {}
            for rec in stage_t:
                for k, v in rec.items():
                    if k != "batch_id":
                        totals[k] = round(totals.get(k, 0.0) + v, 3)
            print(json.dumps({"run": run, "stage_totals": totals}))
    finally:
        shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
