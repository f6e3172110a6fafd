"""Structured-Streaming throughput bench: events/s through the REAL
stateful pipeline (file source -> watermark -> windowed OHLCV -> sink),
the number that compares directly against the reference's design load
(Kafka Streams, 1 partition, 5 events/s — ``BASELINE.md``).

Two shapes, both drained with trigger(availableNow) over a pre-written
parquet spool (generation and spooling are untimed):

- ``single``: trades -> minute candles (one stateful operator) -> noop
- ``chained``: trades -> minute -> hour candles (two stateful operators
  in one query, Spark >= 3.4) -> noop

RocksDB state store, zero-second watermark (the reference's zero-grace
semantics). Prints one JSON line mirroring bench.py's shape.

Usage: python tools/bench_streaming.py   [env SPARK_GRAFT_BENCH_TICKS_STREAM]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stock_chart_kafka_streams_spark.schemas import TRADE_SCHEMA
from stock_chart_kafka_streams_spark.session import get_spark
from stock_chart_kafka_streams_spark.sources.generator import generate_trades
from stock_chart_kafka_streams_spark.streaming.pipeline import (
    streaming_chained_candles,
    streaming_minute_candles,
)


def _drain(spark, spool: str, work: str, shape: str) -> float:
    stream = (
        spark.readStream.schema(TRADE_SCHEMA)
        .option("maxFilesPerTrigger", "16")
        .parquet(spool)
    )
    if shape == "single":
        out = streaming_minute_candles(stream, watermark_delay="0 seconds")
    else:
        out = streaming_chained_candles(stream, coarse="1 hour", watermark_delay="0 seconds")
    t0 = time.perf_counter()
    q = (
        out.writeStream.outputMode("append")
        .format("noop")
        .option("checkpointLocation", os.path.join(work, f"ck-{shape}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return time.perf_counter() - t0


def main() -> None:
    n_ticks = int(os.environ.get("SPARK_GRAFT_BENCH_TICKS_STREAM", "40000"))
    symbols = {f"S{i:03d}": 10.0 + 7.3 * i for i in range(50)}
    n_events = n_ticks * len(symbols)

    spark = get_spark(app_name="streaming-bench")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="bench-streaming-")
    try:
        spool = os.path.join(work, "spool")
        # 64 files -> 4 availableNow micro-batches at 16 files/trigger:
        # the pipeline pays real per-batch planning + state commit costs,
        # not one giant batch.
        (
            generate_trades(spark, n_ticks, symbols=symbols)
            .repartition(64)
            .write.mode("overwrite")
            .parquet(spool)
        )
        timings = {}
        rates = {}
        for shape in ("single", "chained"):
            secs = _drain(spark, spool, work, shape)
            timings[f"stream_{shape}_sec"] = round(secs, 3)
            rates[f"stream_{shape}_events_per_sec"] = int(n_events / secs)
        print(
            json.dumps(
                {
                    "metric": "streaming_events_per_sec",
                    "value": rates["stream_single_events_per_sec"],
                    "unit": "events/sec",
                    "queries": {**timings, **rates},
                    "n_events": n_events,
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
