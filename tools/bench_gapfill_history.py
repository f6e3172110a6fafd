"""Gap-fill maintenance flatness vs history depth (r12 verdict #1).

Mirrors the PERF.md r12 pair exactly — 2 symbols, dense minutes, 6
consecutive 10-minute fill-enabled batches with intra-batch gaps,
appended after H days of stored history — extended to H in {2, 60, 600}.
The r12 measurement showed 30x history => ~1.25x per batch, attributed
to the anchor probe's full-history scan; with the bounded probe the
per-batch wall must be FLAT in H and the probe's selected-directory
count O(1). Prints one JSON line:

  {"per_batch_walls_s": {"2": [...], "60": [...], "600": [...]},
   "probe_dates_scanned": {"2": n, "60": n, "600": n}}

Usage: python tools/bench_gapfill_history.py
"""

from __future__ import annotations

import datetime as dt
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from stock_chart_kafka_streams_spark.session import get_spark
from stock_chart_kafka_streams_spark.streaming.pipeline import (
    LAST_ANCHOR_PROBE,
    cascade_upsert,
)
from stock_chart_kafka_streams_spark.streaming.sink import write_candles

SYMS = ["AAA", "BBB"]
SCHEMA = (
    "symbol string, time_frame string, bucket_start timestamp, "
    "bucket_end timestamp, open double, high double, low double, "
    "close double, volume long"
)


def _candle(s, ts, close, vol):
    return (s, "MINUTE", ts, ts + dt.timedelta(minutes=1),
            close, close + 1, close - 1, close, vol)


def _run(spark, days: int, work: str) -> tuple[list[float], int]:
    path = os.path.join(work, f"hist{days}")
    end = dt.datetime(2023, 12, 31, 12, 0)
    # H days of history: dense 30-minute runs once per day per symbol
    hist = spark.createDataFrame(
        [
            _candle(s, end - dt.timedelta(days=d, minutes=-m), 100.0 + m, 5)
            for s in SYMS
            for d in range(days)
            for m in range(30)
        ],
        SCHEMA,
    ).withColumn("is_gap", F.lit(False))
    write_candles(hist, path)
    hook = cascade_upsert(path, frames=["MINUTE"], fill_gaps=True)
    walls: list[float] = []
    base = end + dt.timedelta(minutes=30)
    for b in range(6):
        # 10-minute batch with intra-batch gaps (minutes 0,1,2,6,9 traded)
        start = base + dt.timedelta(minutes=10 * b)
        rows = [
            _candle(s, start + dt.timedelta(minutes=m), 100.0 + b + m, 3)
            for s in SYMS
            for m in (0, 1, 2, 6, 9)
        ]
        batch = spark.createDataFrame(rows, SCHEMA).localCheckpoint(eager=True)
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        hook(batch, b)
        walls.append(round(time.perf_counter() - t0, 3))
    return walls, int(LAST_ANCHOR_PROBE.get("dates_scanned", -1))


def main() -> None:
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="bench-gapfill-")
    out = {"per_batch_walls_s": {}, "probe_dates_scanned": {}}
    try:
        for days in (2, 60, 600):
            walls, scanned = _run(spark, days, work)
            out["per_batch_walls_s"][str(days)] = walls
            out["probe_dates_scanned"][str(days)] = scanned
    finally:
        shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
