"""Variance probe for the iterative bench entries (r7 verdict #4).

The replay-full and d7 connected-components entries varied 41-63 s and
15-46 s across otherwise-identical round-7 runs. This probe runs each
entry N times inside ONE session with the round-8 instrumentation
(per-CC-round wall-clock, per-micro-batch triggerExecution ms) plus GC
counters sampled around every run, so the spread can be attributed:

- uniform slowdown across rounds/batches within a slow run, with GC time
  spiking -> environmental (heap pressure from earlier allocations);
- one slow round/batch inside an otherwise-fast run -> shuffle/checkpoint
  file churn or listing;
- first run slow, rest fast -> JIT/page-cache warmup.

Usage: python tools/variance_probe.py [runs]   (default 3)
Prints one JSON line per run; summary at the end.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stock_chart_kafka_streams_spark.session import get_spark  # noqa: E402

RUNS = int(sys.argv[1]) if len(sys.argv) > 1 else 3


def gc_stats(spark):
    """Sum GC count/time across all JVM garbage collector beans."""
    jvm = spark.sparkContext._jvm
    beans = jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
    count = sum(b.getCollectionCount() for b in beans)
    ms = sum(b.getCollectionTime() for b in beans)
    return count, ms


def probe_replay(spark, work):
    from pyspark.sql import functions as F

    from stock_chart_kafka_streams_spark.sources.generator import generate_trades
    from stock_chart_kafka_streams_spark.sources.trades import read_trades_json_stream
    from stock_chart_kafka_streams_spark.streaming.pipeline import start_candle_pipeline
    from stock_chart_kafka_streams_spark.streaming.replay import write_replay_batches

    n_ticks = int(os.environ.get("SPARK_GRAFT_BENCH_TICKS_REPLAY", "20000"))
    symbols = {f"S{i:03d}": 10.0 + 7.3 * i for i in range(50)}
    trades = generate_trades(spark, n_ticks, symbols=symbols)
    lo, hi = trades.agg(F.min("ts"), F.max("ts")).collect()[0]
    width = max(int(max((hi - lo).total_seconds(), 1.0) // 12) + 1, 1)
    tb = trades.withColumn(
        "batch",
        ((F.col("ts").cast("long") - int(lo.timestamp())) / width).cast("long"),
    )
    in_dir = os.path.join(work, "in")
    write_replay_batches(tb, in_dir)
    out = []
    for r in range(RUNS):
        run_dir = os.path.join(work, f"run{r}")
        stream = read_trades_json_stream(spark, in_dir, max_files_per_trigger=2)
        spark.sparkContext._jvm.System.gc()
        gc0, gcms0 = gc_stats(spark)
        t0 = time.perf_counter()
        q = start_candle_pipeline(
            stream,
            os.path.join(run_dir, "serving"),
            os.path.join(run_dir, "ck"),
            frames=["MINUTE", "HOUR"],
            watermark_delay="0 seconds",
            available_now=True,
        )
        q.awaitTermination()
        wall = round(time.perf_counter() - t0, 3)
        gc1, gcms1 = gc_stats(spark)
        batches = []
        for p in q.recentProgress:
            if isinstance(p, str):
                p = json.loads(p)
            d = p.get("durationMs", {})
            batches.append(
                {
                    "trigger": d.get("triggerExecution"),
                    "addBatch": d.get("addBatch"),
                    "walCommit": d.get("walCommit"),
                    "getBatch": d.get("getBatch"),
                }
            )
        row = {
            "entry": "replay_full",
            "run": r,
            "wall_s": wall,
            "gc_count": gc1 - gc0,
            "gc_ms": gcms1 - gcms0,
            "batches": batches,
        }
        print(json.dumps(row))
        out.append(row)
        shutil.rmtree(run_dir, ignore_errors=True)
    return out


def probe_d7(spark, sf_dir):
    from pyspark.sql import functions as F

    from stock_chart_kafka_streams_spark.operators.dedup import neardup_clusters

    docs_sf = spark.read.parquet(f"{sf_dir.rstrip('/')}/documents.parquet")
    replicas = 20
    docs = (
        docs_sf.crossJoin(spark.range(replicas).withColumnRenamed("id", "rep"))
        .select(
            (F.col("doc_id") + F.col("rep") * F.lit(100_000_000)).alias("doc_id"),
            "text",
            "lang",
        )
        .where(F.col("doc_id") < 2_000_000_000)
        .repartition(256)
        .localCheckpoint(eager=True)
    )
    out = []
    for r in range(RUNS):
        stats: dict = {}
        spark.sparkContext._jvm.System.gc()
        gc0, gcms0 = gc_stats(spark)
        t0 = time.perf_counter()
        neardup_clusters(docs, stats=stats).write.format("noop").mode(
            "overwrite"
        ).save()
        wall = round(time.perf_counter() - t0, 3)
        gc1, gcms1 = gc_stats(spark)
        row = {
            "entry": "d7_clusters",
            "run": r,
            "wall_s": wall,
            "gc_count": gc1 - gc0,
            "gc_ms": gcms1 - gcms0,
            "rounds": stats.get("rounds"),
            "round_secs": stats.get("round_secs"),
        }
        print(json.dumps(row))
        out.append(row)
    return out


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    spark = get_spark(app_name="variance-probe")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="variance-probe-")
    try:
        rep = probe_replay(spark, work)
        d7 = probe_d7(spark, sf_dir)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    summary = {
        "replay_wall_s": [r["wall_s"] for r in rep],
        "replay_gc_ms": [r["gc_ms"] for r in rep],
        "d7_wall_s": [r["wall_s"] for r in d7],
        "d7_gc_ms": [r["gc_ms"] for r in d7],
        "d7_round_secs": [r["round_secs"] for r in d7],
    }
    print("SUMMARY " + json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
