"""Attribute the fused cascade replay's wall-clock (round 16).

Runs the bench's t2_stream_replay_full_1m setup with the REAL
``cascade_upsert`` hook, but times (a) the foreachBatch hook wall per
micro-batch vs the query's own triggerExecution (hook vs streaming
machinery), and (b) inside the hook, the fused ``_cascade_batch``'s
building blocks via monkeypatched sub-timers:

  checkpoint   DataFrame.localCheckpoint (the one stateful evaluation
               + the gap-grid pin)
  collect      DataFrame.collect (keys / probe / gap keys)
  probe        affected_symbol_windows
  publish      _publish_partitions (staging write + renames)

Everything not covered by hook wall is the streaming engine itself
(source listing, state store update/commit, WAL, planning).

Usage: python tools/profile_replay_fused.py [n_runs]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stock_chart_kafka_streams_spark.session import get_spark


def main() -> None:
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    spark = get_spark(app_name="profile-replay-fused")
    spark.sparkContext.setLogLevel("ERROR")
    if os.environ.get("PROFILE_CHANGELOG") == "1":
        spark.conf.set(
            "spark.sql.streaming.stateStore.rocksdb."
            "changelogCheckpointing.enabled",
            "true",
        )

    from stock_chart_kafka_streams_spark.sources.generator import generate_trades
    from stock_chart_kafka_streams_spark.streaming import pipeline as pl
    from stock_chart_kafka_streams_spark.streaming import sink as sk
    from stock_chart_kafka_streams_spark.streaming.replay import (
        read_trades_json_stream,
        write_replay_batches,
    )

    work = tempfile.mkdtemp(prefix="profile-replay-fused-")
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

        acc: dict = {}

        def timed(label, fn):
            def wrap(*a, **kw):
                t0 = time.perf_counter()
                out = fn(*a, **kw)
                acc[label] = round(
                    acc.get(label, 0.0) + time.perf_counter() - t0, 3
                )
                acc[f"{label}_n"] = acc.get(f"{label}_n", 0) + 1
                return out

            return wrap

        # Spark 4: the concrete class is pyspark.sql.classic.dataframe.
        # DataFrame — patching the abstract base would be a no-op
        try:
            from pyspark.sql.classic.dataframe import DataFrame as CDF
        except ImportError:  # Spark 3.x
            CDF = DataFrame
        orig_ckpt = CDF.localCheckpoint
        orig_collect = CDF.collect
        orig_probe = pl.affected_symbol_windows
        orig_pub = sk._publish_partitions
        orig_read = sk.read_partition_dirs

        def publish_decomposed(spark_, df, path, partition_cols, sort_cols=None):
            # split the staging WRITE (the compute job) from the swap
            # metadata (renames, trash purge): time the write by writing
            # the staged parquet ourselves is invasive — instead time the
            # same plan through a noop sink first (adds one evaluation,
            # only in this profiler)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            acc["pub_compute"] = round(
                acc.get("pub_compute", 0.0) + time.perf_counter() - t0, 3
            )
            return orig_pub(spark_, df, path, partition_cols, sort_cols)

        CDF.localCheckpoint = timed("checkpoint", orig_ckpt)
        CDF.collect = timed("collect", orig_collect)
        pl.affected_symbol_windows = timed("probe", orig_probe)
        # PROFILE_PUB_DECOMP=1 adds a noop evaluation of every published
        # plan (times compute separately, inflates the publish total —
        # keep OFF for A/B walls)
        pub = (
            publish_decomposed
            if os.environ.get("PROFILE_PUB_DECOMP") == "1"
            else orig_pub
        )
        sk._publish_partitions = timed("publish", pub)
        sk.read_partition_dirs = timed("stored_read", orig_read)

        try:
            for run in range(n_runs):
                acc.clear()
                hook_walls: list[float] = []
                # mirror the bench entry: frames=["MINUTE","HOUR"],
                # fill_gaps left at start_candle_pipeline's default (False)
                inner = pl.cascade_upsert(
                    os.path.join(work, f"serving{run}"),
                    frames=["MINUTE", "HOUR"],
                    fill_gaps=False,
                )

                def hook(batch, batch_id):
                    t0 = time.perf_counter()
                    inner(batch, batch_id)
                    hook_walls.append(round(time.perf_counter() - t0, 3))

                stream = read_trades_json_stream(
                    spark, os.path.join(work, "in"), max_files_per_trigger=2
                )
                candles = pl.streaming_minute_candles(stream, "0 seconds")
                spark.sparkContext._jvm.System.gc()
                t0 = time.perf_counter()
                q = (
                    candles.writeStream.outputMode("append")
                    .option(
                        "checkpointLocation", os.path.join(work, f"ck{run}")
                    )
                    .foreachBatch(hook)
                    .trigger(availableNow=True)
                    .start()
                )
                q.awaitTermination()
                wall = round(time.perf_counter() - t0, 3)
                prog = []
                state_ms = []
                for p in q.recentProgress:
                    if isinstance(p, str):
                        p = json.loads(p)
                    prog.append(p.get("durationMs", {}))
                    for so in p.get("stateOperators", []):
                        state_ms.append(
                            {
                                k: so.get(k)
                                for k in (
                                    "commitTimeMs",
                                    "allUpdatesTimeMs",
                                    "allRemovalsTimeMs",
                                    "numRowsUpdated",
                                )
                            }
                        )
                print(
                    json.dumps(
                        {
                            "run": run,
                            "wall_s": wall,
                            "hook_walls_s": hook_walls,
                            "hook_total_s": round(sum(hook_walls), 3),
                            "stage_totals": dict(acc),
                            "state_ops": state_ms,
                            "progress_duration_ms": prog,
                        }
                    )
                )
        finally:
            CDF.localCheckpoint = orig_ckpt
            CDF.collect = orig_collect
            pl.affected_symbol_windows = orig_probe
            sk._publish_partitions = orig_pub
            sk.read_partition_dirs = orig_read
    finally:
        shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
