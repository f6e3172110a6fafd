"""Deterministic micro-batch replay harness (test stand-in for Kafka).

Drives the streaming pipeline from a directory of JSON files — one file per
micro-batch (``maxFilesPerTrigger=1`` + ``Trigger.AvailableNow``) — so
watermark/late-data behavior (SURVEY §2.7 Q4, C12) is reproducible: batch k
of the file source sees exactly the rows assigned batch k here.

Semantics being exercised (zero-grace parity with the reference's
``ofSizeWithNoGrace``, SURVEY §2.7 Q4), calibrated empirically against
Spark 4.1 and pinned by tests/test_streaming.py: with watermark delay d,

- a row arriving in micro-batch k CONTRIBUTES iff its window end >
  ``max(event time over batches <= k-2) - d`` (the input late-filter uses
  the watermark committed at the END of batch k-1, which was computed from
  data through batch k-2 — one batch more lag than the eviction boundary);
- a window is EMITTED (append mode) at the end of the first batch k whose
  eviction watermark ``max(event time over batches <= k-1) - d`` passes its
  end.

Two trailing sentinel batches with far-future timestamps flush every real
window out of state; sentinel windows themselves are filtered from the
result. The contribution rule is pure SQL over (row, batch) — the DuckDB
oracle for C12 implements it with a windowed running max (see
__spark_entry__.py).
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stock_chart_kafka_streams_spark.sources.trades import read_trades_json_stream
from stock_chart_kafka_streams_spark.streaming.pipeline import start_candle_pipeline

# Any event at/after this instant is a sentinel heartbeat, not data.
SENTINEL_CUTOFF = "2099-01-01 00:00:00"
_SENTINELS = ["2099-06-01T00:00:00.000000", "2099-06-01T00:02:00.000000"]


def late_replay_trades(spark: SparkSession, sf_dir: str, batch_size: int = 1250) -> DataFrame:
    """Deterministic out-of-order replay input (FIXTURES.md F3): trades from
    the driver's events table, split into time-ordered micro-batches of
    ``batch_size`` events, with every 23rd-mod-7 event delayed by two
    batches (those become droppable once the watermark passes their
    window)."""
    from stock_chart_kafka_streams_spark.sources.trades import (
        read_events,
        trades_from_events,
    )

    ev = read_events(spark, sf_dir)
    batched = ev.withColumn(
        "batch",
        (F.col("event_id") / batch_size).cast("long")
        + F.when(F.col("event_id") % 23 == 7, F.lit(2)).otherwise(F.lit(0)),
    )
    return trades_from_events(batched, extra_cols=("batch",))


# Fixed mtime base for spooled batch files: the file stream source orders
# files by modification time, so batch i gets mtime base+i.
SPOOL_MTIME_BASE = 1_700_000_000


def spool_batches_distributed(df: DataFrame, replay_dir: str) -> int:
    """Write ``df`` (payload columns + integer ``batch``) as exactly one
    JSON-lines file per distinct batch value, named ``batch-%05d.json``
    and mtime-ordered so the file stream source replays them in batch
    order. Returns the number of batch files written.

    DISTRIBUTED: rows never reach the driver. The JSON encode runs in
    executor tasks (``repartition(n, "batch")`` hashes every batch into
    exactly one partition, so ``partitionBy("batch")`` emits exactly one
    part file per batch), and the driver only performs O(batches) rename
    + utime metadata ops plus one batch-count-sized ``distinct`` collect.
    This replaces a ``.toPandas()`` spool that capped replay scale at
    driver memory (round-5 verdict nit #2); replays now spool at any SF
    the cluster can write.

    Timestamp columns must be pre-formatted to strings by the caller
    (``date_format(ts, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")``) so the emitted
    JSON matches what the replay readers' ISO-timestamp schemas parse.
    """
    batches = sorted(r[0] for r in df.select("batch").distinct().collect())
    os.makedirs(replay_dir, exist_ok=True)
    spool = replay_dir.rstrip("/") + ".spool"
    (
        df.repartition(max(len(batches), 1), "batch")
        .write.mode("overwrite")
        .partitionBy("batch")
        .json(spool)
    )
    for i, b in enumerate(batches):
        bdir = os.path.join(spool, f"batch={b}")
        parts = [p for p in os.listdir(bdir) if p.startswith("part-")]
        if len(parts) != 1:
            raise RuntimeError(
                f"expected exactly one part file for batch {b}, got {parts}"
            )
        dst = os.path.join(replay_dir, f"batch-{i:05d}.json")
        os.replace(os.path.join(bdir, parts[0]), dst)
        os.utime(dst, (SPOOL_MTIME_BASE + i, SPOOL_MTIME_BASE + i))
    shutil.rmtree(spool, ignore_errors=True)
    return len(batches)


def write_replay_batches(trades_with_batch: DataFrame, replay_dir: str) -> int:
    """Write trades as one JSON-lines file per ``batch`` column value via
    the distributed spool, then append two driver-written sentinel
    heartbeat batches that advance the watermark past all real event
    time. Returns the total number of files."""
    df = trades_with_batch.select(
        "symbol",
        "price",
        "quantity",
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").alias("ts"),
        "batch",
    )
    n = spool_batches_distributed(df, replay_dir)
    for j, ts in enumerate(_SENTINELS):
        path = os.path.join(replay_dir, f"batch-{n + j:05d}.json")
        with open(path, "w") as f:
            f.write(
                json.dumps(
                    {"symbol": "__heartbeat__", "price": 0.01, "quantity": 1, "ts": ts}
                )
                + "\n"
            )
        os.utime(path, (SPOOL_MTIME_BASE + n + j, SPOOL_MTIME_BASE + n + j))
    return n + len(_SENTINELS)


def dup_replay_trades(spark: SparkSession, sf_dir: str, batch_size: int = 1250) -> DataFrame:
    """Deterministic duplicate-injection replay input for streaming dedup:
    every 10th-mod-3 event is re-emitted in its own batch (same-batch
    duplicate) and every 40th-mod-21 event re-emitted one batch later
    (cross-batch duplicate, exercising dedup state across micro-batches)."""
    from stock_chart_kafka_streams_spark.sources.trades import (
        read_events,
        trades_from_events,
    )

    ev = read_events(spark, sf_dir)
    base = ev.withColumn("batch", (F.col("event_id") / batch_size).cast("long"))
    dup_same = base.where(F.col("event_id") % 10 == 3)
    dup_next = base.where(F.col("event_id") % 40 == 21).withColumn(
        "batch", F.col("batch") + 1
    )
    return trades_from_events(
        base.unionByName(dup_same).unionByName(dup_next), extra_cols=("batch",)
    )


def replay_dedup_stream(
    spark: SparkSession,
    trades_with_batch: DataFrame,
    watermark_delay: str = "31 days",
    work_dir: str | None = None,
) -> DataFrame:
    """Run streaming exact dedup (dropDuplicatesWithinWatermark on the full
    row content) over a deterministic batch replay; returns the surviving
    trades. With a delay longer than the replay's event-time span, no dedup
    state is evicted mid-replay, so the result must equal batch DISTINCT —
    the DuckDB-oracle contract for d6."""
    from stock_chart_kafka_streams_spark.streaming.dedup import dedup_stream_exact

    own_tmp = work_dir is None
    work_dir = work_dir or tempfile.mkdtemp(prefix="dedup-replay-")
    replay_dir = os.path.join(work_dir, "input")
    out_dir = os.path.join(work_dir, "out")
    ckpt_dir = os.path.join(work_dir, "checkpoint")
    try:
        write_replay_batches(trades_with_batch, replay_dir)
        stream = read_trades_json_stream(spark, replay_dir, max_files_per_trigger=1)
        deduped = dedup_stream_exact(
            stream,
            key_cols=["symbol", "price", "quantity", "ts"],
            ts_col="ts",
            watermark_delay=watermark_delay,
        )
        q = (
            deduped.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        out = (
            spark.read.parquet(out_dir)
            .where(F.col("ts") < F.lit(SENTINEL_CUTOFF).cast("timestamp"))
            .where(F.col("symbol") != "__heartbeat__")
            .select("symbol", "price", "quantity", "ts")
        )
        return out.localCheckpoint(eager=True)
    finally:
        if own_tmp:
            shutil.rmtree(work_dir, ignore_errors=True)


def replay_candles(
    spark: SparkSession,
    trades_with_batch: DataFrame,
    frames: list[str] | None = None,
    watermark_delay: str = "0 seconds",
    work_dir: str | None = None,
    sink_mode: str = "cascade",
    merge_every: int = 8,
    fill_gaps: bool = False,
) -> DataFrame:
    """Run the full streaming pipeline over a deterministic batch replay and
    return the resulting serving table (sentinel rows excluded).

    ``trades_with_batch`` needs trade columns + an integer ``batch``.
    ``sink_mode="cascade"`` (default) upserts + cascades every micro-batch
    (the c12/c15 oracle surface); ``"batched"`` drives the
    ``BatchedCompactionSink`` (append staging, MERGE every
    ``merge_every`` batches, coarse frames at finalize) — both converge
    to the same table (tests/test_compaction.py).
    """
    if sink_mode not in ("cascade", "batched"):
        raise ValueError(f"sink_mode must be 'cascade' or 'batched', got {sink_mode!r}")
    if fill_gaps and sink_mode == "batched":
        raise ValueError(
            "fill_gaps is a cascade-sink feature (the batched sink defers "
            "MERGEs, so mid-stream gap rows would read a stale table); "
            "run fill_candle_gaps at finalize/read time instead"
        )
    own_tmp = work_dir is None
    work_dir = work_dir or tempfile.mkdtemp(prefix="candle-replay-")
    replay_dir = os.path.join(work_dir, "input")
    table_dir = os.path.join(work_dir, "serving")
    ckpt_dir = os.path.join(work_dir, "checkpoint")
    try:
        write_replay_batches(trades_with_batch, replay_dir)
        stream = read_trades_json_stream(spark, replay_dir, max_files_per_trigger=1)
        if sink_mode == "batched":
            from stock_chart_kafka_streams_spark.streaming.pipeline import (
                start_candle_pipeline_batched,
            )

            q, sink = start_candle_pipeline_batched(
                stream,
                table_dir,
                ckpt_dir,
                frames=frames,
                watermark_delay=watermark_delay,
                available_now=True,
                merge_every=merge_every,
            )
            q.awaitTermination()
            sink.finalize(frames)
        else:
            q = start_candle_pipeline(
                stream,
                table_dir,
                ckpt_dir,
                frames=frames,
                watermark_delay=watermark_delay,
                available_now=True,
                fill_gaps=fill_gaps,
            )
            q.awaitTermination()
        out = (
            spark.read.parquet(table_dir)
            .where(F.col("bucket_start") < F.lit(SENTINEL_CUTOFF).cast("timestamp"))
            .where(F.col("symbol") != "__heartbeat__")
            .select(
                "symbol",
                "time_frame",
                "bucket_start",
                "bucket_end",
                "open",
                "high",
                "low",
                "close",
                "volume",
            )
        )
        # materialize before the temp dir can disappear
        out = out.localCheckpoint(eager=True)
        return out
    finally:
        if own_tmp:
            shutil.rmtree(work_dir, ignore_errors=True)


def replay_corr_tier(
    spark: SparkSession,
    trades_with_batch: DataFrame,
    n: int = 20,
    work_dir: str | None = None,
) -> DataFrame:
    """Run the cascade sink WITH the incremental correlation tier
    (``streaming.corr.cascade_upsert_with_corr``, fill_gaps=True) over a
    deterministic batch replay and return the materialized pair table —
    the oracle surface for w16: the incrementally-maintained table must
    equal the one-shot w15 matrix over the gap-filled replay-kept minute
    candles (sentinel rows excluded)."""
    from stock_chart_kafka_streams_spark.streaming.corr import (
        cascade_upsert_with_corr,
    )
    from stock_chart_kafka_streams_spark.streaming.pipeline import (
        streaming_minute_candles,
    )

    own_tmp = work_dir is None
    work_dir = work_dir or tempfile.mkdtemp(prefix="corr-replay-")
    replay_dir = os.path.join(work_dir, "input")
    table_dir = os.path.join(work_dir, "serving")
    corr_dir = os.path.join(work_dir, "corr")
    ckpt_dir = os.path.join(work_dir, "checkpoint")
    try:
        write_replay_batches(trades_with_batch, replay_dir)
        stream = read_trades_json_stream(spark, replay_dir, max_files_per_trigger=1)
        q = (
            streaming_minute_candles(stream, "0 seconds")
            .writeStream.outputMode("append")
            .option("checkpointLocation", ckpt_dir)
            .foreachBatch(
                cascade_upsert_with_corr(
                    table_dir, corr_dir, frames=["MINUTE"], corr_n=n
                )
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        out = (
            spark.read.parquet(corr_dir)
            .where(F.col("bucket_start") < F.lit(SENTINEL_CUTOFF).cast("timestamp"))
            .where(
                (F.col("sym_a") != "__heartbeat__")
                & (F.col("sym_b") != "__heartbeat__")
            )
            .select(
                "sym_a", "sym_b", "bucket_start", "close_a", "close_b",
                f"corr_{n}",
            )
        )
        return out.localCheckpoint(eager=True)
    finally:
        if own_tmp:
            shutil.rmtree(work_dir, ignore_errors=True)
