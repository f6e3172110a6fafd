"""Stream-stream time-interval join (click → purchase attribution).

The canonical Structured Streaming join shape the reference cannot
express at all (its only dataflow is source → windowed agg → sink):
two UNBOUNDED streams joined on an equality key plus an event-time
interval — here, each purchase attributed to every click by the same
user within the preceding ``horizon``.

Both sides carry watermarks; with the time-range condition Spark bounds
the join state to (watermark + horizon) of buffered rows per side and
evicts older state — the streaming-native replacement for an ever-growing
hash table. Inner-join matches emit in the micro-batch where the second
side arrives (no flush needed); the watermark delay knob trades state
size for tolerance to cross-stream arrival skew, exactly like the dedup
operator (streaming/dedup.py).

Driver query ss1 replays the driver's events table through this join with
an un-evictable delay, so the result must equal the batch interval join —
the same exactness contract as d6.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from stock_chart_kafka_streams_spark.session import tune_session

ATTRIBUTION_EVENT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("ts", TimestampType()),
    ]
)


def stream_stream_attribution(
    events: DataFrame,
    horizon: str = "60 minutes",
    watermark_delay: str = "0 seconds",
    how: str = "inner",
) -> DataFrame:
    """Attribute purchases to clicks by the same ``user_id`` within
    ``horizon``: one output row per (click, purchase) pair with
    ``click_ts <= purchase_ts <= click_ts + horizon``.

    ``how="inner"`` emits pairs as matches arrive. ``how="left_outer"``
    additionally emits every unmatched click with null purchase columns —
    but only once the global watermark passes the click's match-eligibility
    window (``click_ts + horizon``), because until then a matching
    purchase could still arrive; the replay harness appends sentinel
    events on BOTH sub-streams to drive that flush (the global watermark
    is the MIN of the two sides' watermarks).

    Works on a streaming frame (stream-stream join, state evicted by
    watermark + time-range condition) and on a batch frame (ordinary
    range join) — the parity the tests and DuckDB oracle rely on."""
    if how not in ("inner", "left_outer"):
        raise ValueError(f"how must be 'inner' or 'left_outer', got {how!r}")
    clicks = events.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
    )
    purchases = events.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    if events.isStreaming:
        clicks = clicks.withWatermark("click_ts", watermark_delay)
        purchases = purchases.withWatermark("purchase_ts", watermark_delay)
    cond = (
        (F.col("p_user") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {horizon}"))
    )
    if how == "inner":
        joined = purchases.join(clicks, cond, "inner")
        user = F.col("p_user")
    else:
        joined = clicks.join(purchases, cond, "left_outer")
        user = F.col("c_user")
    return joined.select(
        user.alias("user_id"),
        "click_ts",
        "purchase_ts",
        "purchase_value",
    )


def attribution_replay_events(
    spark: SparkSession, sf_dir: str, batch_size: int = 1250
) -> DataFrame:
    """The driver's events table as (user_id, event_type, value, ts) plus a
    deterministic ``batch`` column (time-ordered micro-batches)."""
    from stock_chart_kafka_streams_spark.sources.trades import read_events

    ev = read_events(spark, sf_dir)
    return (
        ev.where(
            F.col("user_id").isNotNull()
            & F.col("event_type").isNotNull()
            & F.col("value").isNotNull()
            & F.col("ts").isNotNull()
        )
        .select(
            "user_id",
            "event_type",
            "value",
            "ts",
            (F.col("event_id") / batch_size).cast("long").alias("batch"),
        )
    )


SENTINEL_USER = -1
_SENTINEL_TS = ["2099-06-01T00:00:00.000000", "2099-06-01T00:02:00.000000"]


def write_attribution_batches(
    events_with_batch: DataFrame, replay_dir: str, sentinels: bool = False
) -> int:
    """One JSON-lines file per batch, mtime-ordered for the file source.

    With ``sentinels=True``, appends two trailing batches containing a
    far-future click AND purchase for ``SENTINEL_USER`` — both sub-streams'
    watermarks must advance for the outer join's unmatched-row flush,
    since the global watermark is their MIN. The sentinel user id never
    occurs in real data, so the sentinel rows match nothing.

    Spooled via ``spool_batches_distributed`` — executor-side JSON
    encode, no driver materialization (see streaming/replay.py)."""
    from stock_chart_kafka_streams_spark.streaming.replay import (
        SPOOL_MTIME_BASE,
        spool_batches_distributed,
    )

    df = events_with_batch.select(
        "user_id",
        "event_type",
        "value",
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").alias("ts"),
        "batch",
    )
    n = spool_batches_distributed(df, replay_dir)
    if sentinels:
        for j, ts in enumerate(_SENTINEL_TS):
            path = os.path.join(replay_dir, f"batch-{n + j:05d}.json")
            with open(path, "w") as f:
                for et in ("click", "purchase"):
                    f.write(
                        json.dumps(
                            {
                                "user_id": SENTINEL_USER,
                                "event_type": et,
                                "value": 0.0,
                                "ts": ts,
                            }
                        )
                        + "\n"
                    )
            os.utime(path, (SPOOL_MTIME_BASE + n + j, SPOOL_MTIME_BASE + n + j))
        n += len(_SENTINEL_TS)
    return n


def replay_attribution_stream(
    spark: SparkSession,
    events_with_batch: DataFrame,
    horizon: str = "60 minutes",
    watermark_delay: str = "31 days",
    how: str = "inner",
    work_dir: str | None = None,
) -> DataFrame:
    """Run the stream-stream attribution join over a deterministic batch
    replay and return the emitted pairs. With an un-evictable watermark
    the result must equal the batch interval join (ss1/ss2 oracle
    contract); for ``left_outer``, sentinel batches advance both sides'
    watermarks so unmatched clicks flush from state."""
    tune_session(spark)
    own_tmp = work_dir is None
    work_dir = work_dir or tempfile.mkdtemp(prefix="attr-replay-")
    replay_dir = os.path.join(work_dir, "input")
    out_dir = os.path.join(work_dir, "out")
    ckpt_dir = os.path.join(work_dir, "checkpoint")
    try:
        write_attribution_batches(
            events_with_batch, replay_dir, sentinels=(how == "left_outer")
        )
        stream = (
            spark.readStream.schema(ATTRIBUTION_EVENT_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .json(replay_dir)
        )
        pairs = stream_stream_attribution(
            stream, horizon=horizon, watermark_delay=watermark_delay, how=how
        )
        q = (
            pairs.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        out = (
            spark.read.parquet(out_dir)
            .where(F.col("user_id") != SENTINEL_USER)
            .select("user_id", "click_ts", "purchase_ts", "purchase_value")
        )
        return out.localCheckpoint(eager=True)
    finally:
        if own_tmp:
            shutil.rmtree(work_dir, ignore_errors=True)
