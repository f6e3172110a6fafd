"""Serving-table compaction: file count drops to one per partition,
contents identical, untouched partitions untouched."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from stock_chart_kafka_streams_spark.operators.candles import multi_frame_candles
from stock_chart_kafka_streams_spark.sources.trades import load_trades
from stock_chart_kafka_streams_spark.streaming.sink import compact_candles

SF_DIR = "/root/testdata/sf0.001"


def _files_per_partition(path):
    out = {}
    for f in glob.glob(os.path.join(path, "*", "*", "*.parquet")):
        part = os.path.dirname(os.path.relpath(f, path))
        out[part] = out.get(part, 0) + 1
    return out


def _snapshot(spark, path):
    return sorted(
        map(
            tuple,
            spark.read.parquet(path)
            .select(
                "symbol", "time_frame", "bucket_start", "open", "high", "low",
                "close", "volume",
            )
            .collect(),
        )
    )


def _append_slices(spark, candles, path, n, col="symbol"):
    """Append-mode writes (the cheap streaming sink variant that skips the
    MERGE rewrite) accrete one file per write per touched partition —
    the small-file source compaction exists for. Slicing by symbol makes
    every slice hit every (time_frame, bucket_date) partition."""
    symbols = [r[0] for r in candles.select(col).distinct().collect()]
    for i in range(n):
        batch = candles.where(F.col(col).isin(symbols[i::n]))
        (
            batch.withColumn("bucket_date", F.to_date("bucket_start"))
            .write.mode("append")
            .partitionBy("time_frame", "bucket_date")
            .parquet(path)
        )


def test_compaction_reduces_files_and_preserves_rows(spark, tmp_path):
    path = str(tmp_path / "serving")
    candles = multi_frame_candles(load_trades(spark, SF_DIR)).localCheckpoint(
        eager=True
    )
    _append_slices(spark, candles, path, 4)
    before_files = _files_per_partition(path)
    before_rows = _snapshot(spark, path)
    assert max(before_files.values()) > 1  # small-file problem exists

    compact_candles(spark, path)
    after_files = _files_per_partition(path)
    assert set(after_files) == set(before_files)
    assert all(n == 1 for n in after_files.values()), after_files
    assert _snapshot(spark, path) == before_rows


def test_partition_scoped_compaction_leaves_rest_alone(spark, tmp_path):
    path = str(tmp_path / "serving")
    candles = multi_frame_candles(load_trades(spark, SF_DIR)).localCheckpoint(
        eager=True
    )
    _append_slices(spark, candles, path, 3)
    before_files = _files_per_partition(path)
    before_rows = _snapshot(spark, path)
    target = [
        (r["time_frame"], r["bucket_date"])
        for r in spark.read.parquet(path)
        .select("time_frame", F.to_date("bucket_start").alias("bucket_date"))
        .distinct()
        .collect()
    ][:2]

    compact_candles(spark, path, partitions=target)
    after_files = _files_per_partition(path)
    for part, n in after_files.items():
        tf = part.split("/")[0].split("=")[1]
        bd = part.split("/")[1].split("=")[1]
        if (tf, bd) in {(t, str(b)) for t, b in target}:
            assert n == 1, (part, n)
        else:
            assert n == before_files[part], (part, n)
    assert _snapshot(spark, path) == before_rows


# -- batched-compaction sink (round 8, r7 verdict #6) ---------------------


def test_batched_sink_replay_equals_cascade_sink(spark):
    """The high-throughput sink (append staging, MERGE every N batches,
    coarse frames at finalize) must converge to the SAME serving table as
    the per-batch cascade MERGE on an identical deterministic replay —
    including an odd batch count, so the final flush path (pending <
    merge_every) is exercised."""
    from stock_chart_kafka_streams_spark.streaming.replay import (
        late_replay_trades,
        replay_candles,
    )

    tb = late_replay_trades(spark, SF_DIR, batch_size=400)
    frames = ["MINUTE", "HOUR"]
    cascade = _rows_of(replay_candles(spark, tb, frames=frames))
    batched = _rows_of(
        replay_candles(spark, tb, frames=frames, sink_mode="batched", merge_every=3)
    )
    assert batched == cascade and len(batched) > 0


def _rows_of(df):
    return sorted(
        map(
            tuple,
            df.select(
                "symbol", "time_frame", "bucket_start", "bucket_end", "open",
                "high", "low", "close", "volume",
            ).collect(),
        ),
        key=str,
    )


def test_batched_sink_redelivery_idempotent(spark, tmp_path):
    """At-least-once contract: re-delivering a micro-batch (same batch_id)
    before the merge must not change the merged table — the staging dedup
    keeps one row per candle key (highest batch id wins)."""
    from stock_chart_kafka_streams_spark.streaming.sink import (
        BatchedCompactionSink,
    )

    candles = multi_frame_candles(load_trades(spark, SF_DIR), ["MINUTE"])
    b0 = candles.where(F.col("symbol") == candles.select("symbol").first()[0])
    path = str(tmp_path / "serving")
    sink = BatchedCompactionSink(path, merge_every=100)
    sink(b0, 0)
    sink(b0, 0)  # redelivery
    sink(b0, 1)  # replayed again under a later batch id
    sink.flush()
    got = _snapshot(spark, path)
    want = sorted(
        map(
            tuple,
            b0.select(
                "symbol", "time_frame", "bucket_start", "open", "high", "low",
                "close", "volume",
            ).collect(),
        )
    )
    assert got == want and len(got) > 0


def test_batched_sink_rejects_bad_merge_every(tmp_path):
    import pytest

    from stock_chart_kafka_streams_spark.streaming.sink import (
        BatchedCompactionSink,
    )

    with pytest.raises(ValueError):
        BatchedCompactionSink(str(tmp_path / "t"), merge_every=0)


def test_batched_sink_recovers_inherited_staging(spark, tmp_path):
    """r8 advice + r9 review: leftover staging from a crashed run holds
    staged-but-unmerged CLOSED windows, and a same-checkpoint restart
    will never re-deliver them (append mode emits each window once) — so
    construction must RECOVER them, not delete them. The inherited rows
    are merged before the first new append (their old bid numbering
    never competes with the new one), and later fresh flushes overwrite
    recovered keys via the serving MERGE."""
    import os

    import pytest

    from stock_chart_kafka_streams_spark.streaming.sink import (
        BatchedCompactionSink,
    )

    candles = multi_frame_candles(load_trades(spark, SF_DIR), ["MINUTE"])
    symbols = sorted(r[0] for r in candles.select("symbol").distinct().collect())
    assert len(symbols) >= 2
    b0 = candles.where(F.col("symbol") == symbols[0])
    other = candles.where(F.col("symbol") == symbols[1])
    path = str(tmp_path / "serving")

    # a crashed run left two kinds of staged rows behind, under a batch
    # numbering unrelated to the new run's: (a) rows for symbols[0] with
    # doctored closes, (b) the ONLY copy of symbols[1]'s windows
    crashed = BatchedCompactionSink(path, merge_every=100)
    crashed(b0.withColumn("close", F.lit(-1.0)), 999)
    crashed(other, 1000)
    staging = path.rstrip("/") + ".staging"
    assert os.path.exists(staging)

    with pytest.warns(UserWarning, match="recovered"):
        sink = BatchedCompactionSink(path, merge_every=100)
    # recovery is lazy: nothing merged (or deleted!) until a batch arrives
    assert os.path.exists(staging)
    sink(b0, 0)  # same keys as (a), real values, NEW bid numbering
    sink.flush()
    got = _snapshot(spark, path)
    want = sorted(
        map(
            tuple,
            b0.unionByName(other)
            .select(
                "symbol", "time_frame", "bucket_start", "open", "high", "low",
                "close", "volume",
            )
            .collect(),
        )
    )
    # symbols[1]'s windows were recovered (not lost), and symbols[0]'s
    # fresh values overwrote the doctored recovered ones
    assert got == want
    assert not os.path.exists(staging)
