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
