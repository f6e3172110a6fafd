"""Streaming correlation tier (round 12, r11 verdict #7): maintain the
w15 all-pairs rolling-correlation table INCREMENTALLY as candles stream
in, so the HTTP ``/api/charts/corr*`` routes read a materialized, current
overlay instead of recomputing window sums per request — the
cascade-upsert discipline applied to the engine's first cross-series
analytic.

Per micro-batch the recompute is bounded exactly like the gap fill
(``streaming.pipeline.affected_symbol_windows``): a changed close can
only live between the batch's stored-real anchors (the candle MERGE plus
any gap re-carry), and a rolling window of ``n`` buckets propagates a
changed close at bucket t into correlation rows at buckets [t, t+n-1] —
so the update span is the anchor window padded by (n-1) frame steps on
each side for input, discarding the leading pad from the output (those
rows' own windows reach before the pad and did not change). The MERGE
touches only the span's ``bucket_date`` partitions.

Row-window vs time-window: the w14/w15 window is (n-1) PRECEDING ROWS of
the pair's ALIGNED series, while the pad here is (n-1) minutes of TIME —
the two coincide exactly when each symbol's stored minute series is
contiguous across the update span, which is precisely what the pipeline's
``fill_gaps=True`` materialization guarantees (and what densely-traded
symbols give for free). Run the corr tier on a gap-filled serving table;
the replay-equals-batch test does.

Idempotency: the update derives from the STORED candle table, not from
batch contents, so a redelivered batch recomputes byte-identical rows and
the key-MERGE converges — the cascade sink's contract.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stock_chart_kafka_streams_spark.streaming.sink import (
    _bump_table_version,
    _dynamic_partition_overwrite,
    _table_exists,
)

CORR_KEY = ["sym_a", "sym_b", "bucket_start"]
CORR_PARTITION = ["bucket_date"]


def _with_corr_partition(df: DataFrame) -> DataFrame:
    return df.withColumn("bucket_date", F.to_date("bucket_start"))


def upsert_corr(spark: SparkSession, rows: DataFrame, path: str) -> None:
    """MERGE correlation rows into the materialized pair table on
    (sym_a, sym_b, bucket_start) — the candle sink's partition-scoped
    rewrite (new rows win, only touched ``bucket_date`` partitions are
    read or written), reused for the corr overlay's key shape."""
    rows = _with_corr_partition(rows)
    touched = rows.select(*CORR_PARTITION).distinct().collect()
    if not touched:
        # nothing to merge — and never bootstrap an EMPTY table (a
        # schemaless parquet dir breaks every later read)
        return
    if not _table_exists(spark, path):
        (
            rows.repartition(*CORR_PARTITION)
            .sortWithinPartitions(*CORR_KEY)
            .write.mode("overwrite")
            .partitionBy(*CORR_PARTITION)
            .parquet(path)
        )
        _bump_table_version(path)
        return
    dates = sorted({r["bucket_date"] for r in touched})
    data_cols = [c for c in rows.columns if c not in CORR_PARTITION]
    existing = spark.read.parquet(path).where(F.col("bucket_date").isin(dates))
    keep = existing.join(rows.select(*CORR_KEY), on=CORR_KEY, how="left_anti")
    merged = _with_corr_partition(
        keep.select(*data_cols).unionByName(rows.select(*data_cols))
    ).localCheckpoint(eager=True)  # materialize before overwriting the read
    with _dynamic_partition_overwrite(spark):
        # rows sort by (sym_a, sym_b, bucket_start) within each date file
        # so parquet min/max stats let a one-pair serving read skip row
        # groups — the overlay's point-read economics (compact_candles'
        # key-sort discipline)
        (
            merged.repartition(*CORR_PARTITION)
            .sortWithinPartitions(*CORR_KEY)
            .write.mode("overwrite")
            .partitionBy(*CORR_PARTITION)
            .parquet(path)
        )
    _bump_table_version(path)


def corr_batch_update(
    spark: SparkSession,
    batch: DataFrame,
    candle_path: str,
    corr_path: str,
    n: int = 20,
    frame: str = "MINUTE",
) -> None:
    """Recompute and MERGE the correlation rows this batch can have
    changed (module docstring for the bound). Runs AFTER the batch's
    candle upsert (and gap fill, if enabled) — it reads the stored
    table, never the batch's own rows."""
    from stock_chart_kafka_streams_spark.operators.windows_ext import (
        rolling_correlation_matrix,
    )
    from stock_chart_kafka_streams_spark.streaming.pipeline import (
        affected_symbol_windows,
    )

    if frame != "MINUTE":
        raise ValueError(
            "the streaming corr tier maintains the MINUTE overlay; coarse "
            "frames are cheap on-demand reads over it"
        )
    win_rows = affected_symbol_windows(spark, batch, candle_path)
    if not win_rows:
        return
    pad = _dt.timedelta(minutes=n - 1)
    out_lo = min(r["__wlo"] for r in win_rows)
    out_hi = max(r["__whi"] for r in win_rows) + pad
    in_lo = out_lo - pad
    # ALL symbols with rows inside the rectangle participate: a partner
    # with no rows here has no aligned buckets here, hence no corr rows
    # to update — partners never need enumerating up front.
    candles = (
        spark.read.parquet(candle_path)
        .where(F.col("time_frame") == "MINUTE")
        .where(
            (F.col("bucket_date") >= F.lit(in_lo.date()))
            & (F.col("bucket_date") <= F.lit(out_hi.date()))
        )
        .where(
            (F.col("bucket_start") >= F.lit(in_lo))
            & (F.col("bucket_start") <= F.lit(out_hi))
        )
    )
    # only pairs with an AFFECTED leg can have changed rows: every stored
    # pair row was written by the batch that delivered its later leg, so
    # restricting to affected-leg pairs is lossless — and it keeps the
    # per-batch window work O(affected × S), not O(S²), at wide universes
    affected = [r["symbol"] for r in win_rows]
    updates = rolling_correlation_matrix(
        candles, n=n, frame="MINUTE", pairs_with=affected
    ).where(F.col("bucket_start") >= F.lit(out_lo))
    upsert_corr(spark, updates, corr_path)


def cascade_upsert_with_corr(
    path: str,
    corr_path: str,
    frames: list[str] | None = None,
    fill_gaps: bool = True,
    corr_n: int = 20,
):
    """``foreachBatch`` hook: the full cascade sink (minute MERGE, gap
    fill, coarse rollups) followed by the incremental correlation-tier
    update — one hook wiring the whole serving surface per micro-batch.
    ``fill_gaps`` defaults True here: the corr tier's row-window ==
    time-window equivalence rides on the contiguous minute grid (module
    docstring)."""
    from stock_chart_kafka_streams_spark.streaming.pipeline import cascade_upsert

    base = cascade_upsert(path, frames, fill_gaps=fill_gaps)

    def _write(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        base(batch, batch_id)
        corr_batch_update(batch.sparkSession, batch, path, corr_path, n=corr_n)

    return _write
