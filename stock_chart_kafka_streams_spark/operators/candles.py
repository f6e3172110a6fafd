"""Batch candlestick aggregation (reference SURVEY.md §2.4 A1-A7).

The reference's core dataflow — group trades by symbol, bucket into
tumbling event-time windows, reduce to OHLCV
(``stream/CandlestickAggregator.kt:92-102`` and the hour/day/month cascades
``:120-184``) — expressed as single declarative DataFrame aggregations.

Scale notes (100 TB posture):
- ``candles()`` is ONE shuffle on (symbol, bucket_start), with map-side
  partial aggregation (all five aggregates are built-in, codegen'd JVM
  expressions). There are at most symbols × buckets output rows, so the
  reduce side is small regardless of input volume.
- ``multi_frame_candles(cascade=True)`` reads and shuffles the raw trades
  ONCE (to minute candles) and derives hour/day/month by re-aggregating the
  tiny candle frame — the reference's cascade optimization
  (``Readme.md:31-33``), valid because OHLCV merge is associative
  (SURVEY §2.7 Q6). At 100 TB this is the only sane plan: 1 full-data
  shuffle instead of 4.
- Hot symbols skew the shuffle; the groupBy key includes bucket_start,
  which spreads one symbol across all its time buckets — natural salting.
  AQE skew handling covers the rest (session.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from stock_chart_kafka_streams_spark.functions.ohlcv import merge_aggs, ohlcv_aggs
from stock_chart_kafka_streams_spark.functions.timeframes import (
    FRAME_ORDER,
    FRAMES,
    bucket_end,
    bucket_start,
    check_frame,
    frame_minutes,
)
from stock_chart_kafka_streams_spark.schemas import CANDLE_COLUMNS


def _finalize(df: DataFrame, frame: str) -> DataFrame:
    """Attach time_frame tag + bucket_end and order columns canonically."""
    return df.withColumns(
        {
            "time_frame": F.lit(frame),
            "bucket_end": bucket_end("bucket_start", frame),
        }
    ).select(*CANDLE_COLUMNS)


def candles(trades: DataFrame, frame: str = "MINUTE") -> DataFrame:
    """Aggregate raw trades into one candle per (symbol, frame bucket).

    Reference semantics A3 with the Q1 decision (open/close by event time):
    open = price of earliest trade, close = price of latest, high/low =
    max/min price, volume = Σ quantity. Buckets are ``date_trunc`` tumbling
    windows — equivalent to ``window(ts, duration)`` for fixed frames and
    the only correct form for calendar MONTH. Since round 10 ``frame``
    also accepts ``"{n}MIN"`` names (epoch-anchored n-minute grids,
    c17): ``candles(trades, "5MIN")`` equals
    ``candles_n_minutes(trades, 5)`` — tested.
    """
    check_frame(frame)
    grouped = trades.groupBy(
        "symbol", bucket_start("ts", frame).alias("bucket_start")
    ).agg(*ohlcv_aggs())
    return _finalize(grouped, frame)


def candles_salted(
    trades: DataFrame, frame: str = "MINUTE", salt_buckets: int = 16
) -> DataFrame:
    """Two-phase OHLCV for pathologically hot (symbol, bucket) keys.

    Measured honesty: for THIS aggregation salting is usually unnecessary —
    OHLCV is algebraic, so Spark's map-side partial aggregation already
    collapses a hot key to one partial row per input partition (a 5M-row
    95%-one-key local test ran FASTER unsalted: 0.8s vs 1.4s). Salting
    earns its keep when partial aggregation cannot help: holistic
    aggregates bolted onto the candle frame (collect_list of trades, exact
    per-bucket medians), or partial-agg-disabled plans. Phase 1 aggregates
    (symbol, bucket, salt) partials carrying explicit first/last event
    times; phase 2 merges the ≤ salt_buckets partials per key. Exactly
    equal to ``candles()`` by associativity (tested).
    """
    if frame not in FRAMES:
        raise ValueError(f"unknown time frame {frame!r}; expected one of {list(FRAMES)}")
    salt = F.pmod(F.xxhash64("ts", "price", "quantity"), F.lit(salt_buckets))
    partial = (
        trades.withColumn("__salt", salt)
        .groupBy("symbol", bucket_start("ts", frame).alias("bucket_start"), "__salt")
        .agg(
            F.min_by("price", "ts").alias("p_open"),
            F.max("price").alias("p_high"),
            F.min("price").alias("p_low"),
            F.max_by("price", "ts").alias("p_close"),
            F.sum("quantity").alias("p_volume"),
            F.min("ts").alias("p_first_ts"),
            F.max("ts").alias("p_last_ts"),
        )
    )
    merged = partial.groupBy("symbol", "bucket_start").agg(
        F.min_by("p_open", "p_first_ts").alias("open"),
        F.max("p_high").alias("high"),
        F.min("p_low").alias("low"),
        F.max_by("p_close", "p_last_ts").alias("close"),
        F.sum("p_volume").alias("volume"),
    )
    return _finalize(merged, frame)


def candles_n_minutes(trades: DataFrame, n_minutes: int) -> DataFrame:
    """Candles on an ARBITRARY n-minute tumbling grid (c17, round 10) —
    the 5m/15m/4h frames every real charting backend serves next to the
    reference's fixed MINUTE/HOUR/DAY/MONTH set (``TimeFrame.kt`` has no
    such notion; this is a Spark-side extension, same OHLCV semantics).

    Buckets anchor at the epoch: ``floor(epoch_seconds / 60n) * 60n`` —
    identical to ``window(ts, "n minutes")`` for these fixed-width frames
    but cheaper (no window struct) and trivially IEEE-replayable in the
    DuckDB twin. Same single (symbol, bucket) shuffle with map-side
    partial aggregation as ``candles()``; ``time_frame`` is tagged
    ``"{n}MIN"``. Rollup compatibility: an n-minute frame where 60 % n
    == 0 merges exactly into the HOUR frame (merge associativity,
    SURVEY §2.7 Q6) — tested.

    Since 'nMIN' became a first-class frame name this is a pure alias of
    ``candles(trades, f"{n}MIN")`` (ONE implementation of the grid, in
    functions/timeframes.py — r10 review #5); kept for the typed-int
    API and the c17 attribution point."""
    if n_minutes < 1:
        raise ValueError(f"n_minutes must be >= 1, got {n_minutes}")
    return candles(trades, f"{int(n_minutes)}MIN")


def candles_n_minutes_sql(n_minutes: int, table: str = "trades") -> str:
    """DuckDB twin of ``candles_n_minutes`` over a trades relation
    exposing (symbol, ts, price, quantity)."""
    if n_minutes < 1:
        raise ValueError(f"n_minutes must be >= 1, got {n_minutes}")
    width = 60 * int(n_minutes)
    return f"""
SELECT symbol,
       '{int(n_minutes)}MIN' AS time_frame,
       CAST(to_timestamp(CAST(floor(epoch(ts) / {width}) * {width} AS BIGINT)) AS TIMESTAMP) AS bucket_start,
       CAST(to_timestamp(CAST(floor(epoch(ts) / {width}) * {width} + {width} AS BIGINT)) AS TIMESTAMP) AS bucket_end,
       min_by(price, ts) AS "open",
       max(price) AS high,
       min(price) AS low,
       max_by(price, ts) AS "close",
       CAST(sum(quantity) AS BIGINT) AS volume
FROM {table}
GROUP BY symbol, floor(epoch(ts) / {width})
"""


def rollup_candles(finer: DataFrame, frame: str) -> DataFrame:
    """Merge finer-frame candles into ``frame`` candles (A5/A6/A7).

    open/close come from the earliest/latest sub-bucket (min_by/max_by on
    bucket_start); high/low/volume fold with max/min/sum. Associativity
    makes this equal to ``candles(trades, frame)`` — checked by C5 in the
    oracle harness.
    """
    grouped = finer.groupBy(
        "symbol", bucket_start("bucket_start", frame).alias("bucket_start")
    ).agg(*merge_aggs(order_col="bucket_start"))
    return _finalize(grouped, frame)


def multi_frame_candles(
    trades: DataFrame,
    frames: list[str] | None = None,
    cascade: bool = True,
    persist_base: bool = True,
) -> DataFrame:
    """All requested frames as one candle DataFrame.

    cascade=True (default): aggregate trades to the finest requested frame
    once, then roll up — one full-data shuffle total. cascade=False:
    aggregate raw trades per frame independently (4 shuffles; useful to
    cross-check associativity).

    persist_base: Spark does not share subplans across union branches (the
    executed plan shows 4 source scans and 0 ReusedExchange), so without
    caching the cascade re-reads and re-aggregates the raw trades once per
    frame. Persisting the finest-frame candles cuts that to ONE source scan
    plus rollups over ≤ symbols × buckets cached rows — immaterial on warm
    small inputs, decisive when the source is a large on-disk table.
    """
    requested = frames or FRAME_ORDER
    unknown = [f for f in requested if f not in FRAME_ORDER]
    if unknown:
        # nMIN frames are candles()-level citizens but have no slot in the
        # reference's cascade order — silently dropping them here would
        # hand back a frame set the caller did not ask for
        raise ValueError(
            f"multi_frame_candles supports the cascade frames {FRAME_ORDER}; "
            f"got {unknown} — build n-minute frames with candles(trades, "
            "'nMIN') and union them explicitly"
        )
    frames = [f for f in FRAME_ORDER if f in requested]
    if not frames:
        raise ValueError("no valid frames requested")

    finest = frames[0]
    base = candles(trades, finest)
    out = [base]
    if cascade:
        if len(frames) > 1 and persist_base:
            from pyspark.storagelevel import StorageLevel

            base = base.persist(StorageLevel.MEMORY_AND_DISK)
            out = [base]
        # Each coarser frame rolls up from the finest — candle frames are
        # tiny (≤ symbols × buckets rows), so these shuffles are noise.
        for f in frames[1:]:
            out.append(rollup_candles(base, f))
    else:
        out.extend(candles(trades, f) for f in frames[1:])
    result = out[0]
    for df in out[1:]:
        result = result.unionByName(df)
    return result


def fill_candle_gaps(
    candle_rows: DataFrame,
    frame: str = "MINUTE",
    split_seconds: int | None = None,
) -> DataFrame:
    """Gap-fill a (possibly sparse) candle series: for every symbol, emit
    one row per ``frame`` bucket between that symbol's first and last
    candle, synthesizing a FLAT candle (open=high=low=close = previous
    real close, volume 0, ``is_gap`` true) for buckets with no trades —
    the standard charting semantics a sparse serving store cannot serve
    directly (the reference's key-enumeration range read simply returns
    holes; a chart wants a continuous series).

    Scale shape: the grid is ``symbols × buckets-in-range`` rows —
    OUTPUT-sized, independent of trade volume — built from one per-symbol
    min/max aggregate + ``explode(sequence(...))``; the join back to real
    candles is an equi-join on (symbol, bucket_start); the forward-fill
    is ONE window ordered within each symbol partition (symbol
    cardinality is the parallelism, like the as-of join). For a single
    hot symbol spanning years of minutes, ``split_seconds`` (round 10,
    r9 verdict #3) automates the coarse-bucket pre-split: the grid is
    bucketed by ``floor(epoch / split)``, the forward-fill window runs
    within (symbol, bucket), and the carry ACROSS buckets comes from a
    bucket-granularity window over one-row-per-bucket last-real-close
    aggregates (strictly earlier buckets only) — identical output by
    construction, per-task sort shrunk from the symbol's full range to
    one bucket. Calendar MONTH grids use Spark's native month-interval
    sequence.

    Input needs (symbol, bucket_start, open, high, low, close, volume);
    leading buckets before a symbol's first real candle cannot exist
    (the grid starts AT the first candle). Output is CANDLE_COLUMNS +
    ``is_gap``."""
    check_frame(frame)
    nmin = frame_minutes(frame)
    if nmin is not None:
        on_grid = (
            F.pmod(F.unix_timestamp(F.col("bucket_start")), F.lit(60 * nmin)) == 0
        )
        step = f"interval {60 * nmin} seconds"
    else:
        unit = FRAMES[frame][0]
        on_grid = F.col("bucket_start") == F.date_trunc(unit, "bucket_start")
        step = f"interval 1 {unit}"
    # misaligned input is an ERROR, not silent corruption (r9 review): a
    # bucket_start off the frame grid would never match the lo-anchored
    # sequence, so the real candle would vanish behind a synthetic flat
    # gap at a stale close. Every row must sit on its own truncation.
    aligned_start = F.when(on_grid, F.col("bucket_start")).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"fill_candle_gaps: bucket_start off the {frame} grid: "),
                F.col("bucket_start").cast("string"),
            )
        )
    )
    candle_rows = candle_rows.withColumn("bucket_start", aligned_start)
    bounds = candle_rows.groupBy("symbol").agg(
        F.min("bucket_start").alias("__lo"), F.max("bucket_start").alias("__hi")
    )
    grid = bounds.select(
        "symbol",
        F.explode(
            F.expr(f"sequence(__lo, __hi, {step})")
        ).alias("bucket_start"),
    )
    joined = grid.join(
        candle_rows.select(
            "symbol", "bucket_start", "open", "high", "low", "close", "volume"
        ),
        on=["symbol", "bucket_start"],
        how="left",
    )
    if split_seconds is not None:
        from stock_chart_kafka_streams_spark.functions.timeframes import (
            coarse_bucket,
        )

        joined = joined.withColumn(
            "__cb", coarse_bucket("bucket_start", split_seconds)
        )
        # carry-in per (symbol, bucket): last REAL close of any strictly
        # earlier bucket — computed over one-row-per-bucket aggregates,
        # so the cross-bucket window is bucket-count-sized, never
        # row-sized.
        per_bucket = (
            joined.where(F.col("close").isNotNull())
            .groupBy("symbol", "__cb")
            .agg(F.max_by("close", "bucket_start").alias("__lc"))
        )
        bwin = (
            Window.partitionBy("symbol")
            .orderBy("__cb")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carry = (
            joined.select("symbol", "__cb")
            .distinct()
            .join(per_bucket, on=["symbol", "__cb"], how="left")
            .select(
                "symbol",
                "__cb",
                F.last("__lc", ignorenulls=True).over(bwin).alias("__carry"),
            )
        )
        joined = joined.join(carry, on=["symbol", "__cb"], how="left")
        w = (
            Window.partitionBy("symbol", "__cb")
            .orderBy("bucket_start")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        ff = F.coalesce(
            F.last("close", ignorenulls=True).over(w), F.col("__carry")
        )
    else:
        w = (
            Window.partitionBy("symbol")
            .orderBy("bucket_start")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        ff = F.last("close", ignorenulls=True).over(w)
    return joined.select(
        "symbol",
        F.lit(frame).alias("time_frame"),
        "bucket_start",
        bucket_end("bucket_start", frame).alias("bucket_end"),
        F.coalesce("open", ff).alias("open"),
        F.coalesce("high", ff).alias("high"),
        F.coalesce("low", ff).alias("low"),
        F.coalesce("close", ff).alias("close"),
        F.coalesce(F.col("volume"), F.lit(0).cast("long")).alias("volume"),
        F.col("open").isNull().alias("is_gap"),
    )


def fill_candle_gaps_sql(inner_sql: str, frame: str = "MINUTE") -> str:
    """DuckDB twin of ``fill_candle_gaps`` over an inner candle query
    (a full SELECT producing symbol/bucket_start/OHLCV rows). Same grid,
    same IGNORE NULLS forward-fill, same half-open bucket_end — for the
    FRAMES units AND the 'nMIN' epoch-anchored grids (r10 review #6:
    the engine accepted nMIN but the twin rejected it)."""
    check_frame(frame)
    nmin = frame_minutes(frame)
    if nmin is not None:
        width = 60 * nmin
        on_grid = f"CAST(epoch(bucket_start) AS BIGINT) % {width} = 0"
        step = f"INTERVAL {width} seconds"
    else:
        unit = FRAMES[frame][0]
        on_grid = f"bucket_start = date_trunc('{unit}', bucket_start)"
        step = f"INTERVAL 1 {unit}"
    return f"""
WITH c0 AS ({inner_sql}),
c AS (
    SELECT * REPLACE (
        CASE WHEN {on_grid}
             THEN bucket_start
             ELSE error('fill_candle_gaps: bucket_start off the {frame} grid')
        END AS bucket_start)
    FROM c0
),
b AS (
    SELECT symbol, min(bucket_start) AS lo, max(bucket_start) AS hi
    FROM c GROUP BY symbol
),
grid AS (
    SELECT symbol,
           unnest(generate_series(lo, hi, {step})) AS bucket_start
    FROM b
),
j AS (
    SELECT g.symbol, g.bucket_start,
           c."open", c.high, c.low, c."close", c.volume
    FROM grid g
    LEFT JOIN c ON c.symbol = g.symbol AND c.bucket_start = g.bucket_start
),
f AS (
    SELECT *,
           last_value("close" IGNORE NULLS) OVER (
               PARTITION BY symbol ORDER BY bucket_start
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS ff
    FROM j
)
SELECT symbol,
       '{frame}' AS time_frame,
       CAST(bucket_start AS TIMESTAMP) AS bucket_start,
       CAST(bucket_start + {step} AS TIMESTAMP) AS bucket_end,
       COALESCE("open", ff) AS "open",
       COALESCE(high, ff) AS high,
       COALESCE(low, ff) AS low,
       COALESCE("close", ff) AS "close",
       CAST(COALESCE(volume, 0) AS BIGINT) AS volume,
       "open" IS NULL AS is_gap
FROM f
"""
