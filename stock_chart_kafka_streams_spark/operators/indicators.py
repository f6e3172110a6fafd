"""Chart indicators over candle series (stock-chart extensions).

The reference serves raw candles to a charting UI; real chart backends
also compute overlay series. These are classic analytic-window operators —
exactly what SURVEY §2.6 notes the reference lacks and Spark provides
natively: simple moving average, Bollinger bands, and per-bucket returns
over each (symbol, time_frame) candle series ordered by bucket_start.

Window framing is ROWS-based (last n buckets), deterministic, and has an
exact DuckDB twin. At scale these run on the candle frame (symbols ×
buckets rows), never on raw trades; partitioning by (symbol, time_frame)
gives embarrassing parallelism across series.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SMA_WINDOW = 5


def with_indicators(candles: DataFrame, n: int = SMA_WINDOW) -> DataFrame:
    """Attach sma_n, Bollinger bands (±2 population stddev), and simple
    return vs the previous bucket to each candle row.

    The first n-1 buckets of each series use the shorter available prefix
    (standard "expanding warm-up" convention); rows with no previous
    bucket get NULL return.
    """
    series = Window.partitionBy("symbol", "time_frame").orderBy("bucket_start")
    lastn = series.rowsBetween(-(n - 1), 0)
    sma = F.avg("close").over(lastn)
    # population stddev to match DuckDB's stddev_pop exactly
    sd = F.stddev_pop("close").over(lastn)
    prev_close = F.lag("close").over(series)
    return candles.select(
        "symbol",
        "time_frame",
        "bucket_start",
        "close",
        sma.alias(f"sma_{n}"),
        (sma + F.lit(2.0) * sd).alias("bb_upper"),
        (sma - F.lit(2.0) * sd).alias("bb_lower"),
        F.when(prev_close.isNotNull(), (F.col("close") - prev_close) / prev_close)
        .alias("ret"),
    )


def with_indicators_sql(candles_sql: str, n: int = SMA_WINDOW) -> str:
    """DuckDB twin over a candle subquery with identical framing."""
    return f"""
SELECT symbol, time_frame, bucket_start, "close",
       avg("close") OVER w_n AS sma_{n},
       avg("close") OVER w_n + 2.0 * stddev_pop("close") OVER w_n AS bb_upper,
       avg("close") OVER w_n - 2.0 * stddev_pop("close") OVER w_n AS bb_lower,
       ("close" - lag("close") OVER w_s) / lag("close") OVER w_s AS ret
FROM ({candles_sql})
WINDOW
  w_n AS (PARTITION BY symbol, time_frame ORDER BY bucket_start
          ROWS BETWEEN {n - 1} PRECEDING AND CURRENT ROW),
  w_s AS (PARTITION BY symbol, time_frame ORDER BY bucket_start)
"""
