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

For a single HOT series (one symbol spanning years of minute candles, so
one window partition holds the whole history), every indicator accepts
``split_seconds`` (round 10, r9 verdict #3): rows are pre-split by a
coarse time bucket, each bucket's tail rows are REPLICATED into its
successor bucket as read-only context (depth = exactly the rows the
operator's deepest window chain can reach: n-1 for SMA/Bollinger, n for
RSI — its change column consumes one extra lag — and 2(n-1) for
drawdown's two chained windows), the windows run within (series, bucket),
and context rows are dropped from the output. Identical results by
construction; the per-task sort shrinks from the series' full history to
one bucket. The split RAISES if any bucket with a successor holds fewer
rows than the context depth (a sparser bucket cannot feed its successor's
warm-up — silent wrong values are never an option); dense candle series
satisfy this whenever split_seconds >= depth × frame seconds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SMA_WINDOW = 5

SERIES_KEY = ["symbol", "time_frame"]


def _presplit_series(
    df: DataFrame,
    depth: int,
    split_seconds: int,
    order_col: str = "bucket_start",
) -> DataFrame:
    """Tail-replication pre-split for trailing ROWS windows: assign each
    row a coarse bucket, copy every bucket's last ``depth`` rows into its
    SUCCESSOR bucket flagged ``__ctx`` true, and validate (one bounded
    aggregate + limit-1 collect) that every bucket with a successor holds
    at least ``depth`` rows. Callers partition their windows by
    (series, ``__cb``) and filter ``~__ctx`` at the end; kept rows then
    see exactly the frame the global window would have given them, and
    the (wrong, partition-truncated) values computed FOR context rows are
    never consumed by any kept row — that is what the depth contract
    guarantees.

    Persist discipline (r10 advice): the input feeds three consumers (the
    validation aggregate, the tail extraction and the base side of the
    union), so it is persisted — but only for the SCOPE of this helper,
    mirroring ``incremental_dedup``: validation materializes the cache,
    the (small — ``depth`` rows per bucket) tail frame is eagerly
    ``localCheckpoint``-ed out of it, and the cache is released before
    returning. The caller's action then recomputes the base branch once
    from source; repeated ``split_seconds`` calls in one session no
    longer accumulate cached blocks waiting on LRU eviction."""
    from stock_chart_kafka_streams_spark.functions.timeframes import coarse_bucket

    base = df.withColumn("__cb", coarse_bucket(order_col, split_seconds)).persist()
    bw = Window.partitionBy(*SERIES_KEY).orderBy("__cb")
    nxt = (
        base.groupBy(*SERIES_KEY, "__cb")
        .agg(F.count(F.lit(1)).alias("__bn"))
        .select(
            *SERIES_KEY,
            "__cb",
            "__bn",
            F.lead("__cb").over(bw).alias("__next_cb"),
        )
    )
    bad = (
        nxt.where(F.col("__next_cb").isNotNull() & (F.col("__bn") < depth))
        .limit(1)
        .collect()
    )
    if bad:
        r = bad[0]
        raise ValueError(
            f"split_seconds={split_seconds} too fine for window depth "
            f"{depth}: bucket {r['__cb']} of series "
            f"({r['symbol']}, {r['time_frame']}) has only {r['__bn']} rows "
            "but feeds a successor bucket's warm-up; use a coarser split"
        )
    wdesc = Window.partitionBy(*SERIES_KEY, "__cb").orderBy(
        F.col(order_col).desc()
    )
    tail = (
        base.withColumn("__rn", F.row_number().over(wdesc))
        .where(F.col("__rn") <= depth)
        .drop("__rn")
        .join(
            nxt.select(*SERIES_KEY, "__cb", "__next_cb"),
            on=[*SERIES_KEY, "__cb"],
        )
        .where(F.col("__next_cb").isNotNull())
        .withColumn("__cb", F.col("__next_cb"))
        .drop("__next_cb")
        .withColumn("__ctx", F.lit(True))
        # materialize the small replicated-tail frame from the cache now
        # so the cache can be released before returning (see docstring)
        .localCheckpoint(eager=True)
    )
    base.unpersist()
    return base.withColumn("__ctx", F.lit(False)).unionByName(tail)


def with_indicators(
    candles: DataFrame, n: int = SMA_WINDOW, split_seconds: int | None = None
) -> DataFrame:
    """Attach sma_n, Bollinger bands (±2 population stddev), and simple
    return vs the previous bucket to each candle row.

    The first n-1 buckets of each series use the shorter available prefix
    (standard "expanding warm-up" convention); rows with no previous
    bucket get NULL return. ``split_seconds``: hot-series pre-split
    (module docstring); context depth max(n-1, 1) — the deepest reach of
    the SMA frame and the return's lag.
    """
    if split_seconds is None:
        src, part = candles, SERIES_KEY
    else:
        src = _presplit_series(candles, max(n - 1, 1), split_seconds)
        part = SERIES_KEY + ["__cb"]
    series = Window.partitionBy(*part).orderBy("bucket_start")
    lastn = series.rowsBetween(-(n - 1), 0)
    sma = F.avg("close").over(lastn)
    # population stddev to match DuckDB's stddev_pop exactly
    sd = F.stddev_pop("close").over(lastn)
    prev_close = F.lag("close").over(series)
    out = src.select(
        "symbol",
        "time_frame",
        "bucket_start",
        "close",
        sma.alias(f"sma_{n}"),
        (sma + F.lit(2.0) * sd).alias("bb_upper"),
        (sma - F.lit(2.0) * sd).alias("bb_lower"),
        F.when(prev_close.isNotNull(), (F.col("close") - prev_close) / prev_close)
        .alias("ret"),
        *([F.col("__ctx")] if split_seconds is not None else []),
    )
    if split_seconds is not None:
        out = out.where(~F.col("__ctx")).drop("__ctx")
    return out


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


RSI_WINDOW = 14


def with_rsi(
    candles: DataFrame, n: int = RSI_WINDOW, split_seconds: int | None = None
) -> DataFrame:
    """Cutler's RSI over each (symbol, time_frame) candle series:
    ``100 - 100 / (1 + SMA(gains, n) / SMA(losses, n))`` with gains /
    losses the positive / negative parts of the close-to-close change.

    Cutler's variant (simple moving averages) rather than Wilder's
    (recursive exponential smoothing) deliberately: it is a pure
    ROWS-framed window — one shuffle on the series key, embarrassing
    parallelism across series, and an exact DuckDB twin — where Wilder's
    recursion needs either per-row iteration or a closed-form pow() chain
    whose float error diverges between engines. Documented divergence,
    same convention charting libraries offer as "Cutler RSI".

    Warm-up: the first row of a series has NULL change and drops out of
    both averages (avg skips NULLs); an all-gain window yields RSI 100
    via the zero-loss branch (DuckDB's x/0 = inf convention differs, so
    the twin branches identically). Returns (symbol, time_frame,
    bucket_start, close, rsi_n).

    ``split_seconds``: hot-series pre-split (module docstring); context
    depth n — the averaged change column reaches n-1 rows back and its
    own lag one further.
    """
    if split_seconds is None:
        src, part = candles, SERIES_KEY
    else:
        src = _presplit_series(candles, n, split_seconds)
        part = SERIES_KEY + ["__cb"]
    series = Window.partitionBy(*part).orderBy("bucket_start")
    lastn = series.rowsBetween(-(n - 1), 0)
    chg = F.col("close") - F.lag("close").over(series)
    with_chg = src.select(
        "symbol",
        "time_frame",
        "bucket_start",
        "close",
        chg.alias("__chg"),
        *(
            [F.col("__cb"), F.col("__ctx")]
            if split_seconds is not None
            else []
        ),
    )
    gain = F.when(F.col("__chg") > 0, F.col("__chg")).otherwise(
        F.when(F.col("__chg").isNotNull(), F.lit(0.0))
    )
    loss = F.when(F.col("__chg") < 0, -F.col("__chg")).otherwise(
        F.when(F.col("__chg").isNotNull(), F.lit(0.0))
    )
    avg_gain = F.avg(gain).over(lastn)
    avg_loss = F.avg(loss).over(lastn)
    rsi = F.when(avg_loss == 0, F.when(avg_gain.isNotNull(), F.lit(100.0))).otherwise(
        F.lit(100.0) - F.lit(100.0) / (F.lit(1.0) + avg_gain / avg_loss)
    )
    out = with_chg.select(
        "symbol",
        "time_frame",
        "bucket_start",
        "close",
        rsi.alias(f"rsi_{n}"),
        *([F.col("__ctx")] if split_seconds is not None else []),
    )
    if split_seconds is not None:
        out = out.where(~F.col("__ctx")).drop("__ctx")
    return out


def with_rsi_sql(candles_sql: str, n: int = RSI_WINDOW) -> str:
    """DuckDB twin of ``with_rsi`` (same framing, same zero-loss branch)."""
    return f"""
WITH chg AS (
    SELECT symbol, time_frame, bucket_start, "close",
           "close" - lag("close") OVER (
               PARTITION BY symbol, time_frame ORDER BY bucket_start
           ) AS c
    FROM ({candles_sql})
),
parts AS (
    SELECT *,
           CASE WHEN c > 0 THEN c WHEN c IS NOT NULL THEN 0.0 END AS gain,
           CASE WHEN c < 0 THEN -c WHEN c IS NOT NULL THEN 0.0 END AS loss
    FROM chg
),
agg AS (
    SELECT symbol, time_frame, bucket_start, "close",
           avg(gain) OVER w_n AS ag, avg(loss) OVER w_n AS al
    FROM parts
    WINDOW w_n AS (PARTITION BY symbol, time_frame ORDER BY bucket_start
                   ROWS BETWEEN {n - 1} PRECEDING AND CURRENT ROW)
)
SELECT symbol, time_frame, bucket_start, "close",
       CASE WHEN al = 0 THEN (CASE WHEN ag IS NOT NULL THEN 100.0 END)
            ELSE 100.0 - 100.0 / (1.0 + ag / al) END AS rsi_{n}
FROM agg
"""


DRAWDOWN_WINDOW = 20


def with_drawdown(
    candles: DataFrame, n: int = DRAWDOWN_WINDOW, split_seconds: int | None = None
) -> DataFrame:
    """Rolling drawdown per candle series: current close vs the running
    peak of the last ``n`` closes (``close / max(close) - 1``, <= 0) and
    the worst (minimum) drawdown seen over that window — the standard
    risk overlay a charting backend serves next to Bollinger bands.

    Pure ROWS-framed windows over the series key: ``max`` for the peak
    and a second windowed ``min`` over the per-row drawdown. All-double
    arithmetic identical in both engines. Returns (symbol, time_frame,
    bucket_start, close, peak_n, drawdown, max_drawdown_n).

    ``split_seconds``: hot-series pre-split (module docstring); context
    depth 2(n-1) — the worst-drawdown window reads drawdowns n-1 back,
    each of which reads closes another n-1 back.
    """
    if split_seconds is None:
        src, part = candles, SERIES_KEY
    else:
        src = _presplit_series(candles, 2 * (n - 1), split_seconds)
        part = SERIES_KEY + ["__cb"]
    series = Window.partitionBy(*part).orderBy("bucket_start")
    lastn = series.rowsBetween(-(n - 1), 0)
    peak = F.max("close").over(lastn)
    base = src.select(
        "symbol",
        "time_frame",
        "bucket_start",
        "close",
        peak.alias("__peak"),
        *(
            [F.col("__cb"), F.col("__ctx")]
            if split_seconds is not None
            else []
        ),
    ).withColumn("drawdown", F.col("close") / F.col("__peak") - F.lit(1.0))
    worst = F.min("drawdown").over(
        Window.partitionBy(*part)
        .orderBy("bucket_start")
        .rowsBetween(-(n - 1), 0)
    )
    out = base.select(
        "symbol",
        "time_frame",
        "bucket_start",
        "close",
        F.col("__peak").alias(f"peak_{n}"),
        "drawdown",
        worst.alias(f"max_drawdown_{n}"),
        *([F.col("__ctx")] if split_seconds is not None else []),
    )
    if split_seconds is not None:
        out = out.where(~F.col("__ctx")).drop("__ctx")
    return out


def with_drawdown_sql(candles_sql: str, n: int = DRAWDOWN_WINDOW) -> str:
    """DuckDB twin of ``with_drawdown`` (same framing)."""
    return f"""
WITH base AS (
    SELECT symbol, time_frame, bucket_start, "close",
           max("close") OVER w_n AS peak_{n}
    FROM ({candles_sql})
    WINDOW w_n AS (PARTITION BY symbol, time_frame ORDER BY bucket_start
                   ROWS BETWEEN {n - 1} PRECEDING AND CURRENT ROW)
),
dd AS (
    SELECT *, "close" / peak_{n} - 1.0 AS drawdown FROM base
)
SELECT symbol, time_frame, bucket_start, "close", peak_{n}, drawdown,
       min(drawdown) OVER w_n AS max_drawdown_{n}
FROM dd
WINDOW w_n AS (PARTITION BY symbol, time_frame ORDER BY bucket_start
               ROWS BETWEEN {n - 1} PRECEDING AND CURRENT ROW)
"""
