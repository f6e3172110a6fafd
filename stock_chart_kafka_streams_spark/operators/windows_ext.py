"""Extended windowing operators: session, hopping/sliding, cube summaries.

The reference's docs discuss hopping and session windows but its topology
only ever uses tumbling windows (``KafkaStreams_SpringBatch비교.md:42-49``,
SURVEY §2.6). Spark provides all three natively; these wrappers pin exact,
oracle-checkable semantics:

- **session_candles**: gap-based sessions per symbol
  (``F.session_window``); a session ends ``gap`` after its last event.
  SQL twin: classic gaps-and-islands (lag + running sum of gap breaks).
- **hopping_candles**: overlapping fixed windows
  (``F.window(ts, size, slide)``); each event lands in size/slide
  windows. SQL twin: explode the window-start offsets and re-bucket.
- **volume_cube**: grouping-set subtotals over (symbol, day) —
  ``cube()`` with a ``grouping_id`` bitmask, matching GROUP BY CUBE +
  GROUPING() in the oracle.

All are single-shuffle JVM aggregations; hopping multiplies input rows by
size/slide before the shuffle (the standard cost of overlap — at scale
prefer the tumbling cascade plus a rolling window over candles when the
overlap factor is large).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stock_chart_kafka_streams_spark.functions.ohlcv import ohlcv_aggs

SESSION_GAP_MINUTES = 30
HOP_SIZE = "1 hour"
HOP_SLIDE = "15 minutes"


def session_candles(trades: DataFrame, gap_minutes: int = SESSION_GAP_MINUTES) -> DataFrame:
    """One row per (symbol, activity session): a session groups trades
    whose gaps are < ``gap_minutes``; session_end = last trade + gap."""
    return (
        trades.groupBy(
            "symbol", F.session_window("ts", f"{gap_minutes} minutes").alias("w")
        )
        .agg(
            F.count("*").alias("n_trades"),
            F.sum("quantity").alias("volume"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        .select(
            "symbol",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_trades",
            "volume",
            "first_ts",
            "last_ts",
        )
    )


def session_candles_sql(trades_cte: str, gap_minutes: int = SESSION_GAP_MINUTES) -> str:
    """Gaps-and-islands twin: Spark's session start = first event, end =
    last event + gap.

    Break comparator is strictly ``> gap``: Spark 4.1 MERGES an event
    arriving exactly ``gap`` after the previous one into the same session
    (pinned by tests/test_streaming_sessions.py::
    test_session_exact_gap_boundary), so only a strictly-greater gap
    starts a new island."""
    return f"""
WITH {trades_cte},
ordered AS (
    SELECT symbol, quantity, ts,
           CASE WHEN ts - lag(ts) OVER (PARTITION BY symbol ORDER BY ts)
                     > INTERVAL {gap_minutes} MINUTE
                OR lag(ts) OVER (PARTITION BY symbol ORDER BY ts) IS NULL
                THEN 1 ELSE 0 END AS brk
    FROM trades
),
islands AS (
    SELECT *, sum(brk) OVER (
        PARTITION BY symbol ORDER BY ts
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS sid
    FROM ordered
)
SELECT symbol,
       min(ts) AS session_start,
       max(ts) + INTERVAL {gap_minutes} MINUTE AS session_end,
       CAST(count(*) AS BIGINT) AS n_trades,
       CAST(sum(quantity) AS BIGINT) AS volume,
       min(ts) AS first_ts,
       max(ts) AS last_ts
FROM islands
GROUP BY symbol, sid
"""


def hopping_candles(
    trades: DataFrame, size: str = HOP_SIZE, slide: str = HOP_SLIDE
) -> DataFrame:
    """OHLCV per overlapping (symbol, hopping window)."""
    return (
        trades.groupBy("symbol", F.window("ts", size, slide).alias("w"))
        .agg(*ohlcv_aggs())
        .select(
            "symbol",
            F.col("w.start").alias("bucket_start"),
            F.col("w.end").alias("bucket_end"),
            "open",
            "high",
            "low",
            "close",
            "volume",
        )
    )


def hopping_candles_sql(
    trades_cte: str, size_minutes: int = 60, slide_minutes: int = 15
) -> str:
    """Twin: each event belongs to size/slide windows whose epoch-aligned
    starts are floor_slide(ts) - j*slide for j in 0..(size/slide - 1)."""
    n = size_minutes // slide_minutes
    s = slide_minutes * 60
    return f"""
WITH {trades_cte},
exploded AS (
    SELECT t.*,
           CAST(to_timestamp(CAST(floor(epoch(ts) / {s}) AS BIGINT) * {s}
                             - j * {s}) AS TIMESTAMP) AS bucket_start
    FROM trades t, unnest(range(0, {n})) AS u(j)
)
SELECT symbol,
       bucket_start,
       bucket_start + INTERVAL {size_minutes} MINUTE AS bucket_end,
       arg_min(price, ts) AS "open",
       max(price) AS high,
       min(price) AS low,
       arg_max(price, ts) AS "close",
       CAST(sum(quantity) AS BIGINT) AS volume
FROM exploded
GROUP BY symbol, bucket_start
"""


def volume_cube(trades: DataFrame) -> DataFrame:
    """Volume subtotals over cube(symbol, trade day): per (symbol, day),
    per symbol, per day, and grand total, tagged with grouping_id."""
    day = F.date_trunc("day", "ts").alias("day")
    return trades.cube("symbol", day).agg(
        # grouping_id() is only legal inside the cube aggregation itself
        F.grouping_id().alias("grp"),
        F.sum("quantity").alias("volume"),
        F.count("*").alias("n_trades"),
    )


def volume_cube_sql(trades_cte: str) -> str:
    return f"""
WITH {trades_cte}
SELECT symbol,
       CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       CAST(GROUPING(symbol) * 2 + GROUPING(date_trunc('day', ts)) AS BIGINT) AS grp,
       CAST(sum(quantity) AS BIGINT) AS volume,
       CAST(count(*) AS BIGINT) AS n_trades
FROM trades
GROUP BY CUBE (symbol, date_trunc('day', ts))
"""


def top_volume_days(trades: DataFrame, n: int = 3) -> DataFrame:
    """Top-N trading days per symbol by total volume, with their rank — the
    ranking/analytic window-function surface the reference lacks entirely
    (SURVEY §2.6: no rank/lag/top-k anywhere).

    Two-stage plan, both stages JVM-side: a partial-aggregating groupBy to
    one row per (symbol, day), then row_number over a by-symbol window.
    The window partitions by symbol AFTER the day-rollup, so each task
    sorts at most days-per-symbol rows — at 100 TB the heavy input never
    passes through a window operator, only the ~days×symbols rollup does.
    Ties break deterministically on earlier day first.
    """
    from pyspark.sql.window import Window

    day = F.date_trunc("day", "ts").alias("day")
    daily = trades.groupBy("symbol", day).agg(
        F.sum("quantity").alias("volume"),
        F.count("*").alias("n_trades"),
    )
    w = Window.partitionBy("symbol").orderBy(F.col("volume").desc(), F.col("day").asc())
    return daily.withColumn("rnk", F.row_number().over(w)).where(F.col("rnk") <= n)


def top_volume_days_sql(trades_cte: str, n: int = 3) -> str:
    return f"""
WITH {trades_cte},
daily AS (
    SELECT symbol,
           CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           CAST(sum(quantity) AS BIGINT) AS volume,
           CAST(count(*) AS BIGINT) AS n_trades
    FROM trades GROUP BY 1, 2
)
SELECT * FROM (
    SELECT daily.*,
           CAST(row_number() OVER (
               PARTITION BY symbol ORDER BY volume DESC, day ASC
           ) AS INT) AS rnk
    FROM daily
) WHERE rnk <= {n}
"""


def volume_grouping_sets(trades: DataFrame) -> DataFrame:
    """Explicit GROUPING SETS ((symbol), (day)) — per-symbol totals and
    per-day totals in ONE shuffle, without cube's (symbol, day) and ()
    sets. The third grouping-set shape alongside w3's CUBE and w6's
    ROLLUP; planned by Spark as a single Expand + hash aggregate."""
    import uuid

    spark = trades.sparkSession
    # Per-call unique view name: a fixed name would let concurrent or
    # nested calls in one session clobber each other's input. spark.sql
    # resolves the relation eagerly, so the view can be dropped right away.
    view = f"__gs_trades_{uuid.uuid4().hex}"
    trades.createOrReplaceTempView(view)
    try:
        return spark.sql(
            f"""
            SELECT symbol,
                   date_trunc('day', ts) AS day,
                   CAST(grouping(symbol) * 2 + grouping(date_trunc('day', ts)) AS BIGINT) AS grp,
                   sum(quantity) AS volume,
                   count(*) AS n_trades
            FROM {view}
            GROUP BY GROUPING SETS ((symbol), (date_trunc('day', ts)))
            """
        )
    finally:
        spark.catalog.dropTempView(view)


def volume_grouping_sets_sql(trades_cte: str) -> str:
    return f"""
WITH {trades_cte}
SELECT symbol,
       CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       CAST(GROUPING(symbol) * 2 + GROUPING(date_trunc('day', ts)) AS BIGINT) AS grp,
       CAST(sum(quantity) AS BIGINT) AS volume,
       CAST(count(*) AS BIGINT) AS n_trades
FROM trades
GROUP BY GROUPING SETS ((symbol), (date_trunc('day', ts)))
"""


PIVOT_SYMBOLS = ["click", "error", "purchase", "signup", "view"]


def volume_pivot(trades: DataFrame, symbols: list[str] | None = None) -> DataFrame:
    """PIVOT: one row per day, one volume column per symbol — the
    wide-format reshape (reporting/ML feature matrices) the reference's
    key-value store can't express.

    The symbol list is EXPLICIT: with it, Spark plans pivot as a single
    groupBy with one conditional aggregate per value (one shuffle); without
    it, Spark first runs a distinct scan to discover values (an extra job
    over the full input — never acceptable at 100 TB)."""
    symbols = symbols if symbols is not None else PIVOT_SYMBOLS
    day = F.date_trunc("day", "ts").alias("day")
    return (
        trades.groupBy(day)
        .pivot("symbol", symbols)
        .agg(F.sum("quantity"))
    )


def volume_pivot_sql(trades_cte: str, symbols: list[str] | None = None) -> str:
    symbols = symbols if symbols is not None else PIVOT_SYMBOLS
    cols = ",\n       ".join(
        f"CAST(sum(CASE WHEN symbol = '{s}' THEN quantity END) AS BIGINT) AS \"{s}\""
        for s in symbols
    )
    return f"""
WITH {trades_cte}
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       {cols}
FROM trades
GROUP BY date_trunc('day', ts)
"""


def approx_daily_stats(trades: DataFrame, rsd: float = 0.02) -> DataFrame:
    """Sketch-based daily statistics: HyperLogLog++ distinct prices and
    approximate percentiles. The constant-memory path for 100 TB cardinality
    and quantile estimation (exact variants: daily_price_stats). No SQL
    oracle — sketches are implementation-defined; accuracy is bounded by
    tests against the exact aggregates instead."""
    day = F.date_trunc("day", "ts").alias("day")
    return trades.groupBy("symbol", day).agg(
        F.approx_count_distinct("price", rsd).alias("approx_distinct_prices"),
        F.percentile_approx("price", F.lit(0.5), F.lit(10_000)).alias(
            "approx_median_price"
        ),
        F.count("*").alias("n_trades"),
    )


# KMV (k-minimum-values) sketch parameters: k controls the distinct-count
# estimator's error (~1/sqrt(k-2) ≈ 12.7% at k=64); sample_mod=10 keeps a
# deterministic ~10% row sample for the sampled median.
KMV_K = 64
KMV_SAMPLE_MOD = 10


def _hash32(col) -> F.Column:
    """First 32 bits of md5 as BIGINT — same construction as the dedup
    base hash, reproducible verbatim in DuckDB as
    ``('0x' || substr(md5(x), 1, 8))::BIGINT``."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def kmv_daily_stats(
    trades: DataFrame, k: int = KMV_K, sample_mod: int = KMV_SAMPLE_MOD
) -> DataFrame:
    """Sketch-based daily statistics with DETERMINISTIC, SQL-expressible
    sketches, so the full result is oracle-checkable cross-engine (unlike
    ``approx_daily_stats``'s implementation-defined HLL++/GK sketches):

    - **KMV distinct estimate** of price ticks (``floor(price*100)`` —
      integral so both engines hash identical strings): per (symbol, day),
      hash each distinct tick to 32 bits, keep the k smallest, estimate
      ``(k-1) * 2^32 / h_k``; exact count when under k. Same constant-
      memory-per-group scaling argument as HLL (state is k longs however
      many distinct values stream past), with ~1/sqrt(k-2) relative error.
    - **deterministic sample median**: rows whose (symbol, epoch-micros)
      hash lands in 1/sample_mod of the space form the sample; exact
      median over it. The sample is a function of the data, not an RNG, so
      Spark and DuckDB select identical rows.

    Plan shape: three hash-aggregations plus one thin window over the
    per-group distinct ticks, all partitioned on (symbol, day); the joins
    are between already-aggregated frames (AQE broadcasts them).
    Accuracy vs the exact aggregates is bounded in
    tests/test_approx_and_hopping.py."""
    from pyspark.sql.window import Window

    base = trades.select(
        "symbol",
        F.date_trunc("day", "ts").alias("day"),
        F.floor(F.col("price") * F.lit(100.0)).cast("long").alias("tick"),
        "price",
        F.unix_micros("ts").alias("eus"),
    )
    dh = (
        base.select("symbol", "day", "tick")
        .distinct()
        .withColumn("h", _hash32(F.col("tick").cast("string")))
    )
    w = Window.partitionBy("symbol", "day").orderBy("h")
    kmv = (
        dh.withColumn("rn", F.row_number().over(w))
        .groupBy("symbol", "day")
        .agg(
            F.count("*").alias("n_ticks"),
            F.max(F.when(F.col("rn") <= k, F.col("h"))).alias("kth"),
        )
        .select(
            "symbol",
            "day",
            F.when(F.col("n_ticks") < k, F.col("n_ticks").cast("double"))
            .otherwise(
                F.lit(float(k - 1)) * F.lit(4294967296.0)
                / F.col("kth").cast("double")
            )
            .alias("kmv_distinct_ticks"),
        )
    )
    # counts + deterministic sample fused into ONE aggregation (aggregate
    # functions skip nulls in both engines, so the conditional median IS
    # the sample median): the whole operator is two scans of the source —
    # this full-row pass plus the distinct-tick pass for KMV — not three.
    in_sample = (
        _hash32(F.concat_ws("|", F.col("symbol"), F.col("eus").cast("string")))
        % sample_mod
        == 0
    )
    stats = base.groupBy("symbol", "day").agg(
        F.count("*").alias("n_trades"),
        F.median(F.when(in_sample, F.col("price"))).alias("sample_median_price"),
        F.count(F.when(in_sample, F.lit(1))).alias("sample_n"),
    )
    return stats.join(kmv, ["symbol", "day"], "left").select(
        "symbol",
        "day",
        "n_trades",
        "kmv_distinct_ticks",
        "sample_n",
        "sample_median_price",
    )


def kmv_daily_stats_sql(
    trades_cte: str, k: int = KMV_K, sample_mod: int = KMV_SAMPLE_MOD
) -> str:
    """DuckDB twin of ``kmv_daily_stats`` — identical hashes, identical
    arithmetic shape (constant product then divide), identical sample."""
    return f"""
WITH {trades_cte},
base AS (
    SELECT symbol,
           CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           CAST(floor(price * 100.0) AS BIGINT) AS tick,
           price,
           epoch_us(ts) AS eus
    FROM trades
),
dh AS (
    SELECT symbol, day,
           ('0x' || substr(md5(CAST(tick AS VARCHAR)), 1, 8))::BIGINT AS h
    FROM (SELECT DISTINCT symbol, day, tick FROM base)
),
kmv AS (
    SELECT symbol, day,
           CASE WHEN count(*) < {k} THEN CAST(count(*) AS DOUBLE)
                ELSE {float(k - 1)!r} * 4294967296.0
                     / CAST(max(CASE WHEN rn <= {k} THEN h END) AS DOUBLE)
           END AS kmv_distinct_ticks
    FROM (
        SELECT symbol, day, h,
               row_number() OVER (PARTITION BY symbol, day ORDER BY h) AS rn
        FROM dh
    )
    GROUP BY symbol, day
),
stats AS (
    SELECT symbol, day,
           CAST(count(*) AS BIGINT) AS n_trades,
           median(CASE WHEN ('0x' || substr(md5(symbol || '|' || CAST(eus AS VARCHAR)), 1, 8))::BIGINT
                            % {sample_mod} = 0
                       THEN price::DOUBLE END) AS sample_median_price,
           CAST(count(CASE WHEN ('0x' || substr(md5(symbol || '|' || CAST(eus AS VARCHAR)), 1, 8))::BIGINT
                                % {sample_mod} = 0
                            THEN 1 END) AS BIGINT) AS sample_n
    FROM base GROUP BY symbol, day
)
SELECT s.symbol, s.day, s.n_trades, kmv.kmv_distinct_ticks,
       s.sample_n, s.sample_median_price
FROM stats s
LEFT JOIN kmv ON kmv.symbol = s.symbol AND kmv.day = s.day
"""


def daily_price_stats(trades: DataFrame) -> DataFrame:
    """Exact order statistics per (symbol, day): median price plus exact
    p10/p90 (interpolated continuous percentiles — matches DuckDB's
    quantile_cont on DOUBLE)."""
    day = F.date_trunc("day", "ts").alias("day")
    return trades.groupBy("symbol", day).agg(
        F.median("price").alias("median_price"),
        F.percentile("price", F.lit(0.1)).alias("p10"),
        F.percentile("price", F.lit(0.9)).alias("p90"),
        F.count("*").alias("n_trades"),
    )


def daily_price_stats_sql(trades_cte: str) -> str:
    return f"""
WITH {trades_cte}
SELECT symbol,
       CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       median(price::DOUBLE) AS median_price,
       quantile_cont(price::DOUBLE, 0.1) AS p10,
       quantile_cont(price::DOUBLE, 0.9) AS p90,
       CAST(count(*) AS BIGINT) AS n_trades
FROM trades
GROUP BY symbol, date_trunc('day', ts)
"""


def mad_outlier_stats(
    trades: DataFrame, k_num: int = 5, k_den: int = 1
) -> DataFrame:
    """Robust per-(symbol, day) outlier screening — median/MAD, the
    data-quality probe a training pipeline runs before trusting a feed
    (mean/stddev break down exactly when the data is dirty; the median
    absolute deviation does not). A trade is an outlier when
    ``|price - median| * k_den > MAD * k_num`` (default 5 MADs).

    Exactness: both statistics are LOWER medians selected BY POSITION
    (row_number over the in-partition sort, value at ``(n+1) div 2``) —
    order-statistic selection, no interpolation, so there is no
    lerp-formula rounding to diverge between engines (DuckDB's
    quantile_cont and Spark's percentile interpolate with differently
    associated arithmetic; a selected VALUE is bit-identical by
    construction). The flag comparison is two correctly-rounded double
    products. Ties in the sort cannot change the selected value (equal
    values are interchangeable at the boundary).

    Scale shape: ONE shuffle keyed by (symbol, day); the four window
    passes (rank price, broadcast median back, rank deviation, broadcast
    MAD back) all reuse that partitioning — window sorts spill, nothing
    collects a whole group into a single array (the collect_list trap).
    Partition size = one symbol-day of trades; a pathological single
    symbol-day splits by the asof docstring's coarse-bucket trick.

    Returns per (symbol, day): n_trades, med_price, mad, n_outliers."""
    if k_num < 0 or k_den < 1:
        raise ValueError(f"k must be a non-negative rational, got {k_num}/{k_den}")
    from pyspark.sql.window import Window as _W

    day = F.date_trunc("day", "ts")
    part = ["symbol", "__day"]
    # NULL prices are excluded from the statistics AND from n_trades in
    # BOTH engines (r9 review: Spark sorts NULLs FIRST under ASC, DuckDB
    # LAST — an unfiltered positional selection would pick different
    # values, and a NULL landing on the median position would NULL the
    # whole group's stats silently).
    base = trades.select("symbol", day.alias("__day"), "price").where(
        F.col("price").isNotNull()
    )
    w_all = _W.partitionBy(*part)
    w_price = w_all.orderBy("price")
    staged = base.withColumns(
        {
            "__n": F.count("*").over(w_all),
            "__rn": F.row_number().over(w_price),
        }
    )
    med = F.max(
        F.when(F.col("__rn") == F.expr("(__n + 1) div 2"), F.col("price"))
    ).over(w_all)
    staged = staged.withColumn("__med", med).withColumn(
        "__dev", F.abs(F.col("price") - F.col("__med"))
    )
    w_dev = w_all.orderBy("__dev")
    staged = staged.withColumn("__rn2", F.row_number().over(w_dev))
    mad = F.max(
        F.when(F.col("__rn2") == F.expr("(__n + 1) div 2"), F.col("__dev"))
    ).over(w_all)
    staged = staged.withColumn("__mad", mad)
    flag = (F.col("__dev") * F.lit(float(k_den))) > (
        F.col("__mad") * F.lit(float(k_num))
    )
    return (
        staged.groupBy(
            "symbol", F.col("__day").cast("timestamp").alias("day")
        )
        .agg(
            F.count("*").alias("n_trades"),
            F.max("__med").alias("med_price"),
            F.max("__mad").alias("mad"),
            F.sum(flag.cast("long")).alias("n_outliers"),
        )
    )


def mad_outlier_stats_sql(
    trades_cte: str, k_num: int = 5, k_den: int = 1
) -> str:
    """DuckDB twin of ``mad_outlier_stats`` — same positional lower
    medians, same cross-multiplied flag."""
    if k_num < 0 or k_den < 1:
        raise ValueError(f"k must be a non-negative rational, got {k_num}/{k_den}")
    return f"""
WITH {trades_cte},
base AS (
    SELECT symbol, date_trunc('day', ts) AS day, price FROM trades
    WHERE price IS NOT NULL
),
ranked AS (
    SELECT *,
           count(*) OVER (PARTITION BY symbol, day) AS n,
           row_number() OVER (PARTITION BY symbol, day ORDER BY price) AS rn
    FROM base
),
with_med AS (
    SELECT *,
           max(CASE WHEN rn = (n + 1) // 2 THEN price END)
               OVER (PARTITION BY symbol, day) AS med
    FROM ranked
),
with_dev AS (
    SELECT *, abs(price - med) AS dev,
           row_number() OVER (PARTITION BY symbol, day ORDER BY abs(price - med)) AS rn2
    FROM with_med
),
with_mad AS (
    SELECT *,
           max(CASE WHEN rn2 = (n + 1) // 2 THEN dev END)
               OVER (PARTITION BY symbol, day) AS mad
    FROM with_dev
)
SELECT symbol,
       CAST(day AS TIMESTAMP) AS day,
       CAST(count(*) AS BIGINT) AS n_trades,
       max(med) AS med_price,
       max(mad) AS mad,
       CAST(SUM(CASE WHEN dev * {float(k_den)} > mad * {float(k_num)}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM with_mad
GROUP BY symbol, day
"""


# ---------------------------------------------------------------------------
# w14: rolling cross-series correlation (round 10)
# ---------------------------------------------------------------------------

_CORR_QUANT = 10_000  # price -> BIGINT at 1e-4 resolution; see overflow note


def rolling_correlation(
    candles: DataFrame,
    symbol_a: str,
    symbol_b: str,
    n: int = 20,
    frame: str = "MINUTE",
) -> DataFrame:
    """Rolling Pearson correlation between two symbols' aligned candle
    closes over the trailing ``n`` buckets (w14) — the pairs-trading /
    beta overlay a chart backend serves next to Bollinger bands, and the
    engine's first CROSS-SERIES analytic (every prior window operator is
    single-series).

    Exactness (the oracle discipline): closes quantize to BIGINT at 1e-4
    (``floor(close * 1e4 + 0.5)``), all five rolling sums (Σx, Σy, Σxy,
    Σx², Σy²) run as exact DECIMAL(38,0) window sums — order-independent,
    so partition layout cannot flip a bit — and the final
    ``(kΣxy − ΣxΣy) / (sqrt(kΣx² − Σx²) · sqrt(kΣy² − Σy²))`` is one
    short IEEE chain both engines round identically. Overflow headroom
    (r10 advice fix — the original BIGINT sums wrapped silently: with
    x = price·10⁴, Σx² alone exceeds int64's 9.2·10¹⁸ at n=20 for prices
    above ~$15k, and Spark wraps longs while DuckDB promotes to HUGEINT,
    so the engines diverged exactly where the value went wrong): the
    QUADRATIC sums (Σxy, Σx², Σy²) carry DECIMAL(38,0) on Spark /
    HUGEINT on DuckDB (the twin multiplies via CAST(..AS HUGEINT)
    because DuckDB's BIGINT·BIGINT product would itself overflow first);
    the LINEAR sums (Σx, Σy) stay BIGINT — |Σx| ≤ n·p·10⁴ < 2⁶³ holds on
    the same envelope — and are cast to decimal BEFORE the final
    cross-multiplications (sx·sy is exactly the product that wrapped).
    Exact-integer bound, both widths: safe for any price
    p < ~10¹⁵/n (quadratic: n²·(p·10⁴)² < 10³⁸; linear: n·p·10⁴ <
    9.2·10¹⁸); at n ≤ 10⁴ that is p < 10¹¹, far past any quotable
    price. The mixed widths measured ~2× over all-decimal at the w15
    1225-pair tier-2 shape (decimal window aggregation is the cost).
    Zero variance on either side ⇒ NULL (undefined, not ±inf).

    Alignment: INNER join on bucket_start — buckets where either symbol
    is missing do not enter any window (documented semantics; gap-fill
    first for calendar-aligned studies). Warm-up rows (< n aligned
    buckets) use the shorter prefix, the indicator convention.

    Scale shape: the aligned pair series is OUTPUT-sized (≤ buckets in
    range), so the single-partition ordered window is bounded by the
    query's own time range — the p8 bounded-window class, not a
    corpus-sized funnel; the window partitions by the pair tag so a
    multi-pair union parallelizes across pairs.

    Returns (pair, bucket_start, close_a, close_b, corr_n)."""
    from pyspark.sql.window import Window

    if n < 2:
        raise ValueError(f"n must be >= 2, got {n}")
    base = candles.where(F.col("time_frame") == frame)
    qa = (
        base.where(F.col("symbol") == symbol_a)
        .select(
            "bucket_start",
            F.col("close").alias("close_a"),
            F.floor(F.col("close") * _CORR_QUANT + 0.5).cast("long").alias("xa"),
        )
    )
    qb = (
        base.where(F.col("symbol") == symbol_b)
        .select(
            "bucket_start",
            F.col("close").alias("close_b"),
            F.floor(F.col("close") * _CORR_QUANT + 0.5).cast("long").alias("xb"),
        )
    )
    pair = qa.join(qb, on="bucket_start").withColumn(
        "pair", F.lit(f"{symbol_a}/{symbol_b}")
    )
    w = (
        Window.partitionBy("pair")
        .orderBy("bucket_start")
        .rowsBetween(-(n - 1), 0)
    )
    # Mixed integer widths, all exact (see docstring): the LINEAR window
    # sums run as plain BIGINT (|Σx| ≤ n·p·10⁴ < 2⁶³ for any p < 9.2e14/n
    # — the same envelope as the quadratic bound, and long window sums
    # measured ~2× faster than decimal at the 1225-pair tier-2 shape);
    # only the QUADRATIC sums, whose per-term products overflow int64 at
    # realistic prices, carry DECIMAL(38,0). Every operand is cast to
    # decimal BEFORE the final cross-multiplications, so no int64
    # intermediate (sx·sy wraps at n=20/p≈$15k-σ) ever forms.
    xd = F.col("xa").cast("decimal(19,0)")
    yd = F.col("xb").cast("decimal(19,0)")
    k = F.count(F.lit(1)).over(w).cast("decimal(19,0)")
    sx = F.sum("xa").over(w).cast("decimal(19,0)")
    sy = F.sum("xb").over(w).cast("decimal(19,0)")
    sxy = F.sum(xd * yd).over(w)
    sxx = F.sum(xd * xd).over(w)
    syy = F.sum(yd * yd).over(w)
    num = (k * sxy - sx * sy).cast("double")
    vx = (k * sxx - sx * sx).cast("double")
    vy = (k * syy - sy * sy).cast("double")
    corr = F.when(
        (vx > 0) & (vy > 0), num / (F.sqrt(vx) * F.sqrt(vy))
    )
    return pair.select(
        "pair",
        "bucket_start",
        "close_a",
        "close_b",
        corr.alias(f"corr_{n}"),
    ).orderBy("bucket_start")


def rolling_correlation_sql(
    candles_sql: str,
    symbol_a: str,
    symbol_b: str,
    n: int = 20,
    frame: str = "MINUTE",
) -> str:
    """DuckDB twin of ``rolling_correlation`` over an inner candle query
    (symbol/time_frame/bucket_start/close rows) — identical quantized
    BIGINT sums and the identical final IEEE chain."""
    if n < 2:
        raise ValueError(f"n must be >= 2, got {n}")
    q = _CORR_QUANT
    return f"""
WITH c AS ({candles_sql}),
a AS (
    SELECT bucket_start, "close" AS close_a,
           CAST(floor("close" * {q} + 0.5) AS BIGINT) AS xa
    FROM c WHERE symbol = '{symbol_a}' AND time_frame = '{frame}'
),
b AS (
    SELECT bucket_start, "close" AS close_b,
           CAST(floor("close" * {q} + 0.5) AS BIGINT) AS xb
    FROM c WHERE symbol = '{symbol_b}' AND time_frame = '{frame}'
),
p AS (
    SELECT a.bucket_start, close_a, close_b, xa, xb
    FROM a JOIN b USING (bucket_start)
),
s AS (
    SELECT *,
           CAST(count(*) OVER w AS HUGEINT) AS k,
           sum(CAST(xa AS HUGEINT)) OVER w AS sx,
           sum(CAST(xb AS HUGEINT)) OVER w AS sy,
           sum(CAST(xa AS HUGEINT) * xb) OVER w AS sxy,
           sum(CAST(xa AS HUGEINT) * xa) OVER w AS sxx,
           sum(CAST(xb AS HUGEINT) * xb) OVER w AS syy
    FROM p
    WINDOW w AS (ORDER BY bucket_start
                 ROWS BETWEEN {n - 1} PRECEDING AND CURRENT ROW)
)
SELECT '{symbol_a}/{symbol_b}' AS pair,
       bucket_start, close_a, close_b,
       CASE WHEN (k * sxx - sx * sx) > 0 AND (k * syy - sy * sy) > 0
            THEN CAST(k * sxy - sx * sy AS DOUBLE)
                 / (sqrt(CAST(k * sxx - sx * sx AS DOUBLE))
                    * sqrt(CAST(k * syy - sy * sy AS DOUBLE)))
       END AS corr_{n}
FROM s
ORDER BY bucket_start
"""


# ---------------------------------------------------------------------------
# w15: all-pairs rolling correlation matrix (round 11)
# ---------------------------------------------------------------------------


def rolling_correlation_matrix(
    candles: DataFrame,
    symbols: list[str] | None = None,
    n: int = 20,
    frame: str = "MINUTE",
    pairs_with: list[str] | None = None,
) -> DataFrame:
    """Rolling Pearson correlation for EVERY symbol pair (w15 — the
    generalization of w14 the multi-symbol serving layer asks for,
    reference StockChartController.kt:35-39 serving five symbols side by
    side): one aligned-close table, pair enumeration via ONE self-join on
    bucket_start (bounded by symbol cardinality: S rows per bucket each
    side, S(S-1)/2 output pairs per bucket), then the SAME exact
    DECIMAL(38,0) quantized window sums as ``rolling_correlation`` over a
    window partitioned by (sym_a, sym_b) — NOT S² separate window passes:
    every pair's series is computed in one plan and the pair key is the
    window partition, so pairs parallelize across tasks.

    ``symbols`` filters the matrix (None = all symbols in ``candles``);
    output rows carry (sym_a, sym_b) with sym_a < sym_b — the upper
    triangle; the diagonal is identically 1 and is omitted.

    Skew note (the hot-pair case): each pair's ordered window buffers
    only that pair's OUTPUT-sized aligned series (the p8 bounded-window
    class — bounded by the query's own time range, never corpus-sized),
    and all S(S-1)/2 pairs land on different window partitions, so a
    "hot" pair cannot serialize the others. The S² growth itself is the
    knob the caller owns: pass ``symbols`` to bound the matrix (5
    symbols = 10 pairs; 1000 symbols = ~500k window partitions — still
    parallel, but the self-join output is S²-proportional by definition).
    Warm-up rows (< n aligned buckets) use the shorter prefix; zero
    variance on either side => NULL, the w14 conventions.

    Returns (sym_a, sym_b, bucket_start, close_a, close_b, corr_n)."""
    from pyspark.sql.window import Window

    if n < 2:
        raise ValueError(f"n must be >= 2, got {n}")
    base = candles.where(F.col("time_frame") == frame)
    if symbols is not None:
        if len(symbols) < 2:
            raise ValueError("symbols must name at least 2 series")
        base = base.where(F.col("symbol").isin(list(symbols)))
    q = base.select(
        "symbol",
        "bucket_start",
        "close",
        F.floor(F.col("close") * _CORR_QUANT + 0.5).cast("long").alias("x"),
    )
    a = q.select(
        F.col("symbol").alias("sym_a"),
        "bucket_start",
        F.col("close").alias("close_a"),
        F.col("x").alias("xa"),
    )
    b = q.select(
        F.col("symbol").alias("sym_b"),
        "bucket_start",
        F.col("close").alias("close_b"),
        F.col("x").alias("xb"),
    )
    pair = a.join(b, on="bucket_start").where(F.col("sym_a") < F.col("sym_b"))
    if pairs_with is not None:
        # restrict to pairs with at least one leg in the list BEFORE the
        # window pass (round 12 — the streaming corr tier's per-batch
        # bound: only pairs involving a symbol the batch CHANGED can have
        # changed rows, so the window never buffers the other
        # S(S-1)/2 − |affected|·S pairs). Lossless: window partitions are
        # per-pair, so dropping whole pairs cannot perturb survivors.
        pw = list(pairs_with)
        pair = pair.where(
            F.col("sym_a").isin(pw) | F.col("sym_b").isin(pw)
        )
    w = (
        Window.partitionBy("sym_a", "sym_b")
        .orderBy("bucket_start")
        .rowsBetween(-(n - 1), 0)
    )
    # long linear sums / decimal quadratic sums — the rolling_correlation
    # width discipline (see its comment): measured ~2× on the tier-2
    # 1225-pair shape vs all-decimal, bit-identical results.
    xd = F.col("xa").cast("decimal(19,0)")
    yd = F.col("xb").cast("decimal(19,0)")
    k = F.count(F.lit(1)).over(w).cast("decimal(19,0)")
    sx = F.sum("xa").over(w).cast("decimal(19,0)")
    sy = F.sum("xb").over(w).cast("decimal(19,0)")
    sxy = F.sum(xd * yd).over(w)
    sxx = F.sum(xd * xd).over(w)
    syy = F.sum(yd * yd).over(w)
    num = (k * sxy - sx * sy).cast("double")
    vx = (k * sxx - sx * sx).cast("double")
    vy = (k * syy - sy * sy).cast("double")
    corr = F.when((vx > 0) & (vy > 0), num / (F.sqrt(vx) * F.sqrt(vy)))
    return pair.select(
        "sym_a",
        "sym_b",
        "bucket_start",
        "close_a",
        "close_b",
        corr.alias(f"corr_{n}"),
    )
    # no global orderBy: a total sort over the S²-sized result is a full
    # range-partition exchange (~12 s of the 26 s tier-2 entry, measured)
    # for presentation only — each pair's rows are already produced in
    # bucket order by its window partition, and a consumer reads one
    # pair's series (filter + tiny sort) or compares order-insensitively.


def rolling_correlation_matrix_sql(
    candles_sql: str,
    symbols: list[str] | None = None,
    n: int = 20,
    frame: str = "MINUTE",
) -> str:
    """DuckDB twin of ``rolling_correlation_matrix`` — identical
    HUGEINT-exact sums (the rolling_correlation_sql discipline) over the
    identical self-join pair enumeration."""
    if n < 2:
        raise ValueError(f"n must be >= 2, got {n}")
    sym_pred = ""
    if symbols is not None:
        if len(symbols) < 2:
            raise ValueError("symbols must name at least 2 series")
        lst = ", ".join(f"'{s}'" for s in symbols)
        sym_pred = f" AND symbol IN ({lst})"
    q = _CORR_QUANT
    return f"""
WITH c AS ({candles_sql}),
qv AS (
    SELECT symbol, bucket_start, "close",
           CAST(floor("close" * {q} + 0.5) AS BIGINT) AS x
    FROM c WHERE time_frame = '{frame}'{sym_pred}
),
p AS (
    SELECT a.symbol AS sym_a, b.symbol AS sym_b, a.bucket_start,
           a."close" AS close_a, b."close" AS close_b,
           a.x AS xa, b.x AS xb
    FROM qv a JOIN qv b
      ON a.bucket_start = b.bucket_start AND a.symbol < b.symbol
),
s AS (
    SELECT *,
           CAST(count(*) OVER w AS HUGEINT) AS k,
           sum(CAST(xa AS HUGEINT)) OVER w AS sx,
           sum(CAST(xb AS HUGEINT)) OVER w AS sy,
           sum(CAST(xa AS HUGEINT) * xb) OVER w AS sxy,
           sum(CAST(xa AS HUGEINT) * xa) OVER w AS sxx,
           sum(CAST(xb AS HUGEINT) * xb) OVER w AS syy
    FROM p
    WINDOW w AS (PARTITION BY sym_a, sym_b ORDER BY bucket_start
                 ROWS BETWEEN {n - 1} PRECEDING AND CURRENT ROW)
)
SELECT sym_a, sym_b, bucket_start, close_a, close_b,
       CASE WHEN (k * sxx - sx * sx) > 0 AND (k * syy - sy * sy) > 0
            THEN CAST(k * sxy - sx * sy AS DOUBLE)
                 / (sqrt(CAST(k * sxx - sx * sx AS DOUBLE))
                    * sqrt(CAST(k * syy - sy * sy AS DOUBLE)))
       END AS corr_{n}
FROM s
ORDER BY sym_a, sym_b, bucket_start
"""
