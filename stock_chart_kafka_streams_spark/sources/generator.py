"""Deterministic synthetic trade generator (reference SURVEY.md §3.2).

The reference emits one random-walk trade per symbol per second from a
scheduled Spring task (``simulator/StockTransactionGenerator.kt:38-80``):
±1% multiplicative price step floored at 0.01, quantity uniform in [1,100],
5 hardcoded symbols with fixed base prices. That design is driver-side and
non-reproducible (ThreadLocalRandom + wall clock).

This generator is distributed and seed-deterministic: every random draw is
a pure column expression ``xxhash64(symbol, tick, seed)`` so the same
(seed, n_ticks) always produces identical rows on any cluster layout, and
generation scales linearly with executors (``spark.range`` partitions the
tick space; the per-symbol cumulative walk is a window cumsum of log-steps
— one shuffle by symbol). No driver-side loops, no wall clock (SURVEY
§2.7 Q3).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Reference symbols and base prices (StockTransactionGenerator.kt:24-33).
DEFAULT_SYMBOLS: dict[str, float] = {
    "AAPL": 150.0,
    "GOOGL": 2800.0,
    "MSFT": 300.0,
    "AMZN": 3400.0,
    "TSLA": 900.0,
}

_HASH_BUCKETS = 1 << 30


def _uniform(seed: int, *cols: Column) -> Column:
    """Deterministic pseudo-uniform in [0, 1) from the given columns."""
    h = F.xxhash64(*cols, F.lit(seed))
    return (F.pmod(h, F.lit(_HASH_BUCKETS))).cast("double") / F.lit(float(_HASH_BUCKETS))


def generate_trades(
    spark: SparkSession,
    n_ticks: int,
    symbols: dict[str, float] | None = None,
    start: dt.datetime = dt.datetime(2024, 1, 1),
    tick_seconds: int = 1,
    seed: int = 42,
) -> DataFrame:
    """One trade per symbol per tick, ±1% multiplicative random walk.

    The walk is computed as ``base * exp(Σ log1p(step_i))`` with a window
    cumulative sum per symbol — the distributed equivalent of the
    reference's sequential ``price *= (1 + step)`` loop
    (``StockTransactionGenerator.kt:46-58``), floored at 0.01.
    """
    symbols = symbols or DEFAULT_SYMBOLS
    sym_df = spark.createDataFrame(
        list(symbols.items()), "symbol string, base_price double"
    )
    ticks = spark.range(n_ticks).withColumnRenamed("id", "tick")
    df = ticks.crossJoin(F.broadcast(sym_df))

    step = (_uniform(seed, F.col("symbol"), F.col("tick")) * 2.0 - 1.0) * 0.01
    walk = Window.partitionBy("symbol").orderBy("tick")
    log_price = F.log("base_price") + F.sum(F.log1p(step)).over(walk)

    return df.select(
        F.col("symbol"),
        F.greatest(F.exp(log_price), F.lit(0.01)).alias("price"),
        (
            F.pmod(F.xxhash64(F.col("symbol"), F.col("tick"), F.lit(seed + 1)), F.lit(100))
            + 1
        ).cast("long").alias("quantity"),
        (
            F.lit(start) + F.make_interval(secs=F.col("tick") * F.lit(tick_seconds))
        ).alias("ts"),
    )


def generate_trades_stream(
    spark: SparkSession,
    rows_per_second: int = 5,
    symbols: dict[str, float] | None = None,
    start: dt.datetime = dt.datetime(2024, 1, 1),
    seed: int = 42,
) -> DataFrame:
    """Streaming variant over the ``rate`` source (reference's 1 Hz
    scheduler, S6). Each rate row becomes one trade; the price walk uses a
    per-tick independent step around the base price rather than a full
    cumulative walk (a windowed cumsum is not streamable), which preserves
    the schema and distribution envelope for pipeline testing."""
    symbols = symbols or DEFAULT_SYMBOLS
    sym_df = spark.createDataFrame(
        list(symbols.items()), "symbol string, base_price double"
    )
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
        .withColumnRenamed("value", "tick")
    )
    # assign symbol round-robin by tick
    df = rate.withColumn(
        "sym_idx", F.pmod(F.col("tick"), F.lit(len(symbols))).cast("int")
    ).join(
        F.broadcast(
            sym_df.withColumn(
                "sym_idx",
                F.row_number().over(Window.orderBy("symbol")).cast("int") - 1,
            )
        ),
        "sym_idx",
    )
    step = (_uniform(seed, F.col("symbol"), F.col("tick")) * 2.0 - 1.0) * 0.01
    return df.select(
        "symbol",
        F.greatest(F.col("base_price") * (1.0 + step), F.lit(0.01)).alias("price"),
        (
            F.pmod(F.xxhash64(F.col("symbol"), F.col("tick"), F.lit(seed + 1)), F.lit(100))
            + 1
        ).cast("long").alias("quantity"),
        F.col("timestamp").alias("ts"),
    )
