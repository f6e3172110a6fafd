"""SQL surface: temp views over the engine's tables so any query the
reference's API answers (and more) is one ``spark.sql(...)`` away.

The reference has no SQL parser (SURVEY §2.6); this engine inherits
Spark SQL for free. ``register_views`` publishes:

- ``trades``      — the adapted trade stream/table
- ``candles``     — all four frames (multi-frame cascade)
- ``minute_candles`` / ``hour_candles`` / ``day_candles`` /
  ``month_candles`` — per-frame convenience views

Views are lazy logical plans: Catalyst still prunes/pushes through them,
so ``SELECT * FROM hour_candles WHERE symbol='AAPL'`` plans the same
single-shuffle pushed-filter query as the programmatic API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from stock_chart_kafka_streams_spark.operators.candles import (
    candles,
    multi_frame_candles,
)
from stock_chart_kafka_streams_spark.sources.trades import load_trades


def register_views(
    spark: SparkSession, sf_dir: str, trades: DataFrame | None = None
) -> None:
    """Create/replace the engine's temp views for ad-hoc Spark SQL."""
    t = trades if trades is not None else load_trades(spark, sf_dir)
    t.createOrReplaceTempView("trades")
    multi_frame_candles(t).createOrReplaceTempView("candles")
    for frame in ["MINUTE", "HOUR", "DAY", "MONTH"]:
        candles(t, frame).createOrReplaceTempView(f"{frame.lower()}_candles")
