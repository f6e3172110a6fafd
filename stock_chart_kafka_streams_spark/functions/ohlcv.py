"""OHLCV aggregate expression builders (reference SURVEY.md §2.4 A3/A5).

The reference maintains candles imperatively per record
(``stream/CandlestickAggregator.kt:391-450`` initialize/updateCandle):
open = first trade, high = running max, low = running min, close = last
trade, volume = running sum. There, first/last are *arrival order*; this
engine defines them by *event time* (``min_by``/``max_by`` over ``ts``) —
deterministic under any partitioning / micro-batch replay and matching the
documented intent (SURVEY §2.7 Q1). All expressions are built-in JVM
aggregates: whole-stage-codegen, map-side partial aggregation, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ohlcv_aggs(
    price: str = "price", quantity: str = "quantity", ts: str = "ts"
) -> list[Column]:
    """Aggregates computing one candle from raw trades (A3)."""
    return [
        F.min_by(price, ts).alias("open"),
        F.max(price).alias("high"),
        F.min(price).alias("low"),
        F.max_by(price, ts).alias("close"),
        F.sum(quantity).alias("volume"),
    ]


def merge_aggs(order_col: str | Column = "bucket_start") -> list[Column]:
    """Aggregates merging finer candles into a coarser one (A5/A6/A7):
    open of the earliest sub-bucket, close of the latest, max/min/sum of
    the rest. Candle merge is associative (SURVEY §2.7 Q6), so a rollup of
    minute candles equals aggregating raw trades directly."""
    return [
        F.min_by("open", order_col).alias("open"),
        F.max("high").alias("high"),
        F.min("low").alias("low"),
        F.max_by("close", order_col).alias("close"),
        F.sum("volume").alias("volume"),
    ]
