"""PySpark-native candlestick analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference Kafka Streams application (``kyuminMoon/stock-chart-kafka-streams``,
surveyed in ``SURVEY.md``): per-symbol OHLCV candlestick aggregation over
tumbling event-time windows at MINUTE / HOUR / DAY / MONTH granularity, an
idempotent partitioned serving table, and a small query API (range scans,
recent-N, point lookups, catalogs) — plus LLM-data-pipeline extensions
(dedup, similarity search, text analysis, multimodal columns) designed for
100 TB scale.

Everything is expressed through the public PySpark DataFrame/SQL/Structured
Streaming surface so Catalyst/Tungsten (predicate pushdown, column pruning,
whole-stage codegen, AQE) optimize the physical plan.
"""

from stock_chart_kafka_streams_spark.functions.timeframes import (
    FRAMES,
    bucket_end,
    bucket_start,
)
from stock_chart_kafka_streams_spark.operators.candles import (
    candles,
    candles_salted,
    multi_frame_candles,
    rollup_candles,
)
from stock_chart_kafka_streams_spark.operators.joins import asof_join
from stock_chart_kafka_streams_spark.operators.text import (
    language_stats,
    text_features,
    training_set_selection,
)
from stock_chart_kafka_streams_spark.operators.windows_ext import (
    top_volume_days,
    volume_grouping_sets,
)
from stock_chart_kafka_streams_spark.plans.query_api import CandleStore, retry_stale
from stock_chart_kafka_streams_spark.plans.sql_surface import register_views
from stock_chart_kafka_streams_spark.session import get_spark, tune_session
from stock_chart_kafka_streams_spark.sources.bucketed import (
    bucketed_join,
    write_bucketed,
)
from stock_chart_kafka_streams_spark.sources.trades import (
    load_trades,
    trades_from_events,
)
from stock_chart_kafka_streams_spark.streaming.pipeline import enrich_trades_with_dim

__all__ = [
    "FRAMES",
    "CandleStore",
    "retry_stale",
    "asof_join",
    "bucket_end",
    "bucket_start",
    "bucketed_join",
    "candles",
    "candles_salted",
    "enrich_trades_with_dim",
    "get_spark",
    "language_stats",
    "load_trades",
    "multi_frame_candles",
    "register_views",
    "rollup_candles",
    "text_features",
    "top_volume_days",
    "trades_from_events",
    "training_set_selection",
    "tune_session",
    "volume_grouping_sets",
    "write_bucketed",
]

__version__ = "0.1.0"
