"""Streaming deduplication (SURVEY.md §2.9 scale path).

Exact-duplicate suppression on an unbounded stream with bounded state:
``dropDuplicatesWithinWatermark`` keeps one row per key and evicts state
once the watermark passes the key's event time + delay — the streaming
twin of ``operators/dedup.dedup_exact``. Use a content hash as the key so
state stores 32 hex chars per live key instead of full payloads.

At 100 TB-scale ingest the state is bounded by (unique keys per watermark
window), not stream length — the delay knob trades late-duplicate recall
for state size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream_exact(
    stream: DataFrame,
    key_cols: list[str] | None = None,
    ts_col: str = "ts",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Drop duplicate records (same key columns) arriving within the
    watermark delay of each other. Defaults to full-row content identity
    via an md5 over all non-timestamp columns."""
    if key_cols is None:
        key_cols_expr = [c for c in stream.columns if c != ts_col]
        keyed = stream.withColumn(
            "__key", F.md5(F.concat_ws("\x1f", *key_cols_expr))
        )
        out = keyed.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(
            ["__key"]
        )
        return out.drop("__key")
    return stream.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(
        key_cols
    )
