"""Bucketed tables: co-located (shuffle-free) fact-to-fact joins.

At 100 TB the orders ⋈ lineitem shuffle is the single most expensive
stage in the star-schema queries — both sides rewrite the network. Spark's
answer is bucketing: ``bucketBy(n, key)`` hash-partitions rows into a
fixed number of files per partition AT WRITE TIME and records the layout
in the catalog; a join of two tables bucketed on the same key with the
same bucket count then plans as a zip of pre-matched buckets — **no
Exchange on either side** (SortMergeJoin reads each bucket pair
directly). The one-time write cost is amortized over every subsequent
join, the standard warehouse trade.

Pinned by tests/test_bucketed_join.py: the bucketed join plan contains no
shuffle, and results are row-identical to the plain join.

Notes for real deployments:
- bucket count is frozen at write time; pick it for the TARGET scale
  (e.g. 4096 buckets ≈ 25 GB/bucket at 100 TB) — too few buckets caps
  join parallelism.
- both join sides must agree on (key, bucket count); Spark ≥3.1 can
  coalesce mismatched counts when one divides the other
  (``spark.sql.bucketing.coalesceBucketsInJoin.enabled``).
- ``sortBy`` within buckets lets SortMergeJoin skip its sort stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from stock_chart_kafka_streams_spark.session import tune_session


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str | list[str],
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a catalog table bucketed (and optionally sorted)
    on ``bucket_col`` — one column or a composite key (e.g. d9's
    (band_idx, band_val) band-bucket artifact). Overwrites an existing
    table of the same name."""
    cols = [bucket_col] if isinstance(bucket_col, str) else list(bucket_col)
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *cols)
    if sort:
        writer = writer.sortBy(*cols)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    tune_session(spark)
    return spark.table(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key. With
    matching layouts this plans WITHOUT any Exchange — verify with
    ``df.explain()`` (asserted in tests)."""
    return read_table(spark, left_table).join(read_table(spark, right_table), on)
