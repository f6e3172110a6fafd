"""Relational join operators over the star schema.

The reference has no joins of any kind (SURVEY §2.6) — its one "entity" is
the trade stream. A real analytics engine joins fact tables against
dimensions, so these queries exercise Spark's two join strategies on the
driver's TPC-H-ish tables and pin the planning decisions this engine wants:

- **broadcast** for small dimensions (region/nation/customer): the dim side
  ships to every executor, the fact scan stays shuffle-free. `broadcast()`
  hints make it explicit rather than relying on the autoBroadcast
  threshold — at 100 TB the fact side must never shuffle for a dim join.
- **shuffle hash/sort-merge** for fact-to-fact (orders ⋈ lineitem): both
  sides hash-partition on the key; AQE picks hash vs merge and splits skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stock_chart_kafka_streams_spark.session import tune_session


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune_session(spark)
    return spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")


def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-nation revenue rollup: fact-to-fact shuffle join
    (lineitem ⋈ orders) plus broadcast dimension joins
    (customer → nation → region)."""
    lineitem = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")

    # money rounded to cents PER ROW then summed as integers: the per-row
    # double arithmetic is bit-identical across engines, and integer sums
    # are order-independent — unlike a double sum over 100k+ rows, whose
    # accumulation-order error exceeds the oracle's 9dp rounding.
    revenue_cents = F.sum(
        F.round(
            lineitem["l_extendedprice"] * (1 - lineitem["l_discount"]) * 100
        ).cast("long")
    ).alias("revenue_cents")
    return (
        lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
        .join(
            F.broadcast(customer), orders["o_custkey"] == customer["c_custkey"]
        )
        .join(F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .groupBy(
            region["r_name"].alias("region_name"),
            nation["n_name"].alias("nation_name"),
        )
        .agg(
            revenue_cents,
            F.count("*").alias("n_items"),
        )
    )


REVENUE_BY_NATION_SQL = """
SELECT r.r_name AS region_name,
       n.n_name AS nation_name,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name
"""


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary over lineitem (pure aggregation —
    the classic scan-heavy benchmark shape)."""
    li = _t(spark, sf_dir, "lineitem")
    cutoff = F.lit("1998-09-02").cast("timestamp")
    return (
        li.where(F.col("l_shipdate") <= cutoff)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            # quantities are integral; money summed as per-row cents (see
            # revenue_by_nation) — both order-independent exact integers
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
                "sum_base_price_cents"
            ),
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                ).cast("long")
            ).alias("sum_disc_price_cents"),
            F.avg("l_quantity").alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_price_cents,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_price_cents,
       avg(l_quantity) AS avg_qty,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""
