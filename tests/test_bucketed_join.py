"""Bucketed co-located join: no Exchange in the plan, identical results.

The 100 TB design artifact behind sources/bucketed.py — a fact-fact join
whose both sides were written bucketed on the join key must plan without
any shuffle, and return exactly what the plain (shuffling) join returns.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stock_chart_kafka_streams_spark.sources.bucketed import (
    bucketed_join,
    write_bucketed,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    # managed tables land in the session's default warehouse;
    # DROP TABLE in teardown removes data + metadata
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    write_bucketed(orders, "orders_b", "o_orderkey", n_buckets=8)
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b",
        "o_orderkey",
        n_buckets=8,
    )
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    lt, rt = bucketed_tables
    # disable auto-broadcast: at test SF everything fits a broadcast, which
    # bypasses bucketing entirely; the claim under test is the fact-fact
    # SortMergeJoin path, where bucketing must eliminate both Exchanges
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(spark, lt, rt, on="o_orderkey")
        plan = j._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan, plan[:2000]
    assert "Exchange" not in plan, plan[:2000]
    assert "Bucketed: true" in plan, plan[:2000]


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    lt, rt = bucketed_tables
    j = bucketed_join(spark, lt, rt, on="o_orderkey").groupBy().agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("s"),
    )
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    plain = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy()
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("s"),
        )
    )
    assert j.collect() == plain.collect()
