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


# -- d9's band-bucket artifact as a bucketed table (round 10, r9 #4) --------


@pytest.fixture(scope="module")
def band_bucket_table(spark):
    from stock_chart_kafka_streams_spark.operators.dedup import band_buckets

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    write_bucketed(
        band_buckets(docs), "ex_bands_b", ["band_idx", "band_val"], n_buckets=8
    )
    yield docs, "ex_bands_b"
    spark.sql("DROP TABLE IF EXISTS ex_bands_b")


def test_d9_candidate_join_reads_bucketed_history_without_exchange(
    spark, band_bucket_table
):
    """The materialize-once story end-to-end (r9 verdict #4): the d9
    candidate join keyed on (band_idx, band_val) against a same-keyed
    bucketed table must shuffle ONLY the incoming side — exactly one
    Exchange in the join plan, none above the bucketed scan."""
    from stock_chart_kafka_streams_spark.operators.dedup import band_buckets

    docs, table = band_bucket_table
    incoming = docs.limit(50).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
    )
    stored = spark.table(table)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = stored.join(
            band_buckets(incoming), on=["band_idx", "band_val"]
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan, plan[:2000]
    assert "Bucketed: true" in plan, plan[:2000]
    assert plan.count("Exchange hashpartitioning") == 1, plan[:3000]


def test_d9_over_bucketed_table_equals_on_the_fly(spark, band_bucket_table):
    """incremental_dedup over the bucketed catalog artifact (band_cap
    None — the Exchange-free path the artifact exists for) must equal
    the on-the-fly and capped forms exactly."""
    from stock_chart_kafka_streams_spark.operators.dedup import incremental_dedup

    docs, table = band_bucket_table
    existing = docs.select("doc_id", "text")
    # half the batch: exact copies of existing docs; half: fresh
    incoming = (
        docs.limit(20)
        .select((F.col("doc_id") + 10_000_000).alias("doc_id"), "text")
        .unionByName(
            docs.limit(10).select(
                (F.col("doc_id") + 20_000_000).alias("doc_id"),
                F.concat(F.lit("entirely novel prefix xylophone quartz "), F.col("text")).alias("text"),
            )
        )
    )
    stored = spark.table(table)
    live = incremental_dedup(existing, incoming, mode="minhash")
    via_table = incremental_dedup(
        existing, incoming, mode="minhash",
        existing_buckets=stored, band_cap=None,
    )
    assert sorted(map(tuple, live.collect())) == sorted(
        map(tuple, via_table.collect())
    )
