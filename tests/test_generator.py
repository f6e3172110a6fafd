"""Deterministic generator tests (FIXTURES.md F1 envelope)."""

from pyspark.sql import functions as F

from stock_chart_kafka_streams_spark import candles
from stock_chart_kafka_streams_spark.sources.generator import (
    DEFAULT_SYMBOLS,
    generate_trades,
)


def test_deterministic_across_runs(spark):
    a = generate_trades(spark, 500, seed=7)
    b = generate_trades(spark, 500, seed=7)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_seed_changes_output(spark):
    a = generate_trades(spark, 200, seed=1)
    b = generate_trades(spark, 200, seed=2)
    assert a.exceptAll(b).count() > 0


def test_envelope(spark):
    df = generate_trades(spark, 1000).cache()
    assert df.count() == 1000 * len(DEFAULT_SYMBOLS)
    stats = df.agg(
        F.min("price").alias("pmin"),
        F.min("quantity").alias("qmin"),
        F.max("quantity").alias("qmax"),
        F.countDistinct("symbol").alias("nsym"),
    ).collect()[0]
    assert stats["pmin"] >= 0.01
    assert 1 <= stats["qmin"] and stats["qmax"] <= 100
    assert stats["nsym"] == len(DEFAULT_SYMBOLS)
    # walk stays within ±1%/tick of the previous price
    w = df.withColumn(
        "prev",
        F.lag("price").over(
            __import__("pyspark").sql.window.Window.partitionBy("symbol").orderBy("ts")
        ),
    ).where(F.col("prev").isNotNull())
    bad = w.where((F.col("price") / F.col("prev") > 1.0101) | (F.col("price") / F.col("prev") < 0.9899))
    assert bad.count() == 0


def test_generated_trades_feed_candles(spark):
    df = generate_trades(spark, 600)  # 10 minutes of 1 Hz ticks
    c = candles(df, "MINUTE")
    assert c.count() == 10 * len(DEFAULT_SYMBOLS)
    assert c.where(F.col("volume") <= 0).count() == 0
