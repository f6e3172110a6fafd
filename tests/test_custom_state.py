"""applyInPandasWithState running-VWAP semantics over the replay harness."""

from pyspark.sql import functions as F

from stock_chart_kafka_streams_spark.sources.trades import read_trades_json_stream
from stock_chart_kafka_streams_spark.streaming.custom_state import running_vwap
from stock_chart_kafka_streams_spark.streaming.replay import (
    late_replay_trades,
    write_replay_batches,
)

SF_DIR = "/root/testdata/sf0.001"


def test_running_vwap_converges_to_batch_vwap(spark, tmp_path):
    trades = late_replay_trades(spark, SF_DIR, batch_size=250)
    write_replay_batches(trades, str(tmp_path / "in"))
    stream = read_trades_json_stream(spark, str(tmp_path / "in"), max_files_per_trigger=1)
    q = (
        running_vwap(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("vwap_out")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.sql("select * from vwap_out")

    # no watermark here: every replayed row (incl. 'late' ones) counts, as
    # does the sentinel heartbeat symbol — compare against full-batch truth
    final = (
        out.withColumn(
            "rn",
            F.row_number().over(
                __import__("pyspark")
                .sql.window.Window.partitionBy("symbol")
                .orderBy(F.col("cum_volume").desc())
            ),
        )
        .where(F.col("rn") == 1)
        .select("symbol", "cum_volume", "vwap")
    )
    truth = trades.groupBy("symbol").agg(
        F.sum("quantity").alias("cum_volume"),
        (F.sum(F.col("price") * F.col("quantity")) / F.sum("quantity")).alias("vwap"),
    )
    got = {r["symbol"]: r for r in final.collect() if r["symbol"] != "__heartbeat__"}
    want = {r["symbol"]: r for r in truth.collect()}
    assert set(got) == set(want)
    for s in want:
        assert got[s]["cum_volume"] == want[s]["cum_volume"], s
        assert abs(got[s]["vwap"] - want[s]["vwap"]) < 1e-9, s


def test_vwap_emits_every_batch(spark, tmp_path):
    trades = late_replay_trades(spark, SF_DIR, batch_size=500)
    n_files = write_replay_batches(trades, str(tmp_path / "in"))
    stream = read_trades_json_stream(spark, str(tmp_path / "in"), max_files_per_trigger=1)
    q = (
        running_vwap(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("vwap_batches")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.sql("select * from vwap_batches")
    # each symbol appears once per batch it had trades in; monotone state
    mono = (
        out.groupBy("symbol")
        .agg(
            F.count("*").alias("emissions"),
            (F.max("cum_volume") - F.min("cum_volume")).alias("growth"),
        )
        .where(F.col("emissions") > 1)
    )
    assert mono.count() > 0  # multi-batch symbols exist
    assert out.where(F.col("vwap") <= 0).count() == 0
