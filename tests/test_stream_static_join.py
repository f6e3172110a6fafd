"""Stream-static broadcast enrichment: streaming result equals the batch
join, unknown symbols pass through with nulls, and the plan broadcasts."""

from __future__ import annotations

from pyspark.sql import functions as F

from stock_chart_kafka_streams_spark.sources.trades import (
    load_trades,
    read_trades_json_stream,
)
from stock_chart_kafka_streams_spark.streaming.pipeline import enrich_trades_with_dim
from stock_chart_kafka_streams_spark.streaming.replay import (
    SENTINEL_CUTOFF,
    late_replay_trades,
    write_replay_batches,
)

SF_DIR = "/root/testdata/sf0.001"


def _dim(spark):
    # symbol metadata dim; deliberately missing some symbols (and the
    # heartbeat) so the left-join null path is exercised
    return spark.createDataFrame(
        [("click", "CLK", 1), ("view", "VIW", 2), ("error", "ERR", 3)],
        "symbol string, code string, tier int",
    )


def test_stream_static_join_matches_batch(spark, tmp_path):
    trades = late_replay_trades(spark, SF_DIR, batch_size=500)
    write_replay_batches(trades, str(tmp_path / "in"))
    stream = read_trades_json_stream(spark, str(tmp_path / "in"), max_files_per_trigger=1)
    q = (
        enrich_trades_with_dim(stream, _dim(spark))
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("enriched_out")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = (
        spark.sql("select * from enriched_out")
        .where(F.col("ts") < F.lit(SENTINEL_CUTOFF).cast("timestamp"))
        .where(F.col("symbol") != "__heartbeat__")
    )
    want = enrich_trades_with_dim(load_trades(spark, SF_DIR), _dim(spark))
    cols = ["symbol", "ts", "price", "quantity", "code", "tier"]
    g = sorted(map(tuple, got.select(*cols).collect()))
    w = sorted(map(tuple, want.select(*cols).collect()))
    assert g == w and len(g) > 0
    # unknown symbols survive with null dim columns
    assert any(r[4] is None for r in g)
    # known symbols enriched
    assert any(r[4] == "CLK" for r in g)


def test_stream_static_join_plan_broadcasts(spark):
    plan = (
        enrich_trades_with_dim(load_trades(spark, SF_DIR), _dim(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    # Spark renders shuffles as "Exchange hashpartitioning(...)"; only the
    # dim side's BroadcastExchange may appear.
    assert "Exchange hashpartitioning" not in plan
