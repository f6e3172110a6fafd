"""Serving-table read path: partition pruning + pushdown must reach the
scan (the engine's replacement for the reference's Redis key-addressed
reads, SURVEY §3.3)."""

from pyspark.sql import functions as F

from stock_chart_kafka_streams_spark import CandleStore, load_trades, multi_frame_candles
from stock_chart_kafka_streams_spark.streaming.sink import write_candles

SF_DIR = "/root/testdata/sf0.001"


def test_from_path_queries_and_pruning(spark, tmp_path):
    table = str(tmp_path / "serving")
    mf = multi_frame_candles(load_trades(spark, SF_DIR)).localCheckpoint()
    write_candles(mf, table)

    store = CandleStore.from_path(spark, table)
    # results through the disk path equal the in-memory path
    disk = store.get_candles("click", "DAY", "2024-01-05", "2024-01-20")
    mem = (
        CandleStore(mf)
        .get_candles("click", "DAY", "2024-01-05", "2024-01-20")
        .collect()
    )
    assert [r.asDict() for r in disk.drop("bucket_date").collect()] == [
        r.asDict() for r in mem
    ]

    # the point-lookup scan must prune partitions: only time_frame=DAY &
    # one bucket_date directory may appear in the file listing
    plan = (
        store.point("click", "DAY", 2024, 1, 5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan
    assert "time_frame" in plan.split("PartitionFilters")[1][:400]


def test_disk_store_recent_and_catalog(spark, tmp_path):
    table = str(tmp_path / "serving2")
    mf = multi_frame_candles(load_trades(spark, SF_DIR)).localCheckpoint()
    write_candles(mf, table)
    store = CandleStore.from_path(spark, table)
    assert store.recent("click", "HOUR", n=5).count() == 5
    assert store.symbols().count() == 5
    assert store.catalog(frame="MONTH").count() == 5
