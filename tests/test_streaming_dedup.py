"""Streaming exact-dedup semantics over the replay harness."""

import datetime as dt
import json
import os

from pyspark.sql import functions as F

from stock_chart_kafka_streams_spark.schemas import KAFKA_TRADE_JSON_SCHEMA
from stock_chart_kafka_streams_spark.streaming.dedup import dedup_stream_exact


def test_duplicates_within_watermark_dropped(spark, tmp_path):
    inp = tmp_path / "in"
    inp.mkdir()
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        # batch 0: original + in-batch duplicate
        [("AAPL", 10.0, 1, base), ("AAPL", 10.0, 1, base), ("MSFT", 5.0, 2, base)],
        # batch 1: cross-batch duplicate (within watermark) + new row
        [("AAPL", 10.0, 1, base), ("AAPL", 11.0, 3, base + dt.timedelta(minutes=1))],
    ]
    for i, batch in enumerate(rows):
        p = inp / f"b{i:03d}.json"
        with open(p, "w") as f:
            for s, pr, q, ts in batch:
                f.write(
                    json.dumps(
                        {"symbol": s, "price": pr, "quantity": q, "ts": ts.isoformat()}
                    )
                    + "\n"
                )
        os.utime(p, (1_700_000_000 + i,) * 2)

    stream = (
        spark.readStream.schema(KAFKA_TRADE_JSON_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(str(inp))
    )
    deduped = dedup_stream_exact(stream, watermark_delay="1 hour")
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("select symbol, price, quantity from dedup_out").collect()
    assert sorted((r["symbol"], r["price"], r["quantity"]) for r in got) == [
        ("AAPL", 10.0, 1),
        ("AAPL", 11.0, 3),
        ("MSFT", 5.0, 2),
    ]


def test_connected_components_multi_hop_chain(spark):
    """A 5-node path graph forces label propagation past one round: node 4
    only reaches label 0 after ~4 rounds. Also: two components + an
    isolated node."""
    from stock_chart_kafka_streams_spark.operators.dedup import connected_components

    nodes = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (5, 6)], "id_a long, id_b long"
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(nodes, edges).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 0, 5: 5, 6: 5, 7: 7}
