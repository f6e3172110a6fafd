"""A/B the corr-table bootstrap write: repartition(bucket_date) (the
current shape — one task per date) vs a REBALANCE hint (AQE splits
oversized date partitions to advisory-size tasks and coalesces small
ones). Usage: python tools/profile_corr_write.py <trades_path>"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from stock_chart_kafka_streams_spark.operators.candles import candles
from stock_chart_kafka_streams_spark.operators.windows_ext import (
    rolling_correlation_matrix,
)
from stock_chart_kafka_streams_spark.session import get_spark

CORR_KEY = ["sym_a", "sym_b", "bucket_start"]


def main() -> None:
    trades_path = sys.argv[1]
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    spark = get_spark(app_name="profile-corr-write")
    spark.sparkContext.setLogLevel("ERROR")
    trades = spark.read.parquet(trades_path)
    t0 = time.perf_counter()
    rows = (
        rolling_correlation_matrix(candles(trades, "MINUTE"), n=20, frame="MINUTE")
        .withColumn("bucket_date", F.to_date("bucket_start"))
        .localCheckpoint(eager=True)
    )
    n = rows.count()
    print(f"matrix: {n} rows, checkpoint {time.perf_counter()-t0:.2f} s", flush=True)
    print(f"dates: {rows.select('bucket_date').distinct().count()}", flush=True)

    work = tempfile.mkdtemp(prefix="corrwrite-")
    try:
        for tag, shape in (
            ("repartition", lambda df: df.repartition("bucket_date")),
            ("rebalance", lambda df: df.hint("rebalance", "bucket_date")),
            ("repartition2", lambda df: df.repartition("bucket_date")),
            ("rebalance2", lambda df: df.hint("rebalance", "bucket_date")),
        ):
            out = os.path.join(work, tag)
            spark.sparkContext._jvm.System.gc()
            spark.sparkContext.setJobDescription(f"corr write: {tag}")
            t0 = time.perf_counter()
            (
                shape(rows)
                .sortWithinPartitions(*CORR_KEY)
                .write.mode("overwrite")
                .partitionBy("bucket_date")
                .parquet(out)
            )
            wall = time.perf_counter() - t0
            nfiles = sum(
                len([f for f in fs if f.endswith(".parquet")])
                for _, _, fs in os.walk(out)
            )
            print(f"{tag}: {wall:.2f} s, {nfiles} files", flush=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
