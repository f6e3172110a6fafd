"""Replicate the bench's p13 streaming-curation block standalone so the
per-batch walls can be measured before/after an ingest-hook change.

Usage: python tools/profile_p13.py <docs_path>
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from stock_chart_kafka_streams_spark.session import get_spark
from stock_chart_kafka_streams_spark.streaming.dedup import (
    foreach_batch_curation_ingest,
)


def main() -> None:
    docs_path = sys.argv[1]
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    spark = get_spark(app_name="profile-p13")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(4 * 1024 * 1024))
    docs = spark.read.parquet(docs_path)

    root = tempfile.mkdtemp(prefix="profile-p13-")
    try:
        bench_tab = os.path.join(root, "bench")
        corpus_tab = os.path.join(root, "corpus")
        buckets_tab = os.path.join(root, "buckets")
        docs.where(F.abs(F.hash("doc_id")) % 9973 == 0).write.parquet(bench_tab)
        hook = foreach_batch_curation_ingest(
            corpus_tab,
            bench_path=bench_tab,
            buckets_path=buckets_tab,
            gopher_min_words=40,
            gopher_required_min=1,
        )
        n_batches = 5
        slot = F.abs(F.hash("doc_id")) % n_batches
        walls = []
        for i in range(n_batches):
            batch = docs.where(slot == i).localCheckpoint(eager=True)
            spark.sparkContext._jvm.System.gc()
            spark.sparkContext.setJobDescription(f"p13 batch {i}")
            t0 = time.perf_counter()
            hook(batch, i)
            walls.append(round(time.perf_counter() - t0, 3))
            print(f"batch {i}: {walls[-1]:.3f} s", flush=True)
        print(f"walls: {walls}")
        print(f"corpus rows: {spark.read.parquet(corpus_tab).count()}")
    finally:
        shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
