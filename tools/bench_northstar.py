"""Benchmark the LLM-pipeline operators (dedup / similarity / text /
multimodal) at $SPARK_GRAFT_SF_DIR — the companion to the driver-contract
bench.py (which times the reference-parity candle queries C1-C7).

Prints one JSON line mirroring bench.py's shape. Not part of the driver
contract; exists so future rounds can track these operators' cost.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from stock_chart_kafka_streams_spark.session import get_spark

QUERIES = [
    "d1_dedup_exact",
    "d2_dedup_minhash_lsh",
    "d3_ngram_jaccard_pairs",
    "d4_simhash",
    "d5_embedding_neardup",
    "s1_cosine_topk",
    "s2_lsh_ann_topk",
    "t1_text_features",
    "mm1_decode_media",
    "mm4_features",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark(app_name="northstar-bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()

    queries["t1_text_features"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    timings = {}
    for name in QUERIES:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    print(
        json.dumps(
            {
                "metric": "northstar_ops_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
