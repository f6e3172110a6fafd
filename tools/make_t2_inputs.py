"""Materialize the bench's tier-2 inputs to a persistent dir so
`bench.py --isolated <entry> <trades> <docs> <embs>` can measure heavy
entries before/after an optimization without re-running the whole suite.

Usage: python tools/make_t2_inputs.py <out_dir>
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from stock_chart_kafka_streams_spark.session import get_spark


def main() -> None:
    out = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out, exist_ok=True)
    spark = get_spark(app_name="t2-inputs")
    spark.sparkContext.setLogLevel("ERROR")
    trades, docs, embs, n_trades, n_docs = bench._tier2_inputs(spark, sf_dir, out)
    print(f"trades={trades} docs={docs} embs={embs} rows={n_trades}/{n_docs}")
    spark.stop()


if __name__ == "__main__":
    main()
