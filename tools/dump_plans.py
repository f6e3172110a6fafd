"""Dump .explain("formatted") for every declared batch query to a dir.

Usage: python tools/dump_plans.py <out_dir> [sf_dir] [suffix] [only1,only2,...]

Writes <out_dir>/<query>_<suffix>.txt (suffix default "before"). Queries
whose CONSTRUCTION executes jobs (streaming replays, iterative k-means,
eager checkpoints — tools/plan_audit.py's SKIP set) get their plan dumped
anyway: the post-materialization plan is still what the serve/collect
executes, and the file notes the eager construction so the reader doesn't
over-interpret a trivial scan.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as e  # noqa: E402
from stock_chart_kafka_streams_spark.session import get_spark  # noqa: E402

EAGER = {
    "c12_streaming_late_drop",
    "c14_chained_hour",
    "d6_streaming_dedup",
    "ss1_click_attribution",
    "ss2_click_attribution_outer",
    "s3_ivf_ann_topk",
    "d7_neardup_clusters",
    "d3_ngram_jaccard_pairs",
    "c15_streaming_month",
    "ws1_streaming_sessions",
    "t7_vocabulary",
    "p11_dsir_importance",
    "p11b_dsir_select",
    "s5_pq_topk",
    "mm6_media_pq_topk",
    "d9b_incremental_minhash",
    "w16_streaming_corr",
    "p13_streaming_curation",
}


def main() -> None:
    out_dir = sys.argv[1]
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    suffix = sys.argv[3] if len(sys.argv) > 3 else "before"
    only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("dump-plans", master="local[4]", shuffle_partitions=4)
    qs = dict(e.queries())
    qs.update(e.extra_queries())
    for name, fn in qs.items():
        if only is not None and name not in only:
            continue
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        try:
            df = fn(spark, sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            plan = f"EXPLAIN FAILED: {exc!r}"
        header = ""
        if name in EAGER:
            header = (
                "# NOTE: this query's construction executes jobs (streaming "
                "replay / iterative training / eager checkpoint); the plan "
                "below is the final serve plan over the materialized state.\n"
            )
        with open(path, "w") as f:
            f.write(header + plan + "\n")
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
