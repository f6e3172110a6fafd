"""Physical-plan audit across the query surface.

Explains every BATCH query (building the DataFrame only — queries whose
construction executes jobs, i.e. streaming replays and iterative
operators, are skipped) and reports per query:

- exchanges (shuffles), broadcast vs sort-merge joins, cartesian joins
- parquet scans lacking PushedFilters when the plan filters rows
- whole-stage-codegen span count (a proxy for interpreted gaps)

Usage:  python tools/plan_audit.py [sf_dir]

This is a review tool, not a gate: some patterns are intended (documented
broadcast crossJoins, global sorts for ordered range outputs). Its value
is the diff round-over-round — a new cartesian or a vanished pushdown is
a regression worth reading.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as e  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

# Building these executes work (streaming replays, iterative k-means /
# label propagation, eager localCheckpoints) — explain after the fact
# would audit a trivial post-materialization plan anyway.
SKIP = {
    "c12_streaming_late_drop",
    "c14_chained_hour",
    "d6_streaming_dedup",
    "ss1_click_attribution",
    "ss2_click_attribution_outer",
    "s3_ivf_ann_topk",
    "d7_neardup_clusters",
    "d3_ngram_jaccard_pairs",  # eager candidate checkpoint by design
    "c15_streaming_month",  # streaming replay (round 6)
    "ws1_streaming_sessions",  # streaming replay (round 6)
    # t7's top_n cut collects eagerly (bounded TakeOrdered, round 9);
    # its no-window plan shape is pytest-asserted in
    # tests/test_corpus_filters.py::test_vocabulary_stats_plan_has_no_window*
    "t7_vocabulary",
    # eager bounded materialization by design (round 9): p11 checkpoints
    # its two <= n_buckets bucket-count aggregates; s5 runs codebook
    # training jobs at construction (the d8/s3 k-means pattern)
    "p11_dsir_importance",
    "p11b_dsir_select",
    "s5_pq_topk",
    "mm6_media_pq_topk",  # PQ codebook training jobs at construction
    # d9's minhash mode checkpoints its candidate pairs eagerly (the d3
    # pattern) — construction executes the cross-table band join
    "d9b_incremental_minhash",
}

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

spark = (
    SparkSession.builder.master("local[4]")
    .appName("plan-audit")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)


def strata_windows_unsampled(df, strata_col: str = "lang") -> int:
    """Count Window nodes partitioned by the corpus stratum key whose
    input subtree has no md5 hash-sample filter — whole-stratum
    single-task sorts (the r7 p9 finding). p7's exact form is the one
    INTENDED hit (documented small-strata variant); anything else is a
    regression. Same detector as tests/test_curation_pipeline.py."""
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    lines = plan.splitlines()
    depth = lambda l: (m.start() if (m := re.search(r"[+:]-", l)) else -1)
    n = 0
    for i, line in enumerate(lines):
        if f"windowspecdefinition({strata_col}#" not in line:
            continue
        d = depth(line)
        sub = []
        for nxt in lines[i + 1 :]:
            dn = depth(nxt)
            if 0 <= dn <= d:
                break
            sub.append(nxt)
        if not any("md5(" in s for s in sub):
            n += 1
    return n


def unpartitioned_windows(df) -> int:
    """Count logical Window nodes with an EMPTY partition spec — the
    single-task funnel Spark warns about at runtime as
    ``WindowExec: No Partition Defined`` (the r8 t7 finding). A
    partitioned Window prints three top-level bracket groups
    (``Window [exprs], [partition], [order]``); an unpartitioned one
    prints two. Nonzero is only acceptable over an input already bounded
    by a limit/aggregate (p8's n_shards offsets window is the documented
    case)."""
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    n = 0
    for line in plan.splitlines():
        s = line.lstrip(" +:-")
        if not s.startswith("Window ["):
            continue
        # split the node's top-level [..] groups: [exprs], then an
        # OPTIONAL [partitionSpec], then an OPTIONAL [orderSpec] (empty
        # specs are omitted from simpleString, so group COUNT alone is
        # ambiguous — a partition-only window and an order-only window
        # both print two groups)
        depth, groups, cur = 0, [], []
        for ch in s[len("Window ") :]:
            if ch == "[":
                depth += 1
                if depth == 1:
                    cur = []
                    continue
            elif ch == "]":
                depth -= 1
                if depth == 0:
                    groups.append("".join(cur))
                    continue
            if depth >= 1:
                cur.append(ch)
        if len(groups) >= 3:
            continue  # both partition and order specs present
        # two groups: global iff the spec group is an ORDER spec (sort
        # directions) rather than a bare partition attribute list
        if len(groups) == 2 and re.search(r"(ASC|DESC) NULLS", groups[1]):
            n += 1
    return n


def audit(name: str, df) -> dict:
    try:
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    except Exception:
        plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        "query": name,
        "exchanges": len(re.findall(r"\bExchange\b|\(\d+\) Exchange", plan)) // 2,
        "bhj": plan.count("BroadcastHashJoin"),
        "smj": plan.count("SortMergeJoin"),
        "cartesian": plan.count("CartesianProduct")
        + plan.count("BroadcastNestedLoopJoin"),
        # NOTE: no codegen-span metric here — under AQE the pre-execution
        # plan carries no [codegen id] annotations, so it cannot be read
        # without running the query. Codegen regressions surface instead
        # as janino errors in the driver-sim stderr (how the s2 64 KB
        # overflow was caught).
        "scans": plan.count("Scan parquet"),
        "pushed": plan.count("PushedFilters: ["),
        "empty_pushed": plan.count("PushedFilters: []"),
        "stratum_sorts": strata_windows_unsampled(df),
        "global_windows": unpartitioned_windows(df),
    }


rows = []
for name, fn in {**e.queries(), **e.extra_queries()}.items():
    if name in SKIP:
        continue
    try:
        rows.append(audit(name, fn(spark, SF)))
    except Exception as ex:  # pragma: no cover - audit robustness
        rows.append({"query": name, "error": str(ex)[:80]})

hdr = [
    "query", "exchanges", "bhj", "smj", "cartesian", "scans", "pushed",
    "empty_pushed", "stratum_sorts", "global_windows",
]
print("\t".join(hdr))
for r in rows:
    if "error" in r:
        print(f"{r['query']}\tERROR: {r['error']}")
        continue
    print("\t".join(str(r.get(h, "")) for h in hdr))

flags = [
    r["query"]
    for r in rows
    if "error" not in r and r["cartesian"] > 0 and not r["query"].startswith(("s1", "s2"))
]
# Reviewed flags (see PERF.md round 5): t5's BroadcastNestedLoopJoin is
# the 1-row corpus-count broadcast — constant build side, intended.
print("\ncartesian to review (1-row count broadcasts are fine):", flags or "none")

gw_flags = [
    r["query"]
    for r in rows
    if "error" not in r and r.get("global_windows", 0) > 0
]
# Reviewed (round 9): p8's offsets window runs over n_shards rows (bounded
# by construction); p7 exact's per-stratum cut windows are partitioned and
# don't hit this. Anything NEW here is a t7-class single-task funnel.
print("global windows to review (bounded-input ones are fine):", gw_flags or "none")
