"""p9 curation pipeline: quality_mode plan-shape guarantees and
persist_stages materialization (round 8 — the r7 verdict's #1/#2 items).
Exact oracle parity for the composed pipeline is in test_new_queries /
the driver sim; these tests pin the SCALE properties:

- approx mode (the default) must not contain a whole-stratum window sort
  anywhere in its optimized plan — every strata-partitioned window must
  sit above the md5 hash-sample filter (only the sample is sorted);
- approx and exact modes must agree on the surviving training set except
  near the quantile boundary;
- persist_stages=True must leave ZERO source scans in the final plan
  (each stage boundary materialized once) and produce the identical
  packed result.
"""

import re

from pyspark.sql import functions as F

from stock_chart_kafka_streams_spark.operators.pipeline import (
    curation_pipeline,
    quality_stage,
)

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _tree_depth(line: str) -> int:
    m = re.search(r"[+:]-", line)
    return m.start() if m else -1


def _strata_windows_missing_sample_guard(df, strata_col: str = "lang") -> list[str]:
    """Window nodes partitioned by the stratum key whose input subtree has
    no md5 hash-sample filter — i.e. whole-stratum single-task sorts. The
    optimized logical plan prints children below their parent at greater
    indent, so a node's subtree is the run of deeper-indented lines
    following it."""
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    lines = plan.splitlines()
    bad = []
    for i, line in enumerate(lines):
        if f"windowspecdefinition({strata_col}#" not in line:
            continue
        d = _tree_depth(line)
        subtree = []
        for nxt in lines[i + 1 :]:
            dn = _tree_depth(nxt)
            if 0 <= dn <= d:
                break
            subtree.append(nxt)
        if not any("md5(" in s for s in subtree):
            bad.append(line.strip()[:120])
    return bad


def test_quality_stage_approx_windows_are_sample_guarded(spark):
    docs = _docs(spark)
    assert _strata_windows_missing_sample_guard(quality_stage(docs, "approx")) == []
    # the exact mode IS the whole-stratum window (the documented
    # small-strata form) — the detector must see it, or it detects nothing
    assert _strata_windows_missing_sample_guard(quality_stage(docs, "exact")) != []


def test_pipeline_default_plan_has_no_whole_stratum_window(spark):
    """The composed p9 plan (defaults) must carry the approx quality
    shape end-to-end: no strata-partitioned window over unsampled input
    anywhere in the 5-stage DAG."""
    packed = curation_pipeline(_docs(spark), threshold=0.4)
    assert _strata_windows_missing_sample_guard(packed) == []


def test_pipeline_approx_vs_exact_survivor_overlap(spark):
    """Approx and exact quality modes differ only near the per-stratum
    quantile boundary, so the packed training sets must agree on most
    documents (the downstream stages are deterministic in their input)."""
    docs = _docs(spark)
    approx = curation_pipeline(docs, threshold=0.4, quality_mode="approx")
    exact = curation_pipeline(docs, threshold=0.4, quality_mode="exact")
    a_ids = {r["doc_id"] for r in approx.select("doc_id").collect()}
    e_ids = {r["doc_id"] for r in exact.select("doc_id").collect()}
    assert a_ids and e_ids
    overlap = len(a_ids & e_ids)
    assert overlap >= 0.7 * min(len(a_ids), len(e_ids))


def test_pipeline_persist_stages_result_identical_and_scanless(spark):
    """persist_stages=True materializes each stage boundary: the FINAL
    plan must contain zero parquet/file scans (everything downstream of
    checkpointed RDDs), and the packed result must be bit-identical to
    the one-plan form."""
    docs = _docs(spark)
    plain = curation_pipeline(docs, threshold=0.4)
    persisted = curation_pipeline(docs, threshold=0.4, persist_stages=True)

    plan_plain = plain._jdf.queryExecution().optimizedPlan().toString()
    plan_persist = persisted._jdf.queryExecution().optimizedPlan().toString()
    n_scans_plain = plan_plain.count("Relation") + plan_plain.count("FileScan")
    n_scans_persist = plan_persist.count("Relation") + plan_persist.count("FileScan")
    assert "parquet" not in plan_persist
    assert "parquet" in plan_plain
    assert n_scans_persist < n_scans_plain

    key = lambda r: (r["doc_id"], r["shard"], r["seq_id"])
    got = sorted((tuple(r.asDict().items()) for r in persisted.collect()), key=str)
    want = sorted((tuple(r.asDict().items()) for r in plain.collect()), key=str)
    assert got == want and len(got) > 0


def test_pipeline_rejects_unknown_quality_mode(spark):
    import pytest

    with pytest.raises(ValueError):
        curation_pipeline(_docs(spark), quality_mode="bogus")
    with pytest.raises(ValueError):
        quality_stage(_docs(spark), "bogus")


def test_quality_stage_gopher_is_pure_filter(spark):
    """quality_mode='gopher' (round 9): the stage is a map-side WHERE over
    the raw text — no join, no window, no sample election in the plan —
    and its survivors are exactly the docs gopher_quality keeps."""
    from stock_chart_kafka_streams_spark.operators.pipeline import quality_stage
    from stock_chart_kafka_streams_spark.operators.text import gopher_quality

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    stage = quality_stage(
        docs, quality_mode="gopher", gopher_min_words=40, gopher_required_min=1
    )
    plan = stage._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan and "Window" not in plan
    got = {r["doc_id"] for r in stage.collect()}
    want = {
        r["doc_id"]
        for r in gopher_quality(docs, min_words=40, required_min=1)
        .where(F.col("keep"))
        .collect()
    }
    assert got == want and len(got) > 0


def test_pipeline_domain_cap_equals_manual_composition(spark):
    """domain_cap_n must be exactly 'quality -> d10 cap -> rest of the
    pipeline': same packed output as composing the stages by hand, and
    never MORE survivors than the uncapped run."""
    from stock_chart_kafka_streams_spark.operators.dedup import dedup_minhash
    from stock_chart_kafka_streams_spark.operators.pipeline import quality_stage
    from stock_chart_kafka_streams_spark.operators.sampling import (
        domain_cap,
        hash_split,
        pack_sequences,
    )
    from stock_chart_kafka_streams_spark.operators.text import decontaminate

    docs = _docs(spark)
    packed = curation_pipeline(docs, threshold=0.4, domain_cap_n=5)

    capped = domain_cap(quality_stage(docs), 5)
    bench = docs.where(F.col("doc_id") % 97 == 0)
    dd = dedup_minhash(capped)
    contam = (
        decontaminate(dd, bench, threshold=0.4)
        .where(F.col("contaminated"))
        .select("doc_id")
    )
    cl = dd.join(contam, on="doc_id", how="left_anti")
    sp = hash_split(cl).where(F.col("split") == "train")
    manual = pack_sequences(sp, budget=2048, n_shards=64)
    assert sorted(map(tuple, packed.collect())) == sorted(
        map(tuple, manual.collect())
    )
    uncapped = curation_pipeline(docs, threshold=0.4)
    assert packed.count() <= uncapped.count()
