"""Deterministic sampling/splitting operators (operators/sampling.py):
exact oracle parity is covered by tests/test_new_queries.py (p2/p3);
here the semantic properties — partition completeness, determinism,
fraction accuracy, salt independence."""

import pytest
from pyspark.sql import functions as F

from stock_chart_kafka_streams_spark.operators.sampling import (
    hash_split,
    stratified_sample,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_hash_split_partitions_every_row_once(spark, docs):
    out = hash_split(docs).cache()
    n = docs.count()
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) <= {"train", "val", "test"}
    assert sum(counts.values()) == n
    # 90/5/5 within binomial noise on 500 docs
    assert abs(counts["train"] / n - 0.9) < 0.06
    # deterministic: same rows land in the same split on a re-run
    again = hash_split(docs)
    assert out.select("doc_id", "split").exceptAll(again.select("doc_id", "split")).count() == 0


def test_hash_split_salt_draws_independent_split(spark, docs):
    a = hash_split(docs, salt="split-v1").select("doc_id", F.col("split").alias("a"))
    b = hash_split(docs, salt="split-v2").select("doc_id", F.col("split").alias("b"))
    moved = a.join(b, "doc_id").where(F.col("a") != F.col("b")).count()
    assert moved > 0  # a different salt is a genuinely different draw


def test_hash_split_rejects_bad_weights(docs):
    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(docs, weights={"train": 0.5, "test": 0.2})


def test_stratified_sample_respects_fractions_and_drops_unlisted(spark, docs):
    frac = {"en": 0.5, "de": 1.0}
    out = stratified_sample(docs, frac).cache()
    by_lang = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    totals = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert set(by_lang) <= set(frac)  # es/fr/zh dropped
    assert by_lang["de"] == totals["de"]  # fraction 1.0 keeps everything
    assert abs(by_lang["en"] / totals["en"] - 0.5) < 0.15
    # survivors are a subset of the input rows
    assert out.select("doc_id").exceptAll(docs.select("doc_id")).count() == 0


def test_stratified_sample_rejects_bad_fraction(docs):
    with pytest.raises(ValueError, match="fraction"):
        stratified_sample(docs, {"en": 1.5})


def test_null_ids_get_deterministic_membership_cross_engine(spark, duck):
    """ADVICE round 5: NULL doc_ids must hash via the same sentinel in
    both engines — Spark's concat_ws skips nulls while SQL || propagates
    them, so without the coalesce the engines disagreed on dirty rows."""
    from stock_chart_kafka_streams_spark.operators.sampling import (
        hash_split,
        hash_split_sql,
        stratified_sample,
        stratified_sample_sql,
    )

    docs = spark.createDataFrame(
        [(1, "en"), (None, "en"), (None, "fr"), (4, "fr")],
        "doc_id long, lang string",
    )
    duck.sql("CREATE OR REPLACE TABLE dirty(doc_id BIGINT, lang VARCHAR)")
    duck.sql(
        "INSERT INTO dirty VALUES (1,'en'), (NULL,'en'), (NULL,'fr'), (4,'fr')"
    )
    got = sorted(
        [(r["doc_id"], r["lang"], r["split"]) for r in hash_split(docs).collect()],
        key=str,
    )
    want = sorted(
        map(tuple, duck.sql(hash_split_sql(table="dirty")).fetchall()), key=str
    )
    assert got == want
    fr = {"en": 1.0, "fr": 0.5}
    got_s = sorted(
        [(r["doc_id"], r["lang"]) for r in stratified_sample(docs, fr).collect()],
        key=str,
    )
    want_s = sorted(
        [(r[0], r[1]) for r in duck.sql(stratified_sample_sql(fr, table="dirty")).fetchall()],
        key=str,
    )
    assert got_s == want_s
    # every NULL-id row received a decision (not dropped by hashing)
    assert sum(1 for g in got if g[0] is None) == 2


def test_quality_approx_tracks_exact_quantile(spark):
    """The sampled-threshold filter must approximate the exact rank cut:
    same strata, kept fraction in the right neighborhood, and every doc
    the approx form keeps has quality >= its stratum's elected
    threshold (at most sampling error away from the exact boundary)."""
    from pyspark.sql import functions as F

    from stock_chart_kafka_streams_spark.operators.sampling import (
        quality_quantile_filter,
        quality_quantile_filter_approx,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    exact = quality_quantile_filter(docs)  # keep 1/2 per lang
    approx = quality_quantile_filter_approx(docs)
    n = docs.count()
    n_approx = approx.count()
    # 10% sample at this SF is coarse; the kept fraction must still be in
    # the half's neighborhood, not 0% or 100%.
    assert 0.2 * n <= n_approx <= 0.8 * n
    # the approx-kept and exact-kept sets agree except near the boundary:
    # their overlap covers most of the smaller set
    both = approx.join(exact.select("doc_id"), "doc_id", "left_semi").count()
    assert both >= 0.7 * min(n_approx, exact.count())
    # threshold contract: no kept row below its stratum threshold
    assert approx.where(F.col("quality") < F.col("q_threshold")).count() == 0


def test_quality_approx_rejects_bad_fractions(spark):
    import pytest as _pytest

    from stock_chart_kafka_streams_spark.operators.sampling import (
        quality_quantile_filter_approx,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    with _pytest.raises(ValueError):
        quality_quantile_filter_approx(docs, sample_num=0)
    with _pytest.raises(ValueError):
        quality_quantile_filter_approx(docs, sample_num=3, sample_den=2)
    with _pytest.raises(ValueError):
        quality_quantile_filter_approx(docs, keep_den=0)
    # degenerate keep fractions are rejected (ADVICE r7): keep-nothing and
    # keep-everything do not survive threshold election, so the approx
    # form refuses them instead of silently diverging from the exact form
    with _pytest.raises(ValueError):
        quality_quantile_filter_approx(docs, keep_num=0)
    with _pytest.raises(ValueError):
        quality_quantile_filter_approx(docs, keep_num=3, keep_den=2)


# ---------------------------------------------------------------------------
# p11: DSIR hashed n-gram importance (oracle parity in test_new_queries)
# ---------------------------------------------------------------------------


def _styled_corpus(spark):
    """60 docs in two disjoint vocabularies: 'chem' style vs 'law' style.
    A chem-flavored target must score chem docs strictly above law docs."""
    chem = "benzene reacts with chlorine under ultraviolet light forming rings"
    law = "the plaintiff filed an appeal against the verdict of the court"
    rows = [(i, chem if i % 2 == 0 else law) for i in range(60)]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_dsir_target_style_outranks_off_style(spark):
    from stock_chart_kafka_streams_spark.operators.sampling import (
        dsir_importance,
        dsir_select,
    )

    docs = _styled_corpus(spark)
    # target: chem docs only (a strict subset of the chem half)
    target = docs.where((F.col("doc_id") % 2 == 0) & (F.col("doc_id") < 20))
    scored = dsir_importance(docs, target, n_buckets=512).collect()
    chem_scores = [r["mean_score"] for r in scored if r["doc_id"] % 2 == 0]
    law_scores = [r["mean_score"] for r in scored if r["doc_id"] % 2 == 1]
    assert min(chem_scores) > max(law_scores)
    # deterministic top-30 = exactly the chem half
    picked = {r["doc_id"] for r in dsir_select(docs, target, k=30, n_buckets=512).collect()}
    assert picked == {i for i in range(60) if i % 2 == 0}


def test_dsir_empty_target_scores_zero_both_engines(spark):
    import duckdb

    from stock_chart_kafka_streams_spark.operators.sampling import (
        dsir_importance,
        dsir_importance_sql,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = dsir_importance(docs, docs.where(F.lit(False)), n_buckets=256)
    assert out.where(F.col("score_sum") != 0).count() == 0
    # the twin's degenerate path agrees (no hidden error asymmetry)
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    want = con.sql(dsir_importance_sql(target_pred="FALSE", n_buckets=256)).df()
    con.close()
    assert (want["score_sum"] == 0).all()


def test_dsir_rejects_degenerate_parameters(spark):
    from stock_chart_kafka_streams_spark.operators.sampling import (
        dsir_importance,
        dsir_select,
        dsir_select_sql,
    )

    docs = _styled_corpus(spark)
    with pytest.raises(ValueError, match="n_buckets"):
        dsir_importance(docs, docs, n_buckets=0)
    with pytest.raises(ValueError, match="k must"):
        dsir_select(docs, docs, k=0)
    with pytest.raises(ValueError, match="k must"):
        dsir_select_sql(k=0)


def test_dsir_scores_are_run_deterministic(spark):
    from stock_chart_kafka_streams_spark.operators.sampling import dsir_importance

    docs = _styled_corpus(spark).repartition(7)
    target = docs.where(F.col("doc_id") % 2 == 0)
    a = dsir_importance(docs, target, n_buckets=512)
    b = dsir_importance(docs.repartition(3), target, n_buckets=512)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


# ---------------------------------------------------------------------------
# p12: epoch-capped mixture upsampling (oracle parity in test_new_queries)
# ---------------------------------------------------------------------------


def test_epoch_upsample_counts_and_cap(spark, docs):
    from stock_chart_kafka_streams_spark.operators.sampling import (
        epoch_mixture_upsample,
    )

    rates = {"src0": 2.0, "src1": 9.0}  # src1 clips at max_epochs=3
    out = epoch_mixture_upsample(docs, rates, max_epochs=3).cache()
    n0 = docs.where(F.col("source") == "src0").count()
    n1 = docs.where(F.col("source") == "src1").count()
    by_src = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert by_src == {"src0": 2 * n0, "src1": 3 * n1}  # integral rates exact
    # unlisted sources dropped entirely
    assert set(by_src) == {"src0", "src1"}
    # epoch key bounds: 0-based, below the clipped epoch count
    assert out.agg(F.max("epoch")).first()[0] <= 2
    assert out.agg(F.min("epoch")).first()[0] == 0


def test_epoch_upsample_fractional_epoch_is_a_genuine_draw(spark, docs):
    from stock_chart_kafka_streams_spark.operators.sampling import (
        epoch_mixture_upsample,
    )

    out = epoch_mixture_upsample(docs, {"src0": 1.5}).cache()
    n = docs.where(F.col("source") == "src0").count()
    total = out.count()
    # epoch 0 complete, epoch 1 ~ half (binomial noise on 25 docs)
    assert out.where(F.col("epoch") == 0).count() == n
    assert n < total < 2 * n
    # deterministic: identical on a re-run
    again = epoch_mixture_upsample(docs, {"src0": 1.5})
    assert out.exceptAll(again).count() == 0 and again.exceptAll(out).count() == 0


def test_epoch_upsample_rejects_degenerate_parameters(docs):
    from stock_chart_kafka_streams_spark.operators.sampling import (
        epoch_mixture_upsample,
        epoch_mixture_upsample_sql,
    )

    with pytest.raises(ValueError, match="max_epochs"):
        epoch_mixture_upsample(docs, {"src0": 1.0}, max_epochs=0)
    with pytest.raises(ValueError, match="at least one"):
        epoch_mixture_upsample(docs, {})
    with pytest.raises(ValueError, match="must be > 0"):
        epoch_mixture_upsample(docs, {"src0": 0.0})
    with pytest.raises(ValueError, match="must be > 0"):
        epoch_mixture_upsample_sql({"src0": -1.0})


def test_p11_p12_cross_engine_fuzz(spark):
    """Seeded fuzz for the new sampling operators: random short docs
    (mixed-case words, digits, punctuation, empty strings, NULL text) and
    random sources — Spark and DuckDB must agree row-for-row on DSIR
    scores (exact BIGINT sums + quantized ratio weights) and on the
    epoch-upsample membership (md5 threshold draw). The dialect-drift
    detector the t8/t10 fuzzes pioneered, pointed at gram hashing and
    the fractional-epoch hash."""
    import random

    import duckdb
    import pandas as pd

    from stock_chart_kafka_streams_spark.operators.sampling import (
        dsir_importance,
        dsir_importance_sql,
        epoch_mixture_upsample,
        epoch_mixture_upsample_sql,
    )

    rng = random.Random(20260815)
    words = ["Alpha", "beta", "GAMMA", "d3lta", "x", "", "42", "e-mail", "a b"]
    rows = []
    for i in range(200):
        if rng.random() < 0.05:
            txt = None
        else:
            txt = " ".join(rng.choice(words) for _ in range(rng.randint(0, 12)))
        rows.append((i, txt, f"src{rng.randint(0, 3)}"))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "source"])
    sdf_in = spark.createDataFrame(pdf)
    con = duckdb.connect()
    con.register("fuzz_docs", pdf)

    got = (
        dsir_importance(sdf_in, sdf_in.where(F.col("doc_id") % 7 == 0), n_buckets=97)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    want = (
        con.sql(dsir_importance_sql(table="fuzz_docs", target_pred="doc_id % 7 = 0",
                                    n_buckets=97))
        .df().sort_values("doc_id").reset_index(drop=True)
    )
    for col in ("n_grams", "score_sum"):
        assert (got[col].astype("int64") == want[col].astype("int64")).all(), col
    assert (got["mean_score"] - want["mean_score"]).abs().max() < 1e-12

    rates = {"src0": 1.25, "src1": 3.0, "src2": 0.4}
    got_e = (
        epoch_mixture_upsample(sdf_in, rates)
        .select("doc_id", "epoch").toPandas()
        .sort_values(["doc_id", "epoch"]).reset_index(drop=True)
    )
    want_e = (
        con.sql(epoch_mixture_upsample_sql(rates, table="fuzz_docs"))
        .df()[["doc_id", "epoch"]]
        .sort_values(["doc_id", "epoch"]).reset_index(drop=True)
    )
    con.close()
    assert len(got_e) == len(want_e)
    assert (got_e["doc_id"].values == want_e["doc_id"].values).all()
    assert (got_e["epoch"].astype("int64").values
            == want_e["epoch"].astype("int64").values).all()


def test_dsir_persist_grams_is_value_identical(spark):
    from stock_chart_kafka_streams_spark.operators.sampling import dsir_importance

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    target = docs.where(F.col("doc_id") % 7 == 0)
    a = dsir_importance(docs, target, n_buckets=256)
    b = dsir_importance(docs, target, n_buckets=256, persist_grams=True)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


# -- d10: domain cap + source mix stats (round 10) ---------------------------


def test_domain_cap_bounds_every_source_and_is_deterministic(spark, docs):
    from stock_chart_kafka_streams_spark.operators.sampling import domain_cap

    capped = domain_cap(docs, cap=7)
    per_source = {
        r["source"]: r["n"]
        for r in capped.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    orig = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    for src, n in per_source.items():
        assert n == min(7, orig[src]), src
    # deterministic: same selection on re-run
    a = sorted(r["doc_id"] for r in capped.collect())
    b = sorted(r["doc_id"] for r in domain_cap(docs, cap=7).collect())
    assert a == b


def test_domain_cap_two_phase_equals_flat_window(spark, docs):
    """The sharded two-phase cut must select the IDENTICAL rows a flat
    per-source window picks (the s5 argument, asserted here on data)."""
    from pyspark.sql.window import Window

    from stock_chart_kafka_streams_spark.operators.sampling import domain_cap

    flat_w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")).asc(), F.col("doc_id").asc()
    )
    flat = (
        docs.withColumn("__r", F.row_number().over(flat_w))
        .where(F.col("__r") <= 7)
        .drop("__r")
    )
    got = sorted(r["doc_id"] for r in domain_cap(docs, cap=7, shards=4).collect())
    want = sorted(r["doc_id"] for r in flat.collect())
    assert got == want


def test_domain_cap_rejects_bad_params(spark, docs):
    from stock_chart_kafka_streams_spark.operators.sampling import (
        domain_cap,
        domain_cap_sql,
    )

    with pytest.raises(ValueError, match="cap"):
        domain_cap(docs, cap=0)
    with pytest.raises(ValueError, match="shards"):
        domain_cap(docs, cap=5, shards=0)
    with pytest.raises(ValueError, match="cap"):
        domain_cap_sql(cap=0)


def test_source_mix_stats_counts_planted_dups(spark):
    from stock_chart_kafka_streams_spark.operators.sampling import source_mix_stats

    rows = [
        (1, "same text body", "a"),
        (2, "same text body", "a"),   # exact dup within source a
        (3, "unique text here", "a"),
        (4, "other source text", "b"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r["source"]: r for r in source_mix_stats(df).collect()}
    assert got["a"]["n_docs"] == 3 and got["a"]["n_unique"] == 2
    assert abs(got["a"]["dup_rate"] - (1 - 2 / 3)) < 1e-12
    assert got["b"]["dup_rate"] == 0.0
    assert got["a"]["mean_chars"] == (14 + 14 + 16) / 3
