"""PII scrubbing (operators/privacy.py) and the deterministic global
interleave (operators/sampling.py::global_interleave).

The driver-canonical oracle compare for the t8/p8 query keys lives in
tests/test_new_queries.py; here we pin behavior the hash compare can't
see: EXACT redacted strings on crafted rows (so a regex dialect drift
that changed both engines identically would still be caught), the NULL
contract, and the permutation/stability properties of the interleave.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from stock_chart_kafka_streams_spark.operators.privacy import (
    pii_scrub,
    with_synthetic_pii,
)
from stock_chart_kafka_streams_spark.operators.sampling import global_interleave


def _scrub_one(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return pii_scrub(df).collect()[0]


def test_email_redaction_exact(spark):
    r = _scrub_one(spark, "mail bob.smith+x@sub.example.co.uk now")
    assert r.clean_text == "mail <EMAIL> now"
    assert (r.n_email, r.n_ipv4, r.n_phone, r.n_pii) == (1, 0, 0, 1)


def test_ipv4_and_phone_redaction_exact(spark):
    r = _scrub_one(spark, "from 192.168.0.1 call 555-123-4567 or 555.987.6543")
    assert r.clean_text == "from <IP> call <PHONE> or <PHONE>"
    assert (r.n_email, r.n_ipv4, r.n_phone, r.n_pii) == (0, 1, 2, 3)


def test_dotted_quad_never_half_matches_phone(spark):
    # ipv4 runs before phone, so a dotted quad can't leave a phone-shaped
    # tail; counts are per-pattern on the ORIGINAL text.
    r = _scrub_one(spark, "10.200.300.400 stays odd but 1.2.3.4 is an ip")
    assert "<PHONE>" not in r.clean_text
    assert r.n_ipv4 == 2  # both digit quads match the bounded pattern


def test_email_consumed_before_digit_patterns(spark):
    r = _scrub_one(spark, "u123-456-7890@example.org")
    # the whole token is one email; no phone left behind
    assert r.clean_text == "<EMAIL>"
    assert (r.n_email, r.n_phone) == (1, 0)


def test_phone_format_variants_exact(spark):
    # The broadened NANP pattern (round 7): parens, space separators,
    # +1/1 country prefix, bare 10-digit runs — each redacted as ONE
    # match; the leading \b rides on the digit alternatives only.
    r = _scrub_one(spark, "a (555) 123-4567 b +1 555 123 4567 c 5551234567 d")
    assert r.clean_text == "a <PHONE> b <PHONE> c <PHONE> d"
    assert (r.n_phone, r.n_pii) == (3, 3)


def test_phone_no_boundary_no_match(spark):
    # Digit runs embedded in longer tokens must NOT match (\b guards).
    r = _scrub_one(spark, "id x55512345678 and 123-456-78901 stay")
    assert r.n_phone == 0
    assert "<PHONE>" not in r.clean_text


def test_null_text_contract(spark):
    r = _scrub_one(spark, None)
    assert r.clean_text == ""
    assert (r.n_email, r.n_ipv4, r.n_phone, r.n_pii) == (0, 0, 0, 0)


def test_clean_text_has_no_residual_pii(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = pii_scrub(with_synthetic_pii(docs))
    seeded = out.where(F.col("n_pii") > 0)
    # every 7th doc got exactly email+ip+phone seeded
    assert seeded.count() == docs.where(F.col("doc_id") % 7 == 0).count()
    assert seeded.where(F.col("n_pii") < 3).count() == 0
    rescrub = pii_scrub(
        out.select(F.col("doc_id"), F.col("clean_text").alias("text"))
    )
    assert rescrub.where(F.col("n_pii") > 0).count() == 0


def test_global_interleave_is_a_permutation(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n = docs.count()
    out = global_interleave(docs, n_shards=16)
    pos = [r.pos for r in out.select("pos").collect()]
    assert sorted(pos) == list(range(n))


def test_global_interleave_reuses_one_corpus_scan(spark):
    # global_interleave's single-scan plan depends on optimizer-coupled
    # tricks (the no-op isNotNull filter, max(rn) instead of a count) to
    # keep both branches bit-identical for ReuseExchange. A Spark upgrade
    # could silently regress this to a double corpus scan — pin it at the
    # plan level: after execution, the final adaptive plan must contain a
    # ReusedExchange (the sizes branch riding the output branch's shard
    # exchange instead of rescanning the corpus).
    #
    # Hermetic: other tests (test_northstar) .cache() this parquet on the
    # shared session; a cache hit swaps the scan for InMemoryTableScan
    # and changes which reuse fires, so clear it first.
    spark.catalog.clearCache()
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    df = global_interleave(docs, n_shards=16)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "ReusedExchange" in plan, (
        "sizes branch no longer shares the corpus scan/shard exchange:\n"
        + plan[:2000]
    )


def test_global_interleave_stable_under_partitioning(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = {r.doc_id: r.pos for r in global_interleave(docs, n_shards=16).collect()}
    b = {
        r.doc_id: r.pos
        for r in global_interleave(docs.repartition(7), n_shards=16).collect()
    }
    assert a == b


def test_pii_scrub_cross_engine_fuzz(spark, duck):
    """Seeded fuzz over the PII-adjacent alphabet (digits, separators,
    parens, @, dots): Spark's Java-regex result must equal DuckDB's RE2
    result byte-for-byte on every generated string — the dialect-drift
    detector for the Java∩RE2 pattern subset the module promises."""
    import random

    from stock_chart_kafka_streams_spark.operators.privacy import (
        pii_scrub,
        pii_scrub_sql,
    )

    rng = random.Random(20260814)
    alphabet = list("0123456789()+-. @abcxyz")
    frags = [
        "555-123-4567", "(555) 123-4567", "+1 555 123 4567", "5551234567",
        "1.2.3.4", "10.200.300.400", "a@b.co", "x.y+z@mail.example.org",
        "12345", "123-45", "555.123.4567", "1 555 123 4567", "((55) )",
    ]
    rows = []
    for i in range(300):
        parts = []
        for _ in range(rng.randint(1, 6)):
            if rng.random() < 0.5:
                parts.append(rng.choice(frags))
            else:
                parts.append(
                    "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 14)))
                )
            parts.append(rng.choice([" ", "", " x "]))
        rows.append((i, "".join(parts)))
    sdf = pii_scrub(
        spark.createDataFrame(rows, "doc_id long, text string")
    ).toPandas().sort_values("doc_id").reset_index(drop=True)
    duck.register(
        "fuzz_docs",
        __import__("pandas").DataFrame(rows, columns=["doc_id", "text"]),
    )
    ddf = (
        duck.sql(pii_scrub_sql(table="fuzz_docs"))
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for col in ("clean_text", "n_email", "n_ipv4", "n_phone", "n_pii"):
        mism = [
            (i, sdf[col][i], ddf[col][i], rows[i][1])
            for i in range(len(rows))
            if sdf[col][i] != ddf[col][i]
        ]
        assert not mism, f"{col} diverges on {len(mism)} rows, first: {mism[0]}"
