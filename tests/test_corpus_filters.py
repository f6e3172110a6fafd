"""Semantic checks for the corpus-filtering operators (repetition stats,
benchmark decontamination); exact oracle parity is in test_new_queries."""

from pyspark.sql import functions as F

from stock_chart_kafka_streams_spark.operators.text import (
    decontaminate,
    repetition_stats,
)


def test_repetition_flags_degenerate_docs(spark):
    docs = spark.createDataFrame(
        [
            (1, "spam " * 50),                      # one token repeated
            (2, "the quick brown fox " * 30),       # 4-gram loop
            (3, "a b c d e f g h i j k l m n o p"), # all distinct
            (4, ""),                                # empty
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert rows[1]["is_repetitive"] and rows[1]["top_token_frac"] == 1.0
    assert rows[2]["is_repetitive"] and rows[2]["dup_trigram_frac"] > 0.9
    assert not rows[3]["is_repetitive"]
    assert rows[3]["dup_trigram_frac"] == 0.0
    assert rows[4]["n_tokens"] == 0 and rows[4]["top_token_frac"] == 0.0


def test_decontaminate_flags_benchmark_members_fully(spark):
    text = (
        "some sufficiently long shared passage of text that winnowing "
        "will fingerprint reliably across documents in this test corpus"
    )
    docs = spark.createDataFrame(
        [
            (1, text),                       # identical to benchmark doc
            (2, "totally different content about unrelated matters and "
                "nothing in common with the held out evaluation passage"),
            (3, text + " plus an extra unique suffix tail of words"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(100, text)], "doc_id long, text string")
    rows = {r["doc_id"]: r for r in decontaminate(docs, bench).collect()}
    assert rows[1]["contaminated"] and rows[1]["overlap_frac"] == 1.0
    assert not rows[2]["contaminated"] and rows[2]["n_hits"] == 0
    # superset doc shares most fingerprints -> flagged at default threshold
    assert rows[3]["contaminated"] and 0 < rows[3]["overlap_frac"] <= 1.0


def test_shingle_rows_set_equals_shingles_array(spark):
    """The codegen'd exploded shingle path (round 6, signature pipeline)
    must produce exactly the set of strings the HOF array form yields —
    duplicates allowed (min is duplicate-invariant), set equality
    required."""
    from pyspark.sql import functions as F

    from stock_chart_kafka_streams_spark.operators.dedup import (
        shingle_rows,
        shingles,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    old = set(
        map(
            tuple,
            docs.select("doc_id", F.explode(shingles("text")).alias("s"))
            .distinct()
            .collect(),
        )
    )
    new = set(
        map(tuple, shingle_rows(docs).distinct().collect())
    )
    assert old == new and len(new) > 0


def test_connected_components_rejects_bad_id_columns(spark):
    from pyspark.sql import functions as F

    from stock_chart_kafka_streams_spark.operators.dedup import (
        connected_components,
    )

    import pytest as _pytest

    edges = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    strs = spark.createDataFrame([("a",), ("b",)], "doc_id string")
    with _pytest.raises(TypeError, match="integral"):
        connected_components(strs, edges)
    nulls = spark.createDataFrame([(1,), (None,)], "doc_id long")
    with _pytest.raises(ValueError, match="NULL"):
        connected_components(nulls, edges)
