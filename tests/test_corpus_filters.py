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


# ---------------------------------------------------------------------------
# connected-components convergence beyond quasi-cliques (round 7)
# ---------------------------------------------------------------------------
# LSH dedup graphs are usually 1-diameter quasi-cliques (2 CC rounds);
# these fixtures plant long CHAINS so the O(diameter) claim and the
# max_iter bound are actually exercised.


def _chain_docs(spark):
    """10 documents of overlapping word windows (8 blocks x 8 words,
    step 1 block) whose VERIFIED Jaccard pairs at threshold 0.7 form
    exactly the path 0-1-2-...-9 (diameter 9). The 'w16x' word alphabet
    was selected by scanning variants of the deterministic md5 LSH
    buckets until every adjacent pair (and no skip pair) survives both
    candidate generation and verification — stable forever because every
    hash involved is content-derived."""
    S, WIN, NDOC = 8, 8, 10
    words = [f"w16x{i}" for i in range((NDOC + WIN) * S)]
    rows = [
        (d, " ".join(words[d * S : (d + WIN) * S]), "en") for d in range(NDOC)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_neardup_clusters_chain_multi_round(spark, duck):
    from stock_chart_kafka_streams_spark.operators.dedup import (
        neardup_clusters,
        neardup_clusters_sql,
    )
    from tests.oracle import assert_matches_oracle

    docs = _chain_docs(spark)
    stats = {}
    out = neardup_clusters(docs, threshold=0.7, stats=stats)
    rows = {r.doc_id: r for r in out.collect()}
    # one component: min-label 0 reaches the far end only after
    # diameter propagation rounds (9) + the fixpoint-confirm round.
    assert all(rows[d].cluster_id == 0 for d in range(10))
    assert rows[0].is_canonical and not rows[9].is_canonical
    assert stats["rounds"] >= 9, f"chain converged suspiciously fast: {stats}"

    con = duckdb_with_docs(duck, docs)
    assert_matches_oracle(
        neardup_clusters(docs, threshold=0.7),
        con,
        neardup_clusters_sql("chain_docs", threshold=0.7),
    )


def duckdb_with_docs(duck, docs):
    import pandas as pd  # noqa: F401

    pdf = docs.toPandas()
    duck.register("chain_docs", pdf)
    return duck


def test_connected_components_raises_past_max_iter(spark):
    import pytest as _pytest

    from stock_chart_kafka_streams_spark.operators.dedup import (
        connected_components,
    )

    nodes = spark.range(10).withColumnRenamed("id", "doc_id")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "id_a long, id_b long"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(nodes, edges, max_iter=3)


def test_connected_components_path_graph_rounds(spark):
    from stock_chart_kafka_streams_spark.operators.dedup import (
        connected_components,
    )

    # 3 disjoint 9-node paths: diameter 8 -> 8 propagation rounds + 1
    # confirm round, well under the default bound but far past the
    # clique-shaped 2-round case.
    n, chain = 27, 9
    nodes = spark.range(n).withColumnRenamed("id", "doc_id")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1) if i % chain != chain - 1],
        "id_a long, id_b long",
    )
    stats = {}
    cc = connected_components(nodes, edges, stats=stats)
    got = {r.doc_id: r.cluster_id for r in cc.collect()}
    assert got == {i: (i // chain) * chain for i in range(n)}
    assert stats["rounds"] == 9


def test_vocabulary_top_cut_is_take_ordered_not_window(spark):
    """r8 verdict #1: the t7 vocabulary cut must plan as a distributed
    TakeOrderedAndProject (per-partition top-N heaps), never a global
    unpartitioned row_number window funneling the full vocabulary
    through one task (the `WindowExec: No Partition Defined` shape)."""
    from stock_chart_kafka_streams_spark.operators.text import _vocab_top

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta " + f"tok{i}") for i in range(1, 9)],
        "doc_id long, text string",
    )
    plan = _vocab_top(docs, 5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


def test_vocabulary_stats_plan_has_no_window_and_matches_exact(spark):
    """The returned t7 plan must contain NO window node (rank/cum are
    driver-side over the bounded top_n collect), and the values must be
    the exact rank / cumulative coverage."""
    from stock_chart_kafka_streams_spark.operators.text import vocabulary_stats

    docs = spark.createDataFrame(
        [
            (1, "aa aa aa bb bb cc"),
            (2, "aa bb cc dd"),
        ],
        "doc_id long, text string",
    )
    out = vocabulary_stats(docs, top_n=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    rows = {r["tok"]: r for r in out.collect()}
    # corpus: aa=4, bb=3, cc=2, dd=1 (10 tokens total); top 3 = aa bb cc
    assert set(rows) == {"aa", "bb", "cc"}
    assert rows["aa"]["rank"] == 1 and rows["aa"]["cnt"] == 4
    assert rows["aa"]["doc_freq"] == 2
    assert rows["aa"]["cum_coverage"] == 4 / 10
    assert rows["bb"]["cum_coverage"] == 7 / 10
    assert rows["cc"]["cum_coverage"] == 9 / 10


def test_vocabulary_stats_empty_corpus(spark):
    """Empty input yields an empty (schema-stable) result, not a crash in
    the driver-side rank accumulation."""
    from stock_chart_kafka_streams_spark.operators.text import vocabulary_stats

    docs = spark.createDataFrame([], "doc_id long, text string")
    out = vocabulary_stats(docs, top_n=3)
    assert out.columns == ["rank", "tok", "cnt", "doc_freq", "cum_coverage"]
    assert out.count() == 0


# -- t10 Gopher rules / t11 C4 cleaning (round 9): planted-rule checks;
# exact oracle parity is in test_new_queries --------------------------------


def test_gopher_rules_fire_individually(spark):
    """Each published rule (Rae et al. 2021 Table A1) trips on a doc
    built to violate exactly that rule while a clean doc passes all."""
    from stock_chart_kafka_streams_spark.operators.text import gopher_quality

    clean = (
        "the quick brown fox jumps over that lazy dog and we have "
        "plenty of ordinary words to be well within every published "
        "bound with room to spare because this sentence keeps going "
        "and going with normal english words of usual length today "
        "while adding several more everyday terms so the total word "
        "count clears fifty comfortably for the filter under test"
    )
    docs = spark.createDataFrame(
        [
            (1, clean),
            (2, "too short to have fifty words the of and that"),  # word count
            (3, " ".join(["supercalifragilisticexpialidocious"] * 60) + " the of"),  # mean len
            (4, clean + " " + "# " * 30),  # symbol ratio
            (5, "\n".join(["• " + clean] * 10)),  # bullet lines
            (6, "\n".join([clean + " so it trails off..."] * 10)),  # ellipsis lines
            (7, clean + " " + "12345 " * 60),  # alpha words
            (8, " ".join(["apple banana cherry grape melon"] * 12)),  # required words
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in gopher_quality(docs, min_words=50).collect()}
    assert out[1]["keep"] is True
    assert out[2]["ok_word_count"] is False and out[2]["keep"] is False
    assert out[3]["ok_mean_word_len"] is False
    assert out[4]["ok_symbol_ratio"] is False
    assert out[5]["ok_bullet_lines"] is False
    assert out[6]["ok_ellipsis_lines"] is False
    assert out[7]["ok_alpha_words"] is False
    assert out[8]["ok_required_words"] is False


def test_c4_clean_line_and_page_rules(spark):
    """Line rules: terminal punctuation, >=5 words, no 'javascript'.
    Page rules: lorem ipsum, curly brace, >=3 surviving lines."""
    from stock_chart_kafka_streams_spark.operators.text import c4_clean

    good = "this line has plenty of words and ends properly."
    docs = spark.createDataFrame(
        [
            (1, "\n".join([good, "short line.", "no terminal punctuation here",
                           "Enable JavaScript to view this page.", good, good])),
            (2, "\n".join([good] * 5) + "\nlorem ipsum dolor sit amet."),
            (3, "\n".join([good] * 5) + "\nvar x = { broken: true };"),
            (4, "\n".join([good, good])),  # only 2 surviving lines
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in c4_clean(docs).collect()}
    assert out[1]["kept"] is True
    # the three bad lines (short, no punctuation, javascript) are gone
    assert out[1]["n_kept_lines"] == 3
    assert out[1]["clean_text"] == "\n".join([good, good, good])
    assert out[2]["has_lorem"] is True and out[2]["kept"] is False
    assert out[2]["clean_text"] == ""
    assert out[3]["has_brace"] is True and out[3]["kept"] is False
    assert out[4]["n_kept_lines"] == 2 and out[4]["kept"] is False


def test_c4_and_gopher_planted_cross_engine(spark, duck):
    """The planted rule-violating fixtures must agree cross-engine too —
    the real corpus is punctuation-free, so without this the oracle never
    exercises the rule branches."""
    import pandas as pd

    from stock_chart_kafka_streams_spark.operators.text import (
        c4_clean,
        c4_clean_sql,
        gopher_quality,
        gopher_quality_sql,
    )

    rows = [
        (1, "the quick brown fox jumps. over that lazy dog we have gone.\n"
            "a second proper sentence with enough words to count here.\n"
            "and a third proper sentence with enough words to pass too."),
        (2, "• bullet one\n• bullet two\nshort."),
        (3, "lorem ipsum dolor { # ... the of and that have with be to"),
        (4, " ".join(["word"] * 60) + " the of."),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    vals = ", ".join(
        "(" + str(i) + ", '" + t.replace("'", "''").replace("\n", "' || chr(10) || '") + "')"
        for i, t in rows
    )
    duck.execute(f"CREATE OR REPLACE TEMP VIEW planted_docs AS SELECT * FROM (VALUES {vals}) AS v(doc_id, text)")
    for op, sql in (
        (gopher_quality, gopher_quality_sql(table="planted_docs")),
        (c4_clean, c4_clean_sql(table="planted_docs")),
    ):
        got = op(docs).toPandas().sort_values("doc_id").reset_index(drop=True)
        want = duck.execute(sql).df().sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_c4_span_dedup_global_first_occurrence(spark):
    """The globally-first (doc_id, start) occurrence of a duplicated
    3-line span survives; every line of the later occurrence is removed;
    docs shorter than the span are untouched."""
    from stock_chart_kafka_streams_spark.operators.text import c4_span_dedup

    block = "alpha one two.\nbeta three four.\ngamma five six."
    docs = spark.createDataFrame(
        [
            (1, "intro line here.\n" + block + "\nown outro line."),
            (2, block + "\nunrelated closing line."),  # later dup of block
            (3, "short doc.\nonly two lines."),  # < span: no spans at all
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in c4_span_dedup(docs).collect()}
    assert out[1]["n_removed_lines"] == 0  # first occurrence keeps all 5
    assert out[2]["n_removed_lines"] == 3
    assert out[2]["clean_text"] == "unrelated closing line."
    assert out[3]["n_removed_lines"] == 0
    assert out[3]["clean_text"] == "short doc.\nonly two lines."


def test_c4_span_dedup_within_doc_repetition(spark):
    """A doc repeating its own 3-line block keeps only the first copy —
    the same rule applies intra-document."""
    from stock_chart_kafka_streams_spark.operators.text import c4_span_dedup

    block = "row a here now.\nrow b here now.\nrow c here now."
    docs = spark.createDataFrame(
        [(7, block + "\n" + block)], "doc_id long, text string"
    )
    out = c4_span_dedup(docs).collect()[0]
    assert out["n_lines"] == 6
    assert out["n_removed_lines"] == 3
    assert out["clean_text"] == block


def test_c4_span_dedup_planted_cross_engine(spark, duck):
    """Planted multi-line fixture agrees cross-engine (the real corpus is
    single-line, so this is what pins the removal path bit-for-bit)."""
    import pandas as pd

    from stock_chart_kafka_streams_spark.operators.text import (
        c4_span_dedup,
        c4_span_dedup_sql,
    )

    block = "one fine line.\ntwo fine lines.\nthree fine lines."
    rows = [
        (1, "lead.\n" + block),
        (2, block + "\ntail."),
        (3, block),
        (4, "totally unrelated.\ncontent lives here.\nthird line present."),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    vals = ", ".join(
        "(" + str(i) + ", '" + t.replace("'", "''").replace("\n", "' || chr(10) || '") + "')"
        for i, t in rows
    )
    duck.execute(
        f"CREATE OR REPLACE TEMP VIEW planted_span_docs AS "
        f"SELECT * FROM (VALUES {vals}) AS v(doc_id, text)"
    )
    got = c4_span_dedup(docs).toPandas().sort_values("doc_id").reset_index(drop=True)
    want = (
        duck.execute(c4_span_dedup_sql(table="planted_span_docs"))
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # docs 2 and 3 both lose the block (doc 1 is first), doc 4 untouched
    by_id = {r["doc_id"]: r for _, r in got.iterrows()}
    assert by_id[1]["n_removed_lines"] == 0
    assert by_id[2]["n_removed_lines"] == 3 and by_id[2]["clean_text"] == "tail."
    assert by_id[3]["n_removed_lines"] == 3 and by_id[3]["clean_text"] == ""
    assert by_id[4]["n_removed_lines"] == 0


def test_t10_t11_t12_cross_engine_fuzz(spark, duck):
    """Seeded fuzz over a rule-adjacent alphabet (newlines, bullets,
    terminal punctuation, '#', '...', braces, digit runs, repeated
    blocks): Spark's Java-regex/HOF results must equal DuckDB's RE2/list
    results byte-for-byte for all three round-9 text operators — the
    dialect-drift detector the t8 fuzz pioneered."""
    import random

    import pandas as pd

    from stock_chart_kafka_streams_spark.operators.text import (
        c4_clean,
        c4_clean_sql,
        c4_span_dedup,
        c4_span_dedup_sql,
        gopher_quality,
        gopher_quality_sql,
    )

    rng = random.Random(20260814)
    words = ["the", "of", "and", "be", "to", "data", "lorem", "ipsum",
             "javascript", "x", "supercalifragilistic", "12345", "a#b",
             "...", "word", "line", "•", "-"]
    enders = [".", "!", "?", '"', "", "...", " "]
    blocks = []
    for _ in range(10):  # shared blocks so span dedup fires across docs
        blocks.append(
            "\n".join(
                " ".join(rng.choice(words) for _ in range(rng.randint(3, 8)))
                + rng.choice(enders)
                for _ in range(3)
            )
        )
    rows = []
    for i in range(200):
        parts = []
        for _ in range(rng.randint(1, 6)):
            if rng.random() < 0.3:
                parts.append(rng.choice(blocks))
            else:
                parts.append(
                    " ".join(rng.choice(words) for _ in range(rng.randint(0, 12)))
                    + rng.choice(enders)
                )
        rows.append((i, "\n".join(parts)))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    duck.register("fuzz_corpus", pdf)
    docs = spark.createDataFrame(pdf)
    for op, sql in (
        (gopher_quality, gopher_quality_sql(table="fuzz_corpus")),
        (c4_clean, c4_clean_sql(table="fuzz_corpus")),
        (c4_span_dedup, c4_span_dedup_sql(table="fuzz_corpus")),
    ):
        got = op(docs).toPandas().sort_values("doc_id").reset_index(drop=True)
        want = duck.sql(sql).df().sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)], want[sorted(want.columns)], check_dtype=False
        )
