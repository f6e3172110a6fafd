"""Text-analysis operators for LLM data pipelines (SURVEY.md §2.9).

North-star extensions beyond the reference's surface (driver mandate in
BASELINE.json): language identification, quality scoring, token counting,
and document fingerprinting over the ``documents`` table.

Every operator is a pure JVM column expression (no Python UDFs — these run
inside whole-stage codegen and scale linearly at 100 TB), and each has a
DuckDB SQL twin built from the same constants so the oracle harness checks
exact value parity. Tokenization is the shared primitive: lowercase, split
on non-alphanumeric runs, drop empties — identical semantics in Spark
(`split` + `filter`) and DuckDB (`string_split_regex` + `list_filter`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = "[^a-z0-9]+"

# CJK unified ideographs as a literal char range — identical count semantics
# in Java regex (Spark) and RE2 (DuckDB \x{...} escapes).
_CJK_RANGE_SPARK = "[一-鿿]"
_CJK_RANGE_DUCK = r"[\x{4e00}-\x{9fff}]"

# Tiny per-language stopword profiles for the n-gram/stopword heuristic.
# Order matters only for the deterministic tie-break (first match wins).
LANG_PROFILES: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"],
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "on"],
    "es": ["el", "los", "las", "es", "una", "del", "que", "por", "con", "para"],
    "fr": ["le", "les", "et", "est", "une", "des", "du", "dans", "pour", "sur"],
}

EN_STOPWORDS = LANG_PROFILES["en"] + ["a", "an", "or", "as", "at", "by", "with"]


def tokens(text: Column | str = "text") -> Column:
    """Lowercased alphanumeric tokens."""
    return F.filter(
        F.split(F.lower(text), TOKEN_SPLIT_RE), lambda x: x != F.lit("")
    )


def token_count(text: Column | str = "text") -> Column:
    """Whitespace/punctuation token count (alphanumeric runs)."""
    return F.size(tokens(text))


# GPT-style pre-tokenizer shape: space-prefixed letter runs, digit runs,
# punctuation runs, whitespace runs. Same pattern in Java regex and RE2.
BPE_TOKEN_RE = r" ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s]+|\s+"


def token_count_bpe(text: Column | str = "text") -> Column:
    """BPE-ish token count: non-overlapping matches of the GPT-style
    pre-tokenizer regex over lowercased text — the standard cheap proxy
    for LLM token budgets when no tokenizer vocab is available."""
    lowered = F.lower(F.col(text) if isinstance(text, str) else text)
    return F.regexp_count(lowered, F.lit(BPE_TOKEN_RE))


def _stop_hits(toks: Column, words: list[str]) -> Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def quality_score(text: Column | str = "text", toks: Column | None = None) -> Column:
    """Deterministic [0,1] quality heuristic: length, stopword density,
    digit noise. Same closed-form arithmetic as the SQL twin. Pass a
    pre-materialized token column via ``toks`` to share tokenization with
    other features (see ``text_features``)."""
    toks = tokens(text) if toks is None else toks
    n_tok = F.size(toks).cast("double")
    stop_ratio = F.when(
        n_tok > 0, _stop_hits(toks, EN_STOPWORDS).cast("double") / n_tok
    ).otherwise(F.lit(0.0))
    digit_ratio = F.regexp_count(
        F.col(text) if isinstance(text, str) else text, F.lit("[0-9]")
    ).cast("double") / F.greatest(F.length(text).cast("double"), F.lit(1.0))
    return (
        F.least(n_tok / F.lit(100.0), F.lit(1.0)) * F.lit(0.4)
        + F.least(stop_ratio * F.lit(5.0), F.lit(1.0)) * F.lit(0.3)
        + (F.lit(1.0) - F.least(digit_ratio * F.lit(10.0), F.lit(1.0))) * F.lit(0.3)
    )


def lang_scores(
    text: Column | str = "text", toks: Column | None = None
) -> dict[str, Column]:
    """Per-language evidence scores: stopword hit counts for latin-script
    languages, CJK character count for zh."""
    toks = tokens(text) if toks is None else toks
    scores = {
        lang: _stop_hits(toks, words).cast("double")
        for lang, words in LANG_PROFILES.items()
    }
    scores["zh"] = F.regexp_count(
        F.col(text) if isinstance(text, str) else text, F.lit(_CJK_RANGE_SPARK)
    ).cast("double")
    return scores


def lang_id(text: Column | str = "text", toks: Column | None = None) -> Column:
    """Deterministic argmax over lang_scores; ties resolve to the first
    language in (de, en, es, fr, zh) order; all-zero evidence -> 'und'."""
    scores = lang_scores(text, toks)
    ordered = ["de", "en", "es", "fr", "zh"]
    g = F.greatest(*[scores[la] for la in ordered])
    result = None
    for la in ordered:
        cond = (g > 0) & (scores[la] == g)
        result = F.when(cond, F.lit(la)) if result is None else result.when(cond, F.lit(la))
    return result.otherwise(F.lit("und"))


def normalized(text: Column | str = "text") -> Column:
    """Whitespace-collapsed lowercase normalization (fingerprint base)."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def fingerprint(text: Column | str = "text") -> Column:
    """Content fingerprint: md5 of the normalized text."""
    return F.md5(normalized(text))


def text_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """All text-analysis columns at once (single pass over the corpus).

    The token array is materialized once in a lower projection and every
    feature references that column — one higher-order tokenize per
    document instead of seven. Catalyst keeps the two projections separate
    (CollapseProject never inlines a non-cheap expression referenced more
    than once), so the sharing survives optimization."""
    base = docs.select(
        "doc_id",
        F.col(text_col).alias("__txt"),
        tokens(text_col).alias("__toks"),
    )
    t = F.col("__toks")
    return base.select(
        "doc_id",
        F.size(t).alias("n_tokens"),
        token_count_bpe("__txt").alias("n_tokens_bpe"),
        quality_score("__txt", toks=t).alias("quality"),
        lang_id("__txt", toks=t).alias("lang_pred"),
        fingerprint("__txt").alias("fingerprint"),
    )


def language_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus rollup per predicted language: doc counts, token totals, and
    quality mass — the reporting pass a training-data pipeline runs after
    per-doc feature extraction. Quality (a double in [0,1]) is summed as
    per-row micro-units (exact integers, order-independent) so the result
    hash-matches any engine regardless of double accumulation order; the
    consumer divides by n_docs for the mean."""
    feats = text_features(docs, text_col)
    return feats.groupBy("lang_pred").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.sum("n_tokens_bpe").cast("long").alias("total_tokens_bpe"),
        F.sum(F.round(F.col("quality") * 1_000_000).cast("long")).alias(
            "sum_quality_micros"
        ),
        F.count_distinct("fingerprint").alias("n_unique_fingerprints"),
    )


def language_stats_sql(col: str = "text") -> str:
    return f"""
WITH feats AS (
    SELECT doc_id,
           {token_count_sql(col)} AS n_tokens,
           {token_count_bpe_sql(col)} AS n_tokens_bpe,
           {quality_score_sql(col)} AS quality,
           {lang_id_sql(col)} AS lang_pred,
           {fingerprint_sql(col)} AS fingerprint
    FROM documents
)
SELECT lang_pred,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(sum(n_tokens_bpe) AS BIGINT) AS total_tokens_bpe,
       CAST(sum(CAST(round(quality * 1000000) AS BIGINT)) AS BIGINT) AS sum_quality_micros,
       CAST(count(DISTINCT fingerprint) AS BIGINT) AS n_unique_fingerprints
FROM feats
GROUP BY lang_pred
"""


def training_set_selection(
    docs: DataFrame,
    text_col: str = "text",
    min_quality: float = 0.5,
    langs: tuple[str, ...] = ("en",),
) -> DataFrame:
    """End-to-end training-data selection — the composed pipeline every
    LLM-corpus build runs: fingerprint dedup (keep the lowest doc_id per
    normalized-content fingerprint), then language and quality gates.

    Order matters and is part of the contract: dedup BEFORE the quality
    gate, so a duplicate cluster is represented by its lowest-id member
    even when members differ in id but not content. All stages are one
    JVM pass + one shuffle (the dedup window on fingerprint); the filters
    are pushed below the window by Catalyst where legal (lang/quality are
    per-row, computed pre-shuffle).
    """
    feats = text_features(docs, text_col)
    from pyspark.sql.window import Window

    w = Window.partitionBy("fingerprint").orderBy(F.col("doc_id").asc())
    return (
        feats.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .where(F.col("lang_pred").isin(*langs))
        .where(F.col("quality") >= min_quality)
        .select("doc_id", "n_tokens", "n_tokens_bpe", "quality", "lang_pred")
    )


def training_set_selection_sql(
    col: str = "text", min_quality: float = 0.5, langs: tuple[str, ...] = ("en",)
) -> str:
    lang_list = ", ".join(f"'{la}'" for la in langs)
    return f"""
WITH feats AS (
    SELECT doc_id,
           {token_count_sql(col)} AS n_tokens,
           {token_count_bpe_sql(col)} AS n_tokens_bpe,
           {quality_score_sql(col)} AS quality,
           {lang_id_sql(col)} AS lang_pred,
           {fingerprint_sql(col)} AS fingerprint
    FROM documents
),
deduped AS (
    SELECT *, row_number() OVER (PARTITION BY fingerprint ORDER BY doc_id) AS rn
    FROM feats
)
SELECT doc_id, n_tokens, n_tokens_bpe, quality, lang_pred
FROM deduped
WHERE rn = 1 AND lang_pred IN ({lang_list}) AND quality >= {min_quality}
"""


WINNOW_K = 8  # character k-gram length
WINNOW_W = 4  # winnowing window: fingerprints = min hash of each w-run


def winnow_fingerprints(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Rolling-hash document fingerprints by winnowing (Schleimer /
    Wilkerson / Aiken, the MOSS algorithm): hash every ``WINNOW_K``-char
    k-gram of the normalized text, slide a window of ``WINNOW_W``
    consecutive hashes, keep the minimum of each window, emit the distinct
    selected hashes as (doc_id, fp) rows. Any two documents sharing a long
    enough substring are guaranteed to share a fingerprint — the classic
    substring-plagiarism / near-dup primitive, complementary to MinHash
    (which fingerprints the bag of shingles, not contiguous runs).

    All map-side array expressions, one output explode, no shuffle. The
    k-gram hash here is md5-derived (32-bit) rather than an incremental
    Rabin-Karp update — semantics are identical (winnowing only needs SOME
    uniform hash per k-gram) and every value is bit-for-bit reproducible
    in the DuckDB oracle; an incremental-rolling variant would need a
    Pandas UDF and would not be oracle-checkable.

    PERF (round 7): the construction is staged across THREE projections,
    each alias referenced more than once downstream so CollapseProject
    keeps the boundaries — a single nested expression re-evaluates the
    interpreted HOF lambdas' captured subtrees PER ELEMENT (norm re-lowered
    and re-regexed per gram, the whole hash array rebuilt per window:
    O(len²) md5s + O(len²) regex per document — measured ~200 ms/doc,
    106 s for 500 docs; thread dump showed the task pinned in interpreted
    ``Lower.nullSafeEval``). Staged: norm computes once per doc, each gram
    hash is one O(k) md5 over an attribute, and the sliding-window min is
    a ``zip_with(least)`` fold over W shifted slices (cheap per-element
    lambdas only — the same de-HOF shape as ``shingle_rows``); ~100×.
    ``least`` ignores the NULLs that ``zip_with`` pads when a clamped
    slice is short, which reproduces ``array_min`` over the partial last
    windows exactly.
    """
    norm = normalized(text_col)
    staged = docs.select(F.col(id_col), norm.alias("__wn"))
    wn = F.col("__wn")
    hashed = staged.select(
        F.col(id_col),
        F.transform(
            F.sequence(
                F.lit(1), F.greatest(F.length(wn) - (WINNOW_K - 1), F.lit(1))
            ),
            lambda i: F.conv(
                F.substring(F.md5(wn.substr(i, F.lit(WINNOW_K))), 1, 8), 16, 10
            ).cast("long"),
        ).alias("__wh"),
    )
    h = F.col("__wh")
    m = F.greatest(F.size(h) - (WINNOW_W - 1), F.lit(1))
    mins = F.slice(h, 1, m)
    for j in range(2, WINNOW_W + 1):
        mins = F.zip_with(mins, F.slice(h, j, m), lambda a, b: F.least(a, b))
    return hashed.select(
        F.col(id_col), F.explode(F.array_distinct(mins)).alias("fp")
    )


def winnow_fingerprints_sql(table: str = "documents", col: str = "text") -> str:
    norm = f"trim(regexp_replace(lower({col}), '\\s+', ' ', 'g'))"
    k, w = WINNOW_K, WINNOW_W
    return f"""
WITH normed AS (
    SELECT doc_id, {norm} AS norm FROM {table}
),
hashed AS (
    SELECT doc_id,
           list_transform(
               range(1, greatest(length(norm) - {k - 1}, 1) + 1),
               i -> ('0x' || substr(md5(substr(norm, i, {k})), 1, 8))::BIGINT
           ) AS hl
    FROM normed
)
SELECT doc_id,
       unnest(list_distinct(list_transform(
           range(1, greatest(len(hl) - {w - 1}, 1) + 1),
           j -> list_min(hl[j:j + {w - 1}])
       ))) AS fp
FROM hashed
"""


CHUNK_SIZE = 200
CHUNK_OVERLAP = 50


def chunk_documents(
    docs: DataFrame,
    text_col: str = "text",
    size: int = CHUNK_SIZE,
    overlap: int = CHUNK_OVERLAP,
) -> DataFrame:
    """Split documents into fixed-size character chunks with overlap — the
    context-window prep step between selection and tokenization in a
    training/RAG pipeline. One output row per chunk.

    Map-side only: ``sequence`` + ``posexplode`` + ``substring`` are all
    codegen'd JVM expressions and the explode multiplies rows BEFORE any
    shuffle, so the operator costs zero network at any scale (row fan-out
    is bounded by doc length / stride). ``sequence`` end is clamped to >= 1
    because Spark's ANSI ``sequence(1, 0)`` would run DESCENDING.
    """
    if overlap >= size:
        raise ValueError(f"overlap ({overlap}) must be < size ({size})")
    stride = size - overlap
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.length(text_col), F.lit(1)),
        F.lit(stride),
    )
    return (
        docs.select(
            "doc_id",
            F.col(text_col).alias("__txt"),
            F.posexplode(starts).alias("chunk_id", "chunk_start"),
        )
        .select(
            "doc_id",
            "chunk_id",
            "chunk_start",
            F.col("__txt").substr(F.col("chunk_start"), F.lit(size)).alias(
                "chunk_text"
            ),
        )
        .withColumn("n_chunk_chars", F.length("chunk_text"))
    )


def chunk_documents_sql(
    col: str = "text", size: int = CHUNK_SIZE, overlap: int = CHUNK_OVERLAP
) -> str:
    stride = size - overlap
    return f"""
WITH exploded AS (
    SELECT doc_id,
           unnest(generate_series(1, greatest(length({col}), 1), {stride})) AS chunk_start,
           {col} AS txt
    FROM documents
)
SELECT doc_id,
       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY chunk_start) - 1 AS INT) AS chunk_id,
       CAST(chunk_start AS INT) AS chunk_start,
       substr(txt, chunk_start, {size}) AS chunk_text,
       CAST(length(substr(txt, chunk_start, {size})) AS INT) AS n_chunk_chars
FROM exploded
"""


# ---------------------------------------------------------------------------
# DuckDB SQL twins (same constants, same arithmetic)
# ---------------------------------------------------------------------------

TOKENS_SQL = (
    "list_filter(string_split_regex(lower({col}), '[^a-z0-9]+'), x -> x <> '')"
)


def _stop_hits_sql(toks_sql: str, words: list[str]) -> str:
    arr = "[" + ", ".join(f"'{w}'" for w in words) + "]"
    return f"len(list_filter({toks_sql}, t -> list_contains({arr}, t)))"


def token_count_sql(col: str = "text") -> str:
    return f"len({TOKENS_SQL.format(col=col)})"


def token_count_bpe_sql(col: str = "text") -> str:
    return f"len(regexp_extract_all(lower({col}), '{BPE_TOKEN_RE}'))"


def quality_score_sql(col: str = "text") -> str:
    toks = TOKENS_SQL.format(col=col)
    n_tok = f"CAST(len({toks}) AS DOUBLE)"
    stop = _stop_hits_sql(toks, EN_STOPWORDS)
    stop_ratio = f"(CASE WHEN {n_tok} > 0 THEN CAST({stop} AS DOUBLE) / {n_tok} ELSE 0.0 END)"
    digit_ratio = (
        f"CAST(len(regexp_extract_all({col}, '[0-9]')) AS DOUBLE)"
        f" / greatest(CAST(length({col}) AS DOUBLE), 1.0)"
    )
    return (
        f"least({n_tok} / 100.0, 1.0) * 0.4"
        f" + least({stop_ratio} * 5.0, 1.0) * 0.3"
        f" + (1.0 - least({digit_ratio} * 10.0, 1.0)) * 0.3"
    )


def lang_id_sql(col: str = "text") -> str:
    toks = TOKENS_SQL.format(col=col)
    scores = {
        lang: f"CAST({_stop_hits_sql(toks, words)} AS DOUBLE)"
        for lang, words in LANG_PROFILES.items()
    }
    scores["zh"] = (
        f"CAST(len(regexp_extract_all({col}, '{_CJK_RANGE_DUCK}')) AS DOUBLE)"
    )
    ordered = ["de", "en", "es", "fr", "zh"]
    g = "greatest(" + ", ".join(scores[la] for la in ordered) + ")"
    whens = " ".join(
        f"WHEN {g} > 0 AND {scores[la]} = {g} THEN '{la}'" for la in ordered
    )
    return f"(CASE {whens} ELSE 'und' END)"


def fingerprint_sql(col: str = "text") -> str:
    return f"md5(trim(regexp_replace(lower({col}), '\\s+', ' ', 'g')))"


def top_terms(
    docs: DataFrame, k: int = 5, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Top-k characteristic terms per document by TF-IDF, scored as the
    RATIONAL form ``tf * n_docs / df`` (no logarithm): log-idf ranks
    identically because log is monotone in df, and avoiding libm keeps
    the score bit-identical cross-engine (libm ``log`` may differ by an
    ulp between implementations). Ties break on term ascending, so the
    top-k set is fully deterministic.

    Plan shape: explode -> (doc, term) count -> term doc-frequency
    aggregate -> broadcast 1-row corpus count -> per-doc top-k window.
    All shuffles are on reduced key spaces ((doc,term) pairs, then terms);
    the raw text never re-shuffles. At 100 TB the df table is the only
    corpus-wide aggregate and it is ~vocabulary-sized."""
    toks = docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    nd = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(dfreq, on="term")
        .crossJoin(F.broadcast(nd))
        .select(
            id_col,
            "term",
            "tf",
            "df",
            (
                (F.col("tf") * F.col("n_docs")).cast("double")
                / F.col("df").cast("double")
            ).alias("tfidf"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
    )


def top_terms_sql(table: str = "documents", k: int = 5, col: str = "text") -> str:
    """DuckDB twin of ``top_terms``."""
    toks = TOKENS_SQL.format(col=col)
    return f"""
WITH tok AS (
    SELECT doc_id, unnest({toks}) AS term FROM {table}
),
tf AS (
    SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2
),
dfreq AS (
    SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
),
nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM {table})
SELECT doc_id, term, tf, df, tfidf, CAST(rnk AS INT) AS rank FROM (
    SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
           CAST(tf.tf * nd.n_docs AS DOUBLE) / CAST(dfreq.df AS DOUBLE) AS tfidf,
           row_number() OVER (
               PARTITION BY tf.doc_id ORDER BY
               CAST(tf.tf * nd.n_docs AS DOUBLE) / CAST(dfreq.df AS DOUBLE) DESC,
               tf.term ASC
           ) AS rnk
    FROM tf JOIN dfreq USING (term) CROSS JOIN nd
) WHERE rnk <= {k}
"""


# Gopher/MassiveText-style repetition thresholds: documents above either
# are dominated by repeated content and excluded from training sets.
REP_MAX_DUP_TRIGRAM_FRAC = 0.30
REP_MAX_TOP_TOKEN_FRAC = 0.20


def repetition_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document repetition metrics for pretraining-corpus filtering
    (the Gopher-rules family): fraction of duplicate word trigrams and
    the share of the single most frequent token. Both are exact ratios of
    counts (no libm), so the whole result is cross-engine hashable.

    Plan: trigram stats are pure map-side array expressions; the top-token
    share needs one explode + two hash aggregations on (doc, token) —
    reduced key space, text never re-shuffles."""
    toks = tokens(text_col)
    tri = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - F.lit(2), F.lit(1))),
        lambda i: F.array_join(F.slice(toks, i, F.lit(3)), " "),
    )
    # NOT distinct — repetition is exactly what dedupe would erase
    trig = F.when(F.size(toks) >= 3, tri).otherwise(F.array(normalized(text_col)))
    base = docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(trig).cast("long").alias("n_trigrams"),
        F.size(F.array_distinct(trig)).cast("long").alias("n_distinct_trigrams"),
        toks.alias("__toks"),
    )
    top = (
        base.select("doc_id", F.explode("__toks").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("cnt"))
        .groupBy("doc_id")
        .agg(F.max("cnt").alias("top_cnt"))
    )
    dup_frac = (
        (F.col("n_trigrams") - F.col("n_distinct_trigrams")).cast("double")
        / F.col("n_trigrams").cast("double")
    )
    top_frac = F.when(F.col("n_tokens") == 0, F.lit(0.0)).otherwise(
        F.coalesce(F.col("top_cnt"), F.lit(0)).cast("double")
        / F.col("n_tokens").cast("double")
    )
    return (
        base.drop("__toks")
        .join(top, on="doc_id", how="left")
        .select(
            "doc_id",
            "n_tokens",
            "n_trigrams",
            "n_distinct_trigrams",
            dup_frac.alias("dup_trigram_frac"),
            top_frac.alias("top_token_frac"),
            (
                (dup_frac > REP_MAX_DUP_TRIGRAM_FRAC)
                | (top_frac > REP_MAX_TOP_TOKEN_FRAC)
            ).alias("is_repetitive"),
        )
    )


def repetition_stats_sql(table: str = "documents", col: str = "text") -> str:
    toks = TOKENS_SQL.format(col=col)
    norm = f"trim(regexp_replace(lower({col}), '\\s+', ' ', 'g'))"
    tri = (
        f"list_transform(range(1, greatest(len({toks}) - 2, 1) + 1), "
        f"i -> array_to_string({toks}[i:i+2], ' '))"
    )
    trig = f"(CASE WHEN len({toks}) >= 3 THEN {tri} ELSE [{norm}] END)"
    return f"""
WITH base AS (
    SELECT doc_id,
           CAST(len({toks}) AS BIGINT) AS n_tokens,
           CAST(len({trig}) AS BIGINT) AS n_trigrams,
           CAST(len(list_distinct({trig})) AS BIGINT) AS n_distinct_trigrams
    FROM {table}
),
top AS (
    SELECT doc_id, max(cnt) AS top_cnt FROM (
        SELECT doc_id, tok, count(*) AS cnt FROM (
            SELECT doc_id, unnest({toks}) AS tok FROM {table}
        ) GROUP BY doc_id, tok
    ) GROUP BY doc_id
)
SELECT b.doc_id, b.n_tokens, b.n_trigrams, b.n_distinct_trigrams,
       CAST(b.n_trigrams - b.n_distinct_trigrams AS DOUBLE)
           / CAST(b.n_trigrams AS DOUBLE) AS dup_trigram_frac,
       CASE WHEN b.n_tokens = 0 THEN 0.0
            ELSE CAST(COALESCE(t.top_cnt, 0) AS DOUBLE)
                 / CAST(b.n_tokens AS DOUBLE) END AS top_token_frac,
       (CAST(b.n_trigrams - b.n_distinct_trigrams AS DOUBLE)
            / CAST(b.n_trigrams AS DOUBLE) > {REP_MAX_DUP_TRIGRAM_FRAC}
        OR (CASE WHEN b.n_tokens = 0 THEN 0.0
                 ELSE CAST(COALESCE(t.top_cnt, 0) AS DOUBLE)
                      / CAST(b.n_tokens AS DOUBLE) END) > {REP_MAX_TOP_TOKEN_FRAC}
       ) AS is_repetitive
FROM base b LEFT JOIN top t USING (doc_id)
"""


DECONTAM_THRESHOLD = 0.2


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    threshold: float = DECONTAM_THRESHOLD,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: flag training documents that share too
    many winnowing fingerprints with a held-out evaluation set — the
    standard test-set-overlap removal step before pretraining. A document
    is ``contaminated`` when >= ``threshold`` of its fingerprints appear
    in the benchmark's fingerprint set.

    Scale posture: benchmark sets are tiny relative to the corpus, so the
    distinct benchmark-fingerprint set BROADCASTS; the corpus side is the
    map-side winnowing pass (t4) plus one aggregation keyed by doc — the
    training corpus is never shuffled by fingerprint."""
    doc_fps = winnow_fingerprints(docs, id_col, text_col)
    bench_fps = (
        winnow_fingerprints(benchmark, id_col, text_col).select("fp").distinct()
    )
    tot = doc_fps.groupBy(id_col).agg(F.count("*").alias("n_fps"))
    hits = (
        doc_fps.join(F.broadcast(bench_fps), on="fp", how="left_semi")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hits"))
    )
    frac = (
        F.coalesce(F.col("n_hits"), F.lit(0)).cast("double")
        / F.col("n_fps").cast("double")
    )
    return tot.join(hits, on=id_col, how="left").select(
        id_col,
        "n_fps",
        F.coalesce(F.col("n_hits"), F.lit(0).cast("long")).alias("n_hits"),
        frac.alias("overlap_frac"),
        (frac >= threshold).alias("contaminated"),
    )


def decontaminate_sql(
    table: str = "documents",
    bench_pred: str = "doc_id % 97 = 0",
    threshold: float = DECONTAM_THRESHOLD,
) -> str:
    """DuckDB twin of ``decontaminate`` for a benchmark that is a
    predicate-selected subset of the corpus (the driver fixture): the
    benchmark fingerprints are exactly the doc fingerprints of the
    selected ids."""
    wf = winnow_fingerprints_sql(table)
    return f"""
WITH doc_fps AS ({wf}),
bench AS (SELECT DISTINCT fp FROM doc_fps WHERE {bench_pred}),
tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fps FROM doc_fps GROUP BY 1),
hits AS (
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits
    FROM doc_fps JOIN bench USING (fp) GROUP BY 1
)
SELECT t.doc_id, t.n_fps,
       COALESCE(h.n_hits, 0) AS n_hits,
       CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / CAST(t.n_fps AS DOUBLE)
           AS overlap_frac,
       (CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / CAST(t.n_fps AS DOUBLE))
           >= {threshold} AS contaminated
FROM tot t LEFT JOIN hits h USING (doc_id)
"""


def _vocab_top(
    docs: DataFrame, top_n: int, text_col: str = "text"
) -> DataFrame:
    """The distributed top-``top_n`` vocabulary cut: explode -> token
    count + doc-frequency aggregates -> ``orderBy(cnt desc, tok)
    .limit(top_n)``, which Spark plans as TakeOrderedAndProject
    (per-partition top-N, driver-side merge of top_n-sized heaps) —
    NEVER a global row_number window (tests assert the plan shape)."""
    toks = docs.select(F.col("doc_id"), F.explode(tokens(text_col)).alias("tok"))
    vocab = toks.groupBy("tok").agg(
        F.count("*").alias("cnt"),
        F.count_distinct("doc_id").alias("doc_freq"),
    )
    return vocab.orderBy(F.col("cnt").desc(), F.col("tok").asc()).limit(int(top_n))


def vocabulary_stats(
    docs: DataFrame, top_n: int = 1000, text_col: str = "text"
) -> DataFrame:
    """Corpus vocabulary table for tokenizer training / coverage analysis:
    the ``top_n`` tokens by corpus frequency with rank, document
    frequency, and CUMULATIVE corpus coverage. The running total is
    accumulated over exact BIGINT counts (one double division at the
    end), so the coverage column is order-of-summation-proof and
    hash-matches cross-engine — a windowed running sum over doubles would
    not be (segment-tree vs sequential accumulation).

    Scale shape (r8 verdict #1): the top_n cut is a distributed
    TakeOrdered (``_vocab_top`` — the t9/s3 ``orderBy+limit``
    discipline). The earlier form ranked the FULL vocabulary through one
    unpartitioned row_number/running-sum window — at web-corpus scale
    that funnels billions of distinct tokens into a single task (Spark's
    own ``WindowExec: No Partition Defined`` warning named it). Rank and
    the cumulative numerator are now computed driver-side over the
    collected top_n rows — a BOUNDED collect, sized by the caller's
    ``top_n`` parameter exactly like s3's centroid aggregates — with
    exact Python-int accumulation, so the coverage column stays
    order-of-summation-proof and hash-matches the DuckDB twin. The
    returned plan contains NO window node (tests assert this); the only
    corpus-scale jobs are the two token aggregations (count is algebraic,
    map-side partial aggregation collapses hot stopwords pre-shuffle).

    Note: the top_n collect makes construction EAGER (it runs the
    vocabulary job), the same trade s3/d8's centroid training makes."""
    top = _vocab_top(docs, top_n, text_col).collect()
    rows = []
    cum = 0
    for i, r in enumerate(sorted(top, key=lambda r: (-r["cnt"], r["tok"]))):
        cum += int(r["cnt"])
        rows.append((i + 1, r["tok"], int(r["cnt"]), int(r["doc_freq"]), cum))
    ranked = docs.sparkSession.createDataFrame(
        rows, schema="rank int, tok string, cnt long, doc_freq long, cum_cnt long"
    )
    toks = docs.select(F.explode(tokens(text_col)).alias("tok"))
    total = toks.agg(F.count("*").alias("total_tokens"))
    return ranked.crossJoin(F.broadcast(total)).select(
        "rank",
        "tok",
        "cnt",
        "doc_freq",
        (F.col("cum_cnt").cast("double") / F.col("total_tokens").cast("double")).alias(
            "cum_coverage"
        ),
    )


def vocabulary_stats_sql(
    table: str = "documents", top_n: int = 1000, col: str = "text"
) -> str:
    toks = TOKENS_SQL.format(col=col)
    return f"""
WITH tok AS (
    SELECT doc_id, unnest({toks}) AS tok FROM {table}
),
vocab AS (
    SELECT tok, CAST(count(*) AS BIGINT) AS cnt,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_freq
    FROM tok GROUP BY tok
),
total AS (SELECT CAST(count(*) AS BIGINT) AS total_tokens FROM tok)
SELECT CAST(rank AS INT) AS rank, tok, cnt, doc_freq,
       CAST(cum_cnt AS DOUBLE) / CAST(total_tokens AS DOUBLE) AS cum_coverage
FROM (
    SELECT tok, cnt, doc_freq,
           row_number() OVER (ORDER BY cnt DESC, tok ASC) AS rank,
           sum(cnt) OVER (
               ORDER BY cnt DESC, tok ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS cum_cnt
    FROM vocab
) CROSS JOIN total
WHERE rank <= {top_n}
"""


def source_quality_rollup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-source curation dashboard: doc counts, token totals, quality
    mass and language mix per ``source`` — the rollup a data-curation
    pipeline uses to decide per-source sampling weights. Quality doubles
    are summed as exact integer micro-units (the ``language_stats``
    pattern) so the rollup is accumulation-order-proof."""
    feats = text_features(docs, text_col)
    src = docs.select("doc_id", "source")
    return (
        feats.join(src, on="doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.sum(F.round(F.col("quality") * 1_000_000).cast("long")).alias(
                "sum_quality_micros"
            ),
            F.count_distinct("lang_pred").alias("n_langs"),
            F.count_distinct("fingerprint").alias("n_unique_fingerprints"),
        )
    )


def source_quality_rollup_sql(table: str = "documents", col: str = "text") -> str:
    return f"""
WITH feats AS (
    SELECT doc_id, source,
           {token_count_sql(col)} AS n_tokens,
           {quality_score_sql(col)} AS quality,
           {lang_id_sql(col)} AS lang_pred,
           {fingerprint_sql(col)} AS fingerprint
    FROM {table}
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(sum(CAST(round(quality * 1000000) AS BIGINT)) AS BIGINT) AS sum_quality_micros,
       CAST(count(DISTINCT lang_pred) AS BIGINT) AS n_langs,
       CAST(count(DISTINCT fingerprint) AS BIGINT) AS n_unique_fingerprints
FROM feats
GROUP BY source
"""


NGRAM_COLLISION_N = 13


def ngram_collision_decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = NGRAM_COLLISION_N,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact token-n-gram collision decontamination — the published
    alternative to the winnowing-overlap form (``decontaminate``): a
    training document is contaminated when it shares AT LEAST ONE exact
    ``n``-token n-gram with the held-out benchmark (the 13-gram rule used
    for GPT-3/PaLM-style training-set decontamination; the winnow form
    scores fuzzy substring overlap instead, and a real pipeline runs
    both). Documents shorter than ``n`` tokens have no n-grams and are
    never flagged.

    Returns every corpus id with ``n_collisions`` (count of DISTINCT
    colliding n-grams) and a ``contaminated`` flag.

    Scale posture (same as p4): n-grams come from one map-side pass over
    each side — tokenize once, hash each n-token window to a 48-bit
    md5-prefix key (md5 of the space-joined window; 48 bits keeps
    cross-engine conv() exact while making accidental hash collisions
    negligible at benchmark-set cardinality — the colliding SIDE is the
    benchmark's distinct gram set, which is tiny and BROADCASTS; the
    corpus is never shuffled by gram). One aggregation keyed by doc id
    produces the counts. The gram window slide is a ``transform`` over a
    precomputed token array — staged behind an alias boundary so
    tokenization runs once per document, not once per gram (the winnow
    staging lesson, text.py round 7)."""
    if n < 1:
        raise ValueError(f"n-gram width must be >= 1, got {n}")
    toks = tokens(text_col)

    def grams(df: DataFrame) -> DataFrame:
        staged = df.select(F.col(id_col), toks.alias("__tk"))
        tk = F.col("__tk")
        m = F.size(tk) - (int(n) - 1)
        hashed = staged.select(
            F.col(id_col),
            F.when(
                m >= 1,
                F.transform(
                    F.sequence(F.lit(1), F.greatest(m, F.lit(1))),
                    lambda i: F.conv(
                        F.substring(
                            F.md5(F.concat_ws(" ", F.slice(tk, i, int(n)))), 1, 12
                        ),
                        16,
                        10,
                    ).cast("long"),
                ),
            )
            .otherwise(F.array().cast("array<long>"))
            .alias("__gr"),
        )
        return hashed.select(
            F.col(id_col), F.explode(F.array_distinct("__gr")).alias("g")
        )

    doc_grams = grams(docs)
    bench_grams = grams(benchmark).select("g").distinct()
    hits = (
        doc_grams.join(F.broadcast(bench_grams), on="g", how="left_semi")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_collisions"))
    )
    ids = docs.select(id_col)
    return ids.join(hits, on=id_col, how="left").select(
        id_col,
        F.coalesce(F.col("n_collisions"), F.lit(0).cast("long")).alias("n_collisions"),
        (F.coalesce(F.col("n_collisions"), F.lit(0)) > 0).alias("contaminated"),
    )



def tokens_sql(col: str = "text") -> str:
    """DuckDB twin of ``tokens`` (lowercased alphanumeric runs) — the
    callable face of ``TOKENS_SQL``, shared by every SQL builder that
    tokenizes (p4b, t9, the p9 ngram stage); ONE source of truth so a
    tokenization change can never diverge the gram/rarity oracles from
    the fingerprint oracles."""
    return TOKENS_SQL.format(col=col)


def ngram_hash_list_sql(tk: str, n: int) -> str:
    """DuckDB list of 48-bit md5-prefix hashes of every ``n``-token gram
    of token-list expression ``tk`` — the twin of p4b's gram builder."""
    return (
        f"list_transform(range(1, greatest(len({tk}) - {int(n) - 1}, 0) + 1), "
        f"i -> ('0x' || substr(md5(array_to_string({tk}[i:i + {int(n) - 1}], ' ')), 1, 12))::BIGINT)"
    )


def ngram_collision_decontaminate_sql(
    table: str = "documents",
    bench_pred: str = "doc_id % 97 = 0",
    n: int = NGRAM_COLLISION_N,
    col: str = "text",
) -> str:
    """DuckDB twin of ``ngram_collision_decontaminate`` for a benchmark
    that is a predicate-selected subset of the corpus (the driver
    fixture). Same tokenization (lowercased alphanumeric runs), same
    48-bit md5-prefix gram keys."""
    return f"""
WITH tk AS (
    SELECT doc_id, {tokens_sql(col)} AS tk FROM {table}
),
doc_grams AS (
    SELECT DISTINCT doc_id, unnest({ngram_hash_list_sql('tk', n)}) AS g
    FROM tk
),
bench AS (SELECT DISTINCT g FROM doc_grams WHERE {bench_pred}),
hits AS (
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_collisions
    FROM doc_grams JOIN bench USING (g) GROUP BY 1
)
SELECT t.doc_id,
       COALESCE(h.n_collisions, 0) AS n_collisions,
       COALESCE(h.n_collisions, 0) > 0 AS contaminated
FROM tk t LEFT JOIN hits h USING (doc_id)
"""


# Rarity quantum: rarity(freq) = 1e12 div freq as BIGINT — TRUE integer
# division on both engines (Spark `div`, DuckDB `//`), never a
# floor-of-double-division (r8 advice: `lit(1e12)/freq` was IEEE double
# division + floor, whose rounding at a quotient boundary is a property
# of libm-free luck, not arithmetic). Integer division keeps every
# per-token contribution and every per-document BIGINT sum EXACT
# (associative, partition-order-proof) — the libm-free stand-in for a
# -log(p) unigram score (monotone in 1/freq, which is what threshold
# filtering consumes). 1e12 >> any corpus frequency, so precision loss is
# only the integer quotient's sub-unit truncation.
_RARITY_SCALE = 1_000_000_000_000


def unigram_rarity(
    docs: DataFrame,
    top_k: int = 50_000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-trained unigram-frequency quality score — the CCNet-family
    statistical filter: score every document by the mean RARITY of its
    tokens under the corpus's own unigram distribution (high mean rarity
    = improbable token stream = gibberish/noise candidate; low = stopword
    soup). The standard recipe scores -log p(token) under a reference LM;
    this uses the monotone-equivalent integer rarity ``1e12 div freq``
    so every sum is an exact BIGINT and the DuckDB twin agrees bit-for-bit
    (log() is libm and the engines may differ in the last ulp — the same
    reason t5's TF-IDF uses rational scoring).

    Returns (doc_id, n_tokens, rarity_sum, mean_rarity) for every doc;
    empty docs score 0. Out-of-vocabulary tokens (outside the ``top_k``
    most frequent) take frequency 1 — maximally rare — which is also what
    caps the vocabulary state: at 100 TB the full vocab is unbounded
    (typo/hash tokens), the top-k head is what a reference LM would model.

    Scale shape: ONE token-keyed aggregation builds the frequency table
    (count is algebraic — map-side partial aggregation collapses hot
    stopwords before the shuffle, so token skew is benign); the top-k cut
    is orderBy+limit (distributed TakeOrdered, s3's seeding discipline —
    never a global row_number window); the vocabulary BROADCASTS (top_k
    rows) so the exploded corpus side is a map-side join; the per-doc sum
    is the one doc-keyed aggregation, again with partial aggregation
    doing the heavy lifting before the shuffle. The corpus crosses the
    wire once keyed by token (pre-reduced) and once keyed by doc."""
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    tok_rows = docs.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("tok")
    )
    vocab = (
        tok_rows.groupBy("tok")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("tok"))
        .limit(int(top_k))
    )
    # exact BIGINT quotient: Spark's `div` is integral division on longs
    # (DuckDB twin uses `//`) — see the _RARITY_SCALE comment
    rarity = F.expr(
        f"{_RARITY_SCALE}L div coalesce(freq, 1L)"
    ).cast("long")
    scored = (
        tok_rows.join(F.broadcast(vocab), on="tok", how="left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(rarity).alias("rarity_sum"),
        )
    )
    return docs.select(id_col).join(scored, on=id_col, how="left").select(
        id_col,
        F.coalesce(F.col("n_tokens"), F.lit(0).cast("long")).alias("n_tokens"),
        F.coalesce(F.col("rarity_sum"), F.lit(0).cast("long")).alias("rarity_sum"),
        F.when(
            F.coalesce(F.col("n_tokens"), F.lit(0)) > 0,
            F.col("rarity_sum").cast("double") / F.col("n_tokens").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("mean_rarity"),
    )


def unigram_rarity_sql(
    table: str = "documents", top_k: int = 50_000, col: str = "text"
) -> str:
    """DuckDB twin of ``unigram_rarity``: same tokenization, same top-k
    vocabulary cut (freq DESC, token ASC), same integer rarity sums."""
    return f"""
WITH tok_rows AS (
    SELECT doc_id, unnest({tokens_sql(col)}) AS tok FROM {table}
),
vocab AS (
    SELECT tok, freq FROM (
        SELECT tok, CAST(count(*) AS BIGINT) AS freq,
               row_number() OVER (ORDER BY count(*) DESC, tok) AS rn
        FROM tok_rows GROUP BY tok
    ) WHERE rn <= {int(top_k)}
),
scored AS (
    SELECT t.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(SUM({_RARITY_SCALE} // COALESCE(v.freq, 1)) AS BIGINT)
               AS rarity_sum
    FROM tok_rows t LEFT JOIN vocab v USING (tok)
    GROUP BY t.doc_id
)
SELECT d.doc_id,
       COALESCE(s.n_tokens, 0) AS n_tokens,
       COALESCE(s.rarity_sum, 0) AS rarity_sum,
       CASE WHEN COALESCE(s.n_tokens, 0) > 0
            THEN CAST(s.rarity_sum AS DOUBLE) / CAST(s.n_tokens AS DOUBLE)
            ELSE 0.0 END AS mean_rarity
FROM {table} d LEFT JOIN scored s USING (doc_id)
"""


# ---------------------------------------------------------------------------
# t10: Gopher quality rules (round 9)
# ---------------------------------------------------------------------------

# The 8 required "stop words" of the Gopher rule set (Rae et al. 2021,
# arXiv:2112.11446, Table A1): a document must contain at least 2.
GOPHER_REQUIRED_WORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def _gopher_flags(
    text_col: str,
    min_words: int,
    max_words: int,
    required_min: int,
) -> tuple[Column, dict[str, Column]]:
    """(n_words, per-rule flag columns) for the Gopher rule set — shared
    by ``gopher_quality`` (audit table) and the p9 pipeline's
    ``quality_mode="gopher"`` map-side filter, so the two can never
    drift."""
    text = F.col(text_col)
    words = F.filter(F.split(text, r"\s+"), lambda x: x != F.lit(""))
    lines = F.filter(F.split(text, r"\n"), lambda x: x != F.lit(""))
    n_words = F.size(words).cast("long")
    sum_len = F.aggregate(
        F.transform(words, lambda w: F.length(w).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    n_sym = (
        F.regexp_count(text, F.lit("#")) + F.regexp_count(text, F.lit(r"\.\.\."))
    ).cast("long")
    n_lines = F.size(lines).cast("long")
    n_bullet = F.size(
        F.filter(
            lines,
            lambda l: F.trim(l).startswith("•") | F.trim(l).startswith("- "),
        )
    ).cast("long")
    n_ellipsis_end = F.size(
        F.filter(lines, lambda l: F.trim(l).endswith("..."))
    ).cast("long")
    n_alpha = F.size(
        F.filter(words, lambda w: w.rlike("[a-zA-Z]"))
    ).cast("long")
    toks = tokens(text_col)
    req = F.array(*[F.lit(w) for w in GOPHER_REQUIRED_WORDS])
    n_required = F.size(
        F.filter(req, lambda w: F.array_contains(toks, w))
    ).cast("long")
    flags = {
        "ok_word_count": (n_words >= F.lit(int(min_words)))
        & (n_words <= F.lit(int(max_words))),
        # 3 <= sum/n <= 10 by cross-multiplication (n=0 handled by
        # ok_word_count; the comparison itself stays false-safe: 0<=0<=0)
        "ok_mean_word_len": (F.lit(3) * n_words <= sum_len)
        & (sum_len <= F.lit(10) * n_words),
        # sym/words <= 0.1  <=>  10*sym <= words
        "ok_symbol_ratio": F.lit(10) * n_sym <= n_words,
        # bullet lines < 90%  <=>  10*bullet < 9*lines
        "ok_bullet_lines": F.lit(10) * n_bullet
        < F.lit(9) * F.greatest(n_lines, F.lit(1).cast("long")),
        # ellipsis-ending lines <= 30%  <=>  10*ell <= 3*lines
        "ok_ellipsis_lines": F.lit(10) * n_ellipsis_end
        <= F.lit(3) * F.greatest(n_lines, F.lit(1).cast("long")),
        # >= 80% words with an alphabetic char  <=>  5*alpha >= 4*words
        "ok_alpha_words": F.lit(5) * n_alpha >= F.lit(4) * n_words,
        "ok_required_words": n_required >= F.lit(int(required_min)),
    }
    return n_words, flags


def gopher_keep(
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    required_min: int = 2,
) -> Column:
    """The conjunctive Gopher keep verdict as ONE boolean column — the
    map-side filter form the p9 pipeline composes (no flags
    materialized, no join)."""
    _, flags = _gopher_flags(text_col, min_words, max_words, required_min)
    keep = None
    for c in flags.values():
        keep = c if keep is None else (keep & c)
    return keep


def gopher_quality(
    docs: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    required_min: int = 2,
) -> DataFrame:
    """Gopher-rule document quality filter — the published heuristic set
    of Rae et al. 2021 (arXiv:2112.11446, Table A1), the standard
    first-pass web filter in LLM curation stacks (reused by MassiveText,
    RefinedWeb, Dolma): word-count bounds, mean-word-length bounds
    [3, 10], symbol-to-word ratio (# and ... vs words) <= 0.1, bullet- /
    ellipsis-line ratios (< 90% bullet-starting, <= 30% ellipsis-ending),
    >= 80% of words containing an alphabetic character, and >= 2 of the 8
    required English function words. Returns every rule as its own flag
    plus the conjunctive ``keep`` verdict, so a pipeline can audit WHICH
    rule fired (the published practice — Dolma reports per-rule drop
    rates).

    Exactness discipline: every ratio threshold is evaluated by INTEGER
    cross-multiplication over exact BIGINT counts (e.g. mean word length
    in [3,10] is ``3*n <= sum_len AND sum_len <= 10*n``; the 80% alpha
    rule is ``5*alpha >= 4*n``) — no doubles anywhere, so the DuckDB twin
    (``gopher_quality_sql``) agrees bit-for-bit on every flag. "Words"
    are whitespace runs (the paper's unit — NOT the lowercased alnum
    ``tokens``, which would erase the mean-length and symbol signals);
    the required-word containment uses ``tokens`` so punctuation never
    blocks a hit.

    ``required_min`` (default 2 = the published rule) exists because the
    required-word containment is corpus-language-sensitive — a synthetic
    or non-English corpus may legitimately relax it (the p9 pipeline's
    gopher variant does on the driver fixture).

    100 TB shape: pure map-side projection — per-row split/regexp count
    arithmetic inside whole-stage codegen, zero shuffles, zero Python;
    scales with scan bandwidth exactly like t8's PII scrub."""
    n_words, flags = _gopher_flags(text_col, min_words, max_words, required_min)
    keep = None
    for c in flags.values():
        keep = c if keep is None else (keep & c)
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        *[c.alias(name) for name, c in flags.items()],
        keep.alias("keep"),
    )


def gopher_quality_sql(
    table: str = "documents",
    col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    required_min: int = 2,
) -> str:
    """DuckDB twin of ``gopher_quality``: identical whitespace/line
    splits, identical integer cross-multiplied thresholds."""
    req = "[" + ", ".join(f"'{w}'" for w in GOPHER_REQUIRED_WORDS) + "]"
    toks = TOKENS_SQL.format(col=col)
    return f"""
WITH base AS (
    SELECT doc_id,
           list_filter(regexp_split_to_array({col}, '\\s+'), x -> x <> '') AS words,
           list_filter(regexp_split_to_array({col}, '\\n'), x -> x <> '') AS lines,
           CAST(length({col}) - length(replace({col}, '#', '')) AS BIGINT)
               + CAST(len(regexp_extract_all({col}, '\\.\\.\\.')) AS BIGINT) AS n_sym,
           len(list_filter({req}, w -> list_contains({toks}, w))) AS n_required
    FROM {table}
),
counted AS (
    SELECT doc_id, n_sym, n_required,
           CAST(len(words) AS BIGINT) AS n_words,
           CAST(COALESCE(list_sum(list_transform(words, w -> length(w))), 0)
                AS BIGINT) AS sum_len,
           CAST(len(lines) AS BIGINT) AS n_lines,
           CAST(len(list_filter(lines, l ->
                starts_with(trim(l), chr(8226)) OR starts_with(trim(l), '- ')))
                AS BIGINT) AS n_bullet,
           CAST(len(list_filter(lines, l -> suffix(trim(l), '...')))
                AS BIGINT) AS n_ellipsis_end,
           CAST(len(list_filter(words, w -> regexp_matches(w, '[a-zA-Z]')))
                AS BIGINT) AS n_alpha
    FROM base
)
SELECT doc_id, n_words,
       (n_words >= {int(min_words)} AND n_words <= {int(max_words)}) AS ok_word_count,
       (3 * n_words <= sum_len AND sum_len <= 10 * n_words) AS ok_mean_word_len,
       (10 * n_sym <= n_words) AS ok_symbol_ratio,
       (10 * n_bullet < 9 * greatest(n_lines, 1)) AS ok_bullet_lines,
       (10 * n_ellipsis_end <= 3 * greatest(n_lines, 1)) AS ok_ellipsis_lines,
       (5 * n_alpha >= 4 * n_words) AS ok_alpha_words,
       (n_required >= {int(required_min)}) AS ok_required_words,
       (n_words >= {int(min_words)} AND n_words <= {int(max_words)}
        AND 3 * n_words <= sum_len AND sum_len <= 10 * n_words
        AND 10 * n_sym <= n_words
        AND 10 * n_bullet < 9 * greatest(n_lines, 1)
        AND 10 * n_ellipsis_end <= 3 * greatest(n_lines, 1)
        AND 5 * n_alpha >= 4 * n_words
        AND n_required >= {int(required_min)}) AS keep
FROM counted
"""


# ---------------------------------------------------------------------------
# t11: C4-style line-level cleaning (round 9)
# ---------------------------------------------------------------------------


def c4_clean(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """C4-style line-level page cleaning — the published rule set of
    Raffel et al. 2020 (arXiv:1910.10683 §2.2, the C4 corpus recipe),
    still the canonical first pass for web text: keep only lines that end
    in terminal punctuation (. ! ? ") AND contain at least 5 words AND do
    not mention javascript; drop the whole page if it contains "lorem
    ipsum" or a curly brace, or if fewer than 3 lines survive (the
    paper's >= 3 sentences rule, with surviving terminal-punctuated
    lines as the sentence proxy — documented divergence: C4 used a
    sentence splitter; a line that passed the terminal-punctuation rule
    IS a sentence boundary for web text).

    Returns (doc_id, n_lines, n_kept_lines, has_lorem, has_brace, kept,
    clean_text): per-page audit counters plus the reassembled cleaned
    text (newline-joined surviving lines; empty string when the page is
    dropped, so downstream consumers never see half-cleaned text).

    100 TB shape: pure map-side higher-order functions over the line
    array (split → filter with nested word-count filter → concat) inside
    whole-stage codegen — zero shuffles, zero Python, scan-bandwidth
    bound like t8/t10. The DuckDB twin (``c4_clean_sql``) replays the
    identical lambdas."""
    text = F.col(text_col)
    lines = F.filter(F.split(text, r"\n"), lambda x: F.trim(x) != F.lit(""))

    def _line_ok(l):
        t = F.trim(l)
        n_words = F.size(F.filter(F.split(t, r"\s+"), lambda w: w != F.lit("")))
        return (
            t.rlike('[.!?"]$')
            & (n_words >= F.lit(5))
            & ~F.lower(t).contains("javascript")
        )

    kept_lines = F.filter(lines, _line_ok)
    has_lorem = F.lower(text).contains("lorem ipsum")
    has_brace = text.contains("{")
    n_kept = F.size(kept_lines).cast("long")
    page_ok = (~has_lorem) & (~has_brace) & (n_kept >= F.lit(3))
    return docs.select(
        "doc_id",
        F.size(lines).cast("long").alias("n_lines"),
        n_kept.alias("n_kept_lines"),
        has_lorem.alias("has_lorem"),
        has_brace.alias("has_brace"),
        page_ok.alias("kept"),
        # explicit lambda, NOT F.trim itself — trim's optional second
        # parameter would receive the element index (see c4_span_dedup)
        F.when(page_ok, F.array_join(F.transform(kept_lines, lambda l: F.trim(l)), "\n"))
        .otherwise(F.lit(""))
        .alias("clean_text"),
    )


def c4_clean_sql(table: str = "documents", col: str = "text") -> str:
    """DuckDB twin of ``c4_clean``: same line split, same per-line lambda
    (terminal punctuation, >= 5 words, no 'javascript'), same page rules."""
    line_ok = (
        "regexp_matches(trim(l), '[.!?\"]$') "
        "AND len(list_filter(regexp_split_to_array(trim(l), '\\s+'), "
        "w -> w <> '')) >= 5 "
        "AND NOT contains(lower(trim(l)), 'javascript')"
    )
    return f"""
WITH base AS (
    SELECT doc_id,
           list_filter(regexp_split_to_array({col}, '\\n'),
                       x -> trim(x) <> '') AS lines,
           contains(lower({col}), 'lorem ipsum') AS has_lorem,
           contains({col}, '{{') AS has_brace
    FROM {table}
),
cleaned AS (
    SELECT doc_id, has_lorem, has_brace,
           CAST(len(lines) AS BIGINT) AS n_lines,
           list_filter(lines, l -> {line_ok}) AS kept_lines
    FROM base
)
SELECT doc_id, n_lines,
       CAST(len(kept_lines) AS BIGINT) AS n_kept_lines,
       has_lorem, has_brace,
       (NOT has_lorem AND NOT has_brace AND len(kept_lines) >= 3) AS kept,
       CASE WHEN NOT has_lorem AND NOT has_brace AND len(kept_lines) >= 3
            THEN array_to_string(list_transform(kept_lines, l -> trim(l)), chr(10))
            ELSE '' END AS clean_text
FROM cleaned
"""


def c4_span_dedup(
    docs: DataFrame, text_col: str = "text", span: int = 3
) -> DataFrame:
    """C4's CORPUS-level dedup stage (Raffel et al. 2020 \u00a72.2: "we
    discarded all but one of any three-sentence span occurring more than
    once in the data set") --- the global companion to ``c4_clean``'s
    per-page rules, with the same line-as-sentence proxy. Every sliding
    ``span``-line window is hashed; the globally FIRST occurrence (by
    lexicographic (doc_id, start) --- deterministic, engine-independent)
    survives, and every line covered by a later duplicate occurrence is
    dropped before the text is reassembled. Returns (doc_id, n_lines,
    n_removed_lines, clean_text).

    Scale shape: the span STRING never crosses the wire --- each line is
    md5-hashed once per doc and a span's hash is the md5 of its lines'
    FIXED-WIDTH hash concatenation (r9 review: a separator-joined hash
    is boundary-ambiguous when raw text can contain the separator byte;
    32-hex blocks need no separator), all inside the per-doc array
    transform, so the only corpus-scale
    shuffle carries (hash, doc_id, start) triples: one hash-partitioned
    window ranks occurrences (row_number over a many-distinct-key
    partition --- millions of tiny groups, the opposite of the t7
    funnel), losers explode to (doc_id, pos) removals, and one doc-keyed
    aggregation collects each doc's removal set for the array-filter
    rebuild. Work is O(total lines), shuffle payload is O(spans x 48
    bytes)."""
    if span < 1:
        raise ValueError(f"span must be >= 1, got {span}")
    from pyspark.sql.window import Window

    text = F.col(text_col)
    # NOTE: the HOF callable must be an explicit single-arg lambda —
    # passing F.trim directly is a trap: pyspark's trim(col, trim=None)
    # takes a SECOND parameter, so transform feeds it the element INDEX
    # as the trim character set and silently strips index digits from
    # line boundaries (caught by the round-9 cross-engine fuzz).
    lines_col = F.transform(
        F.filter(F.split(text, r"\n"), lambda x: F.trim(x) != F.lit("")),
        lambda x: F.trim(x),
    )
    base = docs.select("doc_id", lines_col.alias("lines"))
    n = F.size(F.col("lines"))
    # materialize the per-line hashes as a COLUMN in a lower projection:
    # referencing the transform expression inside the span lambda would
    # re-hash every line once PER SPAN (O(lines x spans) md5s on
    # many-line docs) — as a column it is evaluated once per row and the
    # span lambda only slices it
    hashed = base.select(
        "doc_id",
        "lines",
        F.transform(F.col("lines"), lambda l: F.md5(l)).alias("lh"),
    )
    span_hashes = F.when(
        n >= F.lit(int(span)),
        F.transform(
            F.sequence(F.lit(0), n - F.lit(int(span))),
            lambda i: F.md5(
                F.concat_ws("", F.slice(F.col("lh"), i + 1, int(span)))
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    spans = hashed.select(
        "doc_id", F.posexplode(span_hashes).alias("start", "h")
    )
    w = Window.partitionBy("h").orderBy("doc_id", "start")
    dups = (
        spans.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") > 1)
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("start"), F.col("start") + F.lit(int(span) - 1))
            ).alias("pos"),
        )
        .distinct()
    )
    rem = dups.groupBy("doc_id").agg(
        F.sort_array(F.collect_set("pos")).alias("rem")
    )
    joined = base.join(rem, on="doc_id", how="left").select(
        "doc_id",
        "lines",
        F.coalesce(F.col("rem"), F.array().cast("array<int>")).alias("rem"),
    )
    kept = F.filter(
        F.col("lines"), lambda x, i: ~F.array_contains(F.col("rem"), i)
    )
    return joined.select(
        "doc_id",
        F.size("lines").cast("long").alias("n_lines"),
        F.size("rem").cast("long").alias("n_removed_lines"),
        F.array_join(kept, "\n").alias("clean_text"),
    )


def c4_span_dedup_sql(
    table: str = "documents", col: str = "text", span: int = 3
) -> str:
    """DuckDB twin of ``c4_span_dedup``: same trimmed-line split, same
    md5-of-concatenated-line-md5s span hash, same global
    (doc_id, start) first-occurrence rule."""
    return f"""
WITH base AS (
    SELECT doc_id,
           list_transform(
               list_filter(regexp_split_to_array({col}, '\\n'),
                           x -> trim(x) <> ''),
               x -> trim(x)) AS lines
    FROM {table}
),
spans AS (
    SELECT b.doc_id, u.i AS start,
           md5(array_to_string(
               list_transform(
                   list_slice(b.lines, u.i + 1, u.i + {int(span)}),
                   l -> md5(l)),
               '')) AS h
    FROM base b, UNNEST(range(len(b.lines) - {int(span) - 1})) AS u(i)
),
dups AS (
    SELECT doc_id, start FROM (
        SELECT doc_id, start,
               row_number() OVER (PARTITION BY h ORDER BY doc_id, start) AS rn
        FROM spans
    ) WHERE rn > 1
),
removed AS (
    SELECT DISTINCT d.doc_id, d.start + o.o AS pos
    FROM dups d, UNNEST(range({int(span)})) AS o(o)
),
rem AS (
    SELECT doc_id, list_sort(list(pos)) AS rem FROM removed GROUP BY doc_id
)
SELECT b.doc_id,
       CAST(len(b.lines) AS BIGINT) AS n_lines,
       CAST(COALESCE(len(r.rem), 0) AS BIGINT) AS n_removed_lines,
       COALESCE(array_to_string(
           list_transform(
               list_filter(range(len(b.lines)),
                           i -> NOT list_contains(COALESCE(r.rem, []), i)),
               i -> b.lines[i + 1]),
           chr(10)), '') AS clean_text
FROM base b LEFT JOIN rem r USING (doc_id)
"""
