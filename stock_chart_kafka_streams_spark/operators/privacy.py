"""PII scrubbing for training-data pipelines.

Web-scale corpora carry emails, phone numbers, and IP addresses that a
training pipeline must redact before the text reaches a model (the
standard pre-training curation step alongside dedup and quality
filtering — e.g. the C4/RefinedWeb-style scrub). This module does it as
pure JVM-side regexp projections — no shuffle, no Python UDFs — so
scrubbing 100 TB is a scan-rewrite job that runs inside whole-stage
codegen at full scan bandwidth.

Cross-engine contract: every pattern is written in the common subset of
Java regex (Spark) and RE2 (DuckDB) — character classes, bounded
repetition, ``\\b`` word boundaries, no backreferences/lookaround (RE2
has neither) — and redaction applies the patterns in one fixed list
order in both engines, so the DuckDB twin is bit-for-bit and the
operator carries a full value-hash oracle (match COUNTS are taken per
pattern on the ORIGINAL text; both engines count leftmost
non-overlapping matches).

The synthetic ``documents`` fixture contains no organic PII, so a
hash-match there would only prove "no-op == no-op". ``with_synthetic_pii``
seeds deterministic doc_id-derived PII into a slice of the corpus —
expressed identically in both engines — so the driver-level oracle
exercises real matches (tests/test_privacy.py additionally pins exact
redactions on crafted rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (name, pattern, replacement) — applied in THIS order in both engines.
# Patterns stay inside the Java-regex ∩ RE2 common subset (see module
# docstring). Email before ipv4/phone so its digit runs are consumed
# first; ipv4 before phone so dotted quads never half-match as phones.
#
# Phone formats covered (NANP-shaped): 555-123-4567 / 555.123.4567 /
# 555 123 4567, (555) 123-4567, each with optional +1/1 country prefix,
# and bare 10-digit runs (\b-guarded, so only exactly-10-digit tokens —
# the standard over-redaction tradeoff of a C4-style scrub). The leading
# \b rides on the first DIGIT alternative, not the whole pattern: \b
# before "+"/"(" is between two non-word chars and would never match.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (
        "phone",
        r"(\+?1[-. ])?"
        r"(\(\d{3}\)[-. ]?\d{3}[-. ]\d{4}"
        r"|\b\d{3}[-. ]\d{3}[-. ]\d{4}"
        r"|\b\d{10})\b",
        "<PHONE>",
    ),
]


def pii_scrub(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Redact emails / IPv4 addresses / phone numbers and report how many
    of each were removed per document.

    Returns ``(id_col, clean_text, n_email, n_ipv4, n_phone, n_pii)``.
    Counts are taken per pattern on the original text (leftmost
    non-overlapping matches); the redacted text applies the patterns
    sequentially in ``PII_PATTERNS`` order. NULL text is coalesced to ''
    (identically in the SQL twin) so dirty rows keep deterministic,
    cross-engine-identical output.

    Scale posture: a pure per-row projection — regexp_replace /
    regexp_extract_all are codegen'd JVM expressions, so this adds zero
    shuffles and no Python to the hot path.
    """
    txt = F.coalesce(F.col(text_col), F.lit(""))
    counts = [
        F.size(F.regexp_extract_all(txt, F.lit(pat), F.lit(0)))
        .cast("long")
        .alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]
    clean = txt
    for _, pat, repl in PII_PATTERNS:
        clean = F.regexp_replace(clean, pat, repl)
    out = docs.select(
        F.col(id_col), clean.alias("clean_text"), *counts
    )
    total = None
    for name, _, _ in PII_PATTERNS:
        c = F.col(f"n_{name}")
        total = c if total is None else total + c
    return out.withColumn("n_pii", total.cast("long"))


def pii_scrub_sql(
    table: str = "documents", id_col: str = "doc_id", text_col: str = "text"
) -> str:
    """DuckDB twin of ``pii_scrub`` (same patterns, same order, same NULL
    coalesce; ``'g'`` makes regexp_replace global to match Spark)."""
    txt = f"COALESCE({text_col}, '')"

    def q(s: str) -> str:  # SQL single-quote escape for literals
        return s.replace("'", "''")

    count_exprs = ",\n       ".join(
        f"CAST(len(regexp_extract_all({txt}, '{q(pat)}')) AS BIGINT) AS n_{name}"
        for name, pat, _ in PII_PATTERNS
    )
    clean = txt
    for _, pat, repl in PII_PATTERNS:
        clean = f"regexp_replace({clean}, '{q(pat)}', '{q(repl)}', 'g')"
    total = " + ".join(f"n_{name}" for name, _, _ in PII_PATTERNS)
    return f"""
WITH scrubbed AS (
    SELECT {id_col},
       {clean} AS clean_text,
       {count_exprs}
    FROM {table}
)
SELECT *, CAST({total} AS BIGINT) AS n_pii FROM scrubbed
"""


def with_synthetic_pii(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Append deterministic doc_id-derived PII to every 7th document so a
    PII-free synthetic corpus still exercises the match path. The seeding
    is a pure expression mirrored verbatim in ``with_synthetic_pii_sql``,
    so the seeded corpus is itself cross-engine identical — the oracle
    then verifies real redactions, not a no-op."""
    seeded = F.concat(
        F.coalesce(F.col(text_col), F.lit("")),
        F.lit(" contact user"),
        F.col(id_col).cast("string"),
        F.lit("@example.com ip 10.0."),
        (F.col(id_col) % 256).cast("string"),
        F.lit(".1 tel 555-123-4567"),
    )
    return docs.withColumn(
        text_col,
        F.when(F.col(id_col) % 7 == 0, seeded).otherwise(F.col(text_col)),
    )


def with_synthetic_pii_sql(
    table: str = "documents", id_col: str = "doc_id", text_col: str = "text"
) -> str:
    """DuckDB twin of ``with_synthetic_pii``."""
    seeded = (
        f"COALESCE({text_col}, '') || ' contact user' || "
        f"CAST({id_col} AS VARCHAR) || '@example.com ip 10.0.' || "
        f"CAST({id_col} % 256 AS VARCHAR) || '.1 tel 555-123-4567'"
    )
    return f"""
SELECT * REPLACE (
    CASE WHEN {id_col} % 7 = 0 THEN {seeded} ELSE {text_col} END AS {text_col}
) FROM {table}
"""
