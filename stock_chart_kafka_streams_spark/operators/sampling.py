"""Deterministic corpus sampling / splitting for training-data pipelines.

A 100 TB training pipeline needs reproducible dataset membership: the
same document must land in the same split on every run, on any cluster,
with no RNG state to ship. Both operators here derive membership from a
32-bit md5 prefix of the (salted) document id — a pure map-side
expression, no shuffle, no sampling state — and are reproducible
bit-for-bit in DuckDB SQL, so they carry full value-hash oracles
(tests/test_sampling.py).

Scale posture: membership is a per-row projection that runs inside
whole-stage codegen; adding a split column to 100 TB is a pure scan-
rewrite job. Stratified sampling shuffles nothing either — the per-
stratum threshold is applied row-local. (Spark's own ``df.sample`` /
``sampleBy`` are seed-dependent on partitioning and not cross-engine
reproducible, which is why they are not used for dataset membership.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 2^32 — the hash space of the 32-bit md5 prefix.
_HASH_SPACE = 4294967296


def _hash_unit(col: Column) -> Column:
    """md5-derived value in [0, 2^32) as BIGINT; DuckDB twin:
    ``('0x' || substr(md5(x), 1, 8))::BIGINT``."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def hash_split(
    docs: DataFrame,
    weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
    salt: str = "split-v1",
) -> DataFrame:
    """Assign every row a deterministic train/val/test split label.

    ``weights`` maps label -> fraction (must sum to ~1); boundaries are
    cumulative fractions of the 32-bit hash space, so membership depends
    only on (salt, id) — stable across runs, clusters, and row order.
    Change ``salt`` to draw an independent split without touching ids.
    """
    if weights is None:
        weights = {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(weights.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split weights must sum to 1, got {total}")
    h = _hash_unit(F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string")))
    expr: Column | None = None
    acc = 0.0
    # deterministic label order = insertion order of the dict
    labels = list(weights.items())
    for label, w in labels[:-1]:
        acc += w
        bound = int(acc * _HASH_SPACE)
        branch = F.when(h < F.lit(bound), F.lit(label))
        expr = branch if expr is None else expr.when(h < F.lit(bound), F.lit(label))
    last_label = labels[-1][0]
    expr = F.lit(last_label) if expr is None else expr.otherwise(F.lit(last_label))
    return docs.withColumn("split", expr)


def hash_split_sql(
    table: str = "documents",
    weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
    salt: str = "split-v1",
) -> str:
    """DuckDB twin of ``hash_split`` (same boundaries, same hash)."""
    if weights is None:
        weights = {"train": 0.9, "val": 0.05, "test": 0.05}
    h = (
        f"('0x' || substr(md5('{salt}' || '|' || CAST({id_col} AS VARCHAR)), 1, 8))"
        "::BIGINT"
    )
    labels = list(weights.items())
    acc = 0.0
    whens = []
    for label, w in labels[:-1]:
        acc += w
        whens.append(f"WHEN {h} < {int(acc * _HASH_SPACE)} THEN '{label}'")
    case = "CASE " + " ".join(whens) + f" ELSE '{labels[-1][0]}' END"
    return f"SELECT *, {case} AS split FROM {table}"


def stratified_sample(
    docs: DataFrame,
    fractions: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "sample-v1",
) -> DataFrame:
    """Keep a deterministic per-stratum fraction of rows (e.g. language
    rebalancing before training). A row survives iff its hash falls under
    its stratum's threshold; strata absent from ``fractions`` are dropped
    (explicit is better than silently keeping 100%)."""
    for k, f_ in fractions.items():
        if not 0.0 <= f_ <= 1.0:
            raise ValueError(f"fraction for {k!r} must be in [0,1], got {f_}")
    h = _hash_unit(F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string")))
    thresh = F.create_map(
        *[x for k, f_ in fractions.items() for x in (F.lit(k), F.lit(int(f_ * _HASH_SPACE)))]
    )[F.col(strata_col)]
    return docs.where(thresh.isNotNull() & (h < thresh))


def stratified_sample_sql(
    fractions: dict[str, float],
    table: str = "documents",
    strata_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "sample-v1",
) -> str:
    """DuckDB twin of ``stratified_sample``."""
    h = (
        f"('0x' || substr(md5('{salt}' || '|' || CAST({id_col} AS VARCHAR)), 1, 8))"
        "::BIGINT"
    )
    whens = " ".join(
        f"WHEN '{k}' THEN {int(f_ * _HASH_SPACE)}" for k, f_ in fractions.items()
    )
    return f"""
SELECT * FROM {table}
WHERE {h} < (CASE {strata_col} {whens} ELSE NULL END)
"""
