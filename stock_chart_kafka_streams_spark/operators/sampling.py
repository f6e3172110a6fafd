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


# Sentinel standing in for a NULL document id in the membership hash.
# Spark's concat_ws SKIPS nulls while SQL `||` PROPAGATES them, so without
# an explicit coalesce the two engines disagree on NULL-id rows (Spark
# hashes just the salt; DuckDB drops the row / falls to ELSE). Both twins
# coalesce to this sentinel instead, so NULL ids get one well-defined,
# cross-engine-identical split/sample decision.
_NULL_ID_SENTINEL = "~null~"


def _hash_unit(col: Column) -> Column:
    """md5-derived value in [0, 2^32) as BIGINT; DuckDB twin:
    ``('0x' || substr(md5(x), 1, 8))::BIGINT``."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def _salted_id(id_col: str, salt: str) -> Column:
    return F.concat_ws(
        "|",
        F.lit(salt),
        F.coalesce(F.col(id_col).cast("string"), F.lit(_NULL_ID_SENTINEL)),
    )


def _salted_id_sql(id_col: str, salt: str) -> str:
    return (
        f"'{salt}' || '|' || "
        f"COALESCE(CAST({id_col} AS VARCHAR), '{_NULL_ID_SENTINEL}')"
    )


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
    NULL ids hash via the ``_NULL_ID_SENTINEL`` coalesce (identically in
    the SQL twin), so dirty data still gets a deterministic label.
    """
    if weights is None:
        weights = {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(weights.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split weights must sum to 1, got {total}")
    h = _hash_unit(_salted_id(id_col, salt))
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
    """DuckDB twin of ``hash_split`` (same boundaries, same hash, same
    NULL-id sentinel)."""
    if weights is None:
        weights = {"train": 0.9, "val": 0.05, "test": 0.05}
    h = f"('0x' || substr(md5({_salted_id_sql(id_col, salt)}), 1, 8))::BIGINT"
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
    (explicit is better than silently keeping 100%). NULL ids hash via
    the ``_NULL_ID_SENTINEL`` coalesce, matching the SQL twin."""
    for k, f_ in fractions.items():
        if not 0.0 <= f_ <= 1.0:
            raise ValueError(f"fraction for {k!r} must be in [0,1], got {f_}")
    h = _hash_unit(_salted_id(id_col, salt))
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
    """DuckDB twin of ``stratified_sample`` (same hash, same NULL-id
    sentinel)."""
    h = f"('0x' || substr(md5({_salted_id_sql(id_col, salt)}), 1, 8))::BIGINT"
    whens = " ".join(
        f"WHEN '{k}' THEN {int(f_ * _HASH_SPACE)}" for k, f_ in fractions.items()
    )
    return f"""
SELECT * FROM {table}
WHERE {h} < (CASE {strata_col} {whens} ELSE NULL END)
"""


# ---------------------------------------------------------------------------
# sequence packing (concatenate-and-chop) — dataset assembly for training
# ---------------------------------------------------------------------------


def pack_sequences(
    docs: DataFrame,
    budget: int = 2048,
    n_shards: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "pack-v1",
) -> DataFrame:
    """Assign every document a (shard, seq_id, offset) for GPT-style
    sequence packing: concatenate documents in a deterministic
    pseudo-random order and chop the stream into ``budget``-token
    training sequences (a doc belongs to the sequence its first token
    falls in).

    Scale posture: ONE shuffle into ``n_shards`` hash shards, then a
    per-shard window running sum — each shard sorts independently, so
    parallelism is ``n_shards`` regardless of corpus size (size it ~4x
    executor count at 100 TB). The order inside a shard is
    ``(md5-hash, id)`` — reproducible across runs/clusters/engines, no
    RNG state, and hash order doubles as the shuffle of documents that
    packing wants anyway (decorrelates neighboring source docs). All
    arithmetic is BIGINT (token counts, running sums, integer division),
    so the DuckDB twin is bit-for-bit.
    """
    from pyspark.sql.window import Window

    from stock_chart_kafka_streams_spark.operators.text import token_count

    if budget <= 0 or n_shards <= 0:
        raise ValueError("budget and n_shards must be positive")
    h = _hash_unit(_salted_id(id_col, salt))
    base = docs.select(
        F.col(id_col),
        token_count(text_col).cast("long").alias("n_tokens"),
        h.alias("h"),
    ).withColumn("shard", F.pmod(F.col("h"), F.lit(n_shards)).cast("int"))
    w = (
        Window.partitionBy("shard")
        .orderBy("h", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = base.withColumn(
        "offset_in_shard", F.sum("n_tokens").over(w) - F.col("n_tokens")
    )
    return packed.select(
        id_col,
        "shard",
        "n_tokens",
        "offset_in_shard",
        F.expr(f"offset_in_shard div {int(budget)}").alias("seq_id"),
    )


def pack_sequences_sql(
    table: str = "documents",
    budget: int = 2048,
    n_shards: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "pack-v1",
) -> str:
    """DuckDB twin of ``pack_sequences`` (same hash, order, integer math)."""
    from stock_chart_kafka_streams_spark.operators.text import token_count_sql

    h = f"('0x' || substr(md5({_salted_id_sql(id_col, salt)}), 1, 8))::BIGINT"
    return f"""
WITH base AS (
    SELECT {id_col},
           CAST({token_count_sql(text_col)} AS BIGINT) AS n_tokens,
           {h} AS h
    FROM {table}
),
sharded AS (SELECT *, CAST(h % {n_shards} AS INT) AS shard FROM base),
packed AS (
    SELECT {id_col}, shard, n_tokens,
           CAST(sum(n_tokens) OVER (
               PARTITION BY shard ORDER BY h, {id_col}
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) - n_tokens AS offset_in_shard
    FROM sharded
)
SELECT {id_col}, shard, n_tokens, offset_in_shard,
       CAST(offset_in_shard // {int(budget)} AS BIGINT) AS seq_id
FROM packed
"""


# ---------------------------------------------------------------------------
# deterministic global interleave — reproducible training order
# ---------------------------------------------------------------------------


def global_interleave(
    docs: DataFrame,
    n_shards: int = 64,
    id_col: str = "doc_id",
    salt: str = "interleave-v1",
) -> DataFrame:
    """Assign every document a deterministic GLOBAL training position —
    the distributed version of "shuffle the corpus once, then stream it
    in order" that data loaders need for reproducible multi-epoch runs.

    The order is ``(shard, md5-hash, id)`` where ``shard = hash %
    n_shards``: pseudo-random with respect to any source ordering,
    reproducible across runs/clusters/engines with no RNG state.

    Scale posture: a true global ``row_number()`` would sort the corpus
    through ONE task. Instead: one shuffle into ``n_shards`` hash shards,
    a per-shard window rank (each shard sorts independently), then the
    per-shard row counts — ``n_shards`` rows, collected nowhere — get a
    cumulative-offset window and broadcast back. Global position =
    shard offset + in-shard rank - 1. All-integer arithmetic, so the
    DuckDB twin (a plain global row_number over the same order) is
    bit-for-bit.
    """
    from pyspark.sql.window import Window

    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    h = _hash_unit(_salted_id(id_col, salt))
    base = docs.select(F.col(id_col), h.alias("h")).withColumn(
        "shard", F.pmod(F.col("h"), F.lit(n_shards)).cast("int")
    )
    # The offsets join infers isnotnull(shard) and pushes it down the
    # OUTPUT branch only (it can't cross the sizes branch's aggregate),
    # which de-canonicalizes the two otherwise-identical subtrees and
    # defeats ReuseExchange. Filtering here (a no-op: shard is a pmod of
    # a coalesced md5, never null) keeps both branches bit-identical so
    # the corpus scan + shard exchange are shared, not recomputed.
    base = base.where(F.col("shard").isNotNull())
    w = Window.partitionBy("shard").orderBy("h", id_col)
    ranked = base.withColumn("rn", F.row_number().over(w).cast("long"))
    # Shard size as max(rn) FROM THE RANKED BRANCH (not a groupBy count on
    # ``base``): that keeps this subtree bit-identical to the output branch
    # through the window, so ReuseExchange shares ONE corpus scan + shard
    # exchange between them instead of rescanning/reshuffling the corpus
    # for a 16-row count (a pruned-column count branch canonicalizes
    # differently and defeats the reuse).
    sizes = ranked.groupBy("shard").agg(F.max("rn").alias("cnt"))
    # n_shards rows — the single-partition window is deliberate and tiny.
    w_off = Window.orderBy("shard").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = sizes.withColumn(
        "offset", F.coalesce(F.sum("cnt").over(w_off), F.lit(0)).cast("long")
    ).select("shard", "offset")
    return (
        ranked.join(F.broadcast(offsets), "shard")
        .select(
            F.col(id_col),
            F.col("shard"),
            (F.col("offset") + F.col("rn") - F.lit(1)).alias("pos"),
        )
    )


def global_interleave_sql(
    table: str = "documents",
    n_shards: int = 64,
    id_col: str = "doc_id",
    salt: str = "interleave-v1",
) -> str:
    """DuckDB twin of ``global_interleave``: a plain global row_number
    over the identical ``(shard, h, id)`` order."""
    h = f"('0x' || substr(md5({_salted_id_sql(id_col, salt)}), 1, 8))::BIGINT"
    return f"""
WITH base AS (
    SELECT {id_col}, {h} AS h FROM {table}
),
sharded AS (SELECT *, CAST(h % {n_shards} AS INT) AS shard FROM base)
SELECT {id_col}, shard,
       CAST(row_number() OVER (ORDER BY shard, h, {id_col}) AS BIGINT) - 1
           AS pos
FROM sharded
"""


# ---------------------------------------------------------------------------
# per-stratum quality quantile filter (Gopher-style curation)
# ---------------------------------------------------------------------------


def quality_quantile_filter(
    docs: DataFrame,
    keep_num: int = 1,
    keep_den: int = 2,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Keep the top ``keep_num/keep_den`` fraction of documents per
    stratum by quality score (deterministic ties: id ascending). The
    fraction is a RATIONAL and the membership test is pure integer
    arithmetic (``rank * den <= num * n``), so the cut is exact and
    cross-engine identical — no float percentile boundary ambiguity.

    Scale posture: one shuffle on the stratum key, two window passes
    (rank + count) over it. For very hot strata (one language dominating
    a 100 TB corpus) swap the window rank for the two-phase approximate
    threshold: sample the stratum, take the quality value at the target
    rank, then filter map-side — same result modulo boundary ties.
    """
    from pyspark.sql.window import Window

    from stock_chart_kafka_streams_spark.operators.text import quality_score

    if keep_num < 0 or keep_den <= 0:
        raise ValueError("keep fraction must be a non-negative rational")
    d = docs.select(
        F.col(id_col), F.col(strata_col), quality_score(text_col).alias("quality")
    )
    w_rank = Window.partitionBy(strata_col).orderBy(
        F.col("quality").desc(), F.col(id_col)
    )
    w_all = Window.partitionBy(strata_col)
    d = d.withColumn("rn", F.row_number().over(w_rank).cast("long")).withColumn(
        "n_in_stratum", F.count("*").over(w_all)
    )
    return d.where(
        F.col("rn") * F.lit(int(keep_den)) <= F.col("n_in_stratum") * F.lit(int(keep_num))
    ).select(id_col, strata_col, "quality", "rn", "n_in_stratum")


def quality_quantile_filter_sql(
    table: str = "documents",
    keep_num: int = 1,
    keep_den: int = 2,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of ``quality_quantile_filter``."""
    from stock_chart_kafka_streams_spark.operators.text import quality_score_sql

    return f"""
WITH scored AS (
    SELECT {id_col}, {strata_col},
           {quality_score_sql(text_col)} AS quality
    FROM {table}
),
ranked AS (
    SELECT *,
           CAST(row_number() OVER (
               PARTITION BY {strata_col} ORDER BY quality DESC, {id_col}
           ) AS BIGINT) AS rn,
           CAST(count(*) OVER (PARTITION BY {strata_col}) AS BIGINT)
               AS n_in_stratum
    FROM scored
)
SELECT {id_col}, {strata_col}, quality, rn, n_in_stratum
FROM ranked
WHERE rn * {int(keep_den)} <= n_in_stratum * {int(keep_num)}
"""


def quality_quantile_filter_approx(
    docs: DataFrame,
    keep_num: int = 1,
    keep_den: int = 2,
    sample_num: int = 1,
    sample_den: int = 10,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "qquant-v1",
) -> DataFrame:
    """The SCALE path for ``quality_quantile_filter`` (hot strata): a
    deterministic hash-sample of each stratum elects a quality THRESHOLD
    (the sample's value at the target rank), and the full corpus is then
    filtered MAP-SIDE against the broadcast per-stratum thresholds.

    The exact form's window rank funnels every row of a stratum through
    one sort partition — at 100 TB one language can be most of the
    corpus, making that sort the job's bottleneck. Here the only sorted
    data is the sample (``sample_num/sample_den`` of each stratum), the
    threshold table is strata-sized (broadcast), and the corpus pass is
    a scan-filter. Kept fraction is keep_num/keep_den ± sampling error
    O(1/sqrt(sample size)); membership differs from the exact form only
    near the quantile boundary.

    Fully deterministic (md5 hash sample, integer target rank,
    id-ascending tie-breaks), so the DuckDB twin
    (``quality_quantile_filter_approx_sql``) reproduces the sample, the
    thresholds, and the kept set bit-for-bit. Strata with an empty
    sample keep nothing (explicit, like ``stratified_sample``'s absent
    strata). Returns (id, strata, quality, q_threshold).

    Unlike the exact form, the keep fraction must be a PROPER fraction
    (0 < keep_num <= keep_den): the degenerate ends do not round-trip
    through threshold election (keep-nothing would clamp the target rank
    to 1 and keep the sample max; keep-everything would elect no
    threshold and drop the stratum), so they are rejected instead of
    silently diverging from the exact form.
    """
    from stock_chart_kafka_streams_spark.operators.text import quality_score

    if not 0 < sample_num <= sample_den:
        raise ValueError("sample fraction must be in (0, 1]")
    d = docs.select(
        F.col(id_col), F.col(strata_col), quality_score(text_col).alias("quality")
    )
    thresholds = approx_quality_thresholds(
        d,
        keep_num=keep_num,
        keep_den=keep_den,
        sample_num=sample_num,
        sample_den=sample_den,
        strata_col=strata_col,
        id_col=id_col,
        salt=salt,
    )
    return (
        d.join(F.broadcast(thresholds), on=strata_col)
        .where(F.col("quality") >= F.col("q_threshold"))
        .select(id_col, strata_col, "quality", "q_threshold")
    )


def approx_quality_thresholds(
    scored: DataFrame,
    keep_num: int = 1,
    keep_den: int = 2,
    sample_num: int = 1,
    sample_den: int = 10,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "qquant-v1",
) -> DataFrame:
    """Elect the per-stratum quality threshold from a deterministic hash
    sample of ``scored`` (columns: id, strata, ``quality``). Returns the
    strata-sized (strata_col, q_threshold) table the callers broadcast —
    shared by ``quality_quantile_filter_approx`` and the curation
    pipeline's approx quality stage, so both elect IDENTICAL thresholds
    for the same corpus and the pipeline twin can chain the same SQL."""
    from pyspark.sql.window import Window

    if not 0 < keep_num <= keep_den:
        raise ValueError(
            "keep fraction must satisfy 0 < keep_num <= keep_den for the "
            "approx form (degenerate fractions do not survive threshold "
            "election; use quality_quantile_filter for keep-all/keep-none)"
        )
    if not 0 < sample_num <= sample_den:
        raise ValueError("sample fraction must be in (0, 1]")
    h = _hash_unit(_salted_id(id_col, salt))
    samp = scored.where(
        h * F.lit(int(sample_den)) < F.lit(_HASH_SPACE * int(sample_num))
    )
    w_rank = Window.partitionBy(strata_col).orderBy(
        F.col("quality").desc(), F.col(id_col)
    )
    w_all = Window.partitionBy(strata_col)
    ranked = samp.withColumn(
        "rn", F.row_number().over(w_rank).cast("long")
    ).withColumn("ns", F.count("*").over(w_all))
    target = F.greatest(
        F.expr(f"(ns * {int(keep_num)}) div {int(keep_den)}"), F.lit(1)
    )
    return ranked.where(F.col("rn") == target).select(
        strata_col, F.col("quality").alias("q_threshold")
    )


def quality_quantile_filter_approx_sql(
    table: str = "documents",
    keep_num: int = 1,
    keep_den: int = 2,
    sample_num: int = 1,
    sample_den: int = 10,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "qquant-v1",
) -> str:
    """DuckDB twin of ``quality_quantile_filter_approx`` (same hash
    sample, same integer target rank, same threshold filter)."""
    from stock_chart_kafka_streams_spark.operators.text import quality_score_sql

    thresholds = approx_quality_thresholds_sql(
        "scored",
        keep_num=keep_num,
        keep_den=keep_den,
        sample_num=sample_num,
        sample_den=sample_den,
        strata_col=strata_col,
        id_col=id_col,
        salt=salt,
    )
    return f"""
WITH scored AS (
    SELECT {id_col}, {strata_col},
           {quality_score_sql(text_col)} AS quality
    FROM {table}
),
thresholds AS (
    {thresholds}
)
SELECT s.{id_col}, s.{strata_col}, s.quality, t.q_threshold
FROM scored s JOIN thresholds t USING ({strata_col})
WHERE s.quality >= t.q_threshold
"""


def approx_quality_thresholds_sql(
    scored_cte: str,
    keep_num: int = 1,
    keep_den: int = 2,
    sample_num: int = 1,
    sample_den: int = 10,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "qquant-v1",
) -> str:
    """SELECT producing (strata_col, q_threshold) from a scored CTE with
    (id, strata, quality) columns — the SQL twin of
    ``approx_quality_thresholds``, shared by the standalone operator twin
    and the curation-pipeline twin."""
    h = f"('0x' || substr(md5({_salted_id_sql(id_col, salt)}), 1, 8))::BIGINT"
    return f"""
    SELECT {strata_col}, quality AS q_threshold
    FROM (
        SELECT *,
               CAST(row_number() OVER (
                   PARTITION BY {strata_col} ORDER BY quality DESC, {id_col}
               ) AS BIGINT) AS rn,
               CAST(count(*) OVER (PARTITION BY {strata_col}) AS BIGINT) AS ns
        FROM (
            SELECT * FROM {scored_cte}
            WHERE {h} * {int(sample_den)}
                  < CAST({_HASH_SPACE} AS BIGINT) * {int(sample_num)}
        ) samp
    ) ranked
    WHERE rn = greatest((ns * {int(keep_num)}) // {int(keep_den)}, 1)
"""


# ---------------------------------------------------------------------------
# temperature-weighted mixture sampling — data-mixture rebalancing (p10)
# ---------------------------------------------------------------------------

# weight quantum for n^alpha: quantized to integer micros so the
# cross-source weight TOTAL is an exact BIGINT sum (associative,
# partition-order-proof) — a raw double sum's value would depend on
# which engine/partition order added first (the _IVF_QUANT discipline).
_MIX_QUANT = 1_000_000.0


def _pow_quarters(n: Column, alpha_quarters: int) -> Column:
    """n^(alpha_quarters/4) for alpha_quarters in 0..4 as a chain of
    IEEE-correctly-rounded sqrt/multiply ops — libm pow() is NOT
    correctly rounded and may differ across engines in the last ulp,
    but sqrt is exact-rounded everywhere, so restricting temperatures to
    quarter powers keeps the twin bit-identical. Quarter powers cover
    the published data-mixture range (alpha in {1, 3/4, 1/2, 1/4})."""
    d = n.cast("double")
    q2 = F.sqrt(d)
    q1 = F.sqrt(q2)
    return {
        0: F.lit(1.0),
        1: q1,
        2: q2,
        3: q2 * q1,
        4: d,
    }[int(alpha_quarters)]


def _pow_quarters_sql(n_sql: str, alpha_quarters: int) -> str:
    d = f"CAST({n_sql} AS DOUBLE)"
    return {
        0: "1.0",
        1: f"sqrt(sqrt({d}))",
        2: f"sqrt({d})",
        3: f"(sqrt({d}) * sqrt(sqrt({d})))",
        4: d,
    }[int(alpha_quarters)]


def temperature_mixture_sample(
    docs: DataFrame,
    target_frac: float = 0.5,
    alpha_quarters: int = 2,
    strata_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mixture-v1",
) -> DataFrame:
    """Temperature-weighted mixture sampling — the GPT-3/PaLM-family
    data-mixture rebalancing rule: sample sources with probability
    proportional to n_s^alpha (alpha = ``alpha_quarters``/4 < 1 flattens
    the mix, upsampling tail sources relative to their natural share),
    scaled so the EXPECTED kept volume is ``target_frac`` of the corpus.
    Per-source keep rate::

        rate_s = min(1, target_frac * N * w_s / (W * n_s)),
        w_s = round(n_s^alpha * 1e6),  W = sum_s w_s,  N = sum_s n_s

    Membership is the repo's deterministic md5-hash rule (p2/p3): a row
    survives iff hash(salt|id) < rate_s — reproducible across runs,
    clusters and engines; rows keep every column plus ``sample_rate``.

    Determinism: n^alpha is a sqrt/multiply chain (``_pow_quarters`` —
    libm pow() is not correctly rounded, sqrt is), weights quantize to
    integer micros so W is an exact BIGINT sum, and the rate expression
    fixes its operation order, so both engines compute the identical
    IEEE double and the identical survivor set.

    Scale shape: ONE stratum-keyed count (algebraic — map-side partial
    agg absorbs source skew) over the corpus; the per-source rate table
    is stratum-cardinality-sized, derives via a tiny self-agg crossJoin,
    and BROADCASTS back — the corpus itself is filtered map-side, never
    shuffled by stratum."""
    if not 0.0 < target_frac <= 1.0:
        raise ValueError(f"target_frac must be in (0,1], got {target_frac}")
    if alpha_quarters not in (0, 1, 2, 3, 4):
        raise ValueError("alpha_quarters must be an int in 0..4")
    counts = docs.groupBy(strata_col).agg(F.count("*").alias("__n"))
    weighted = counts.withColumn(
        "__w",
        F.floor(_pow_quarters(F.col("__n"), alpha_quarters) * _MIX_QUANT + 0.5).cast(
            "long"
        ),
    )
    # totals derive from `weighted` itself, so the crossJoin is a
    # self-join — explicit frame aliases keep attribute resolution
    # unambiguous under shared lineage
    totals = weighted.agg(
        F.sum("__n").alias("__tn"), F.sum("__w").alias("__tw")
    )
    rates = (
        weighted.alias("wd")
        .crossJoin(F.broadcast(totals.alias("tt")))
        .select(
            F.col(f"wd.{strata_col}").alias(strata_col),
            F.least(
                F.lit(1.0),
                F.lit(float(target_frac))
                * (F.col("tt.__tn").cast("double") * F.col("wd.__w").cast("double"))
                / (F.col("tt.__tw").cast("double") * F.col("wd.__n").cast("double")),
            ).alias("sample_rate"),
        )
    )
    h = _hash_unit(_salted_id(id_col, salt))
    return (
        docs.join(F.broadcast(rates), on=strata_col)
        .where(h.cast("double") < F.col("sample_rate") * F.lit(float(_HASH_SPACE)))
        .select(*docs.columns, "sample_rate")
    )


def temperature_mixture_sample_sql(
    table: str = "documents",
    target_frac: float = 0.5,
    alpha_quarters: int = 2,
    strata_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mixture-v1",
) -> str:
    """DuckDB twin of ``temperature_mixture_sample`` (same quantized
    weights, same fixed-order rate arithmetic, same hash membership —
    and the same parameter validation, so no generated twin corresponds
    to an invalid Spark invocation)."""
    if not 0.0 < target_frac <= 1.0:
        raise ValueError(f"target_frac must be in (0,1], got {target_frac}")
    if alpha_quarters not in (0, 1, 2, 3, 4):
        raise ValueError("alpha_quarters must be an int in 0..4")
    h = f"('0x' || substr(md5({_salted_id_sql(id_col, salt)}), 1, 8))::BIGINT"
    w = _pow_quarters_sql("c.n", alpha_quarters)
    return f"""
WITH counts AS (
    SELECT {strata_col}, CAST(count(*) AS BIGINT) AS n
    FROM {table} GROUP BY {strata_col}
),
weighted AS (
    SELECT {strata_col}, n,
           CAST(floor({w} * {_MIX_QUANT} + 0.5) AS BIGINT) AS w
    FROM counts c
),
totals AS (
    SELECT CAST(SUM(n) AS BIGINT) AS tn, CAST(SUM(w) AS BIGINT) AS tw
    FROM weighted
),
rates AS (
    SELECT {strata_col},
           least(1.0, {float(target_frac)}
                 * (CAST(t.tn AS DOUBLE) * CAST(wd.w AS DOUBLE))
                 / (CAST(t.tw AS DOUBLE) * CAST(wd.n AS DOUBLE))) AS sample_rate
    FROM weighted wd CROSS JOIN totals t
)
SELECT d.*, r.sample_rate
FROM {table} d JOIN rates r USING ({strata_col})
WHERE CAST({h} AS DOUBLE) < r.sample_rate * {float(_HASH_SPACE)}
"""


# ---------------------------------------------------------------------------
# p11: DSIR — hashed n-gram importance scoring / selection (round 9)
# ---------------------------------------------------------------------------

# Fixed-point quantum for the per-bucket importance ratio, and the cap the
# ratio saturates at before quantization. Both are applied in DOUBLE
# arithmetic using only IEEE-correctly-rounded operations (two divisions,
# one multiplication, least, floor) so Spark and DuckDB produce the SAME
# BIGINT weight for every bucket; all downstream per-document sums are then
# exact-BIGINT (associative, partition-order-proof) — the same discipline
# as t9's rarity and p10's quantized mixture weights.
_DSIR_SCALE = 1_000_000.0
_DSIR_CAP = 1_000_000_000_000.0


def _dsir_gram_rows(
    df: DataFrame, n_buckets: int, id_col: str, text_col: str
) -> DataFrame:
    """(id, b) rows — one per unigram AND bigram occurrence (multiplicity
    preserved: DSIR features are hashed n-gram COUNTS), where b is the
    48-bit md5-prefix hash of the gram modulo ``n_buckets``. Tokenization
    is staged behind an alias boundary so it runs once per document, not
    once per gram (the winnow staging lesson, text.py round 7)."""
    from stock_chart_kafka_streams_spark.operators.text import tokens

    staged = df.select(F.col(id_col), tokens(text_col).alias("__tk"))
    tk = F.col("__tk")
    uni = F.transform(
        tk,
        lambda t: F.conv(F.substring(F.md5(t), 1, 12), 16, 10).cast("long"),
    )
    m = F.size(tk) - 1
    bi = F.when(
        m >= 1,
        F.transform(
            F.sequence(F.lit(1), F.greatest(m, F.lit(1))),
            lambda i: F.conv(
                F.substring(F.md5(F.concat_ws(" ", F.slice(tk, i, 2))), 1, 12),
                16,
                10,
            ).cast("long"),
        ),
    ).otherwise(F.array().cast("array<long>"))
    return staged.select(
        F.col(id_col), F.explode(F.concat(uni, bi)).alias("g")
    ).select(F.col(id_col), (F.col("g") % F.lit(int(n_buckets))).alias("b"))


def dsir_importance(
    docs: DataFrame,
    target: DataFrame,
    n_buckets: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
    persist_grams: bool = False,
) -> DataFrame:
    """DSIR-style hashed n-gram importance scoring (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling",
    arXiv:2302.03169): fit bag-of-hashed-ngram distributions on a small
    TARGET corpus (the domain you want more of) and on the RAW corpus,
    then score every raw document by how much its grams look like the
    target — the weight of bucket b is the probability ratio
    p_target(b) / p_raw(b), and a document's score is the mean bucket
    weight over its gram occurrences.

    Two documented divergences from the paper, both in the repo's
    exact-arithmetic house style:

    * the per-bucket weight is the probability RATIO quantized to a
      BIGINT (``floor(min(ratio, cap) * 1e6)``), not ``log p - log q``,
      and a document aggregates by SUM of bucket weights rather than the
      log-domain sum — monotone in each bucket's ratio, and libm-free:
      log() is not correctly rounded and the engines may diverge in the
      last ulp (the t5/t9 rationale). The double divisions themselves ARE
      IEEE-correctly-rounded, so the quantized weights are cross-engine
      bit-identical.
    * selection (``dsir_select``) is deterministic top-k by score instead
      of Gumbel-perturbed sampling — reproducible across runs/clusters
      with no RNG state to ship (the paper's appendix notes top-k as the
      variance-free variant).

    Returns (id, n_grams, score_sum, mean_score) for EVERY raw document
    (empty docs score 0). Degenerate case: a target with no grams yields
    all-zero weights and all-zero scores — in BOTH engines (the twin has
    no hidden error asymmetry; cf. the r8 ADVICE on semantic_dedup).

    Scale shape (100 TB): grams are a map-side projection; bucket counts
    are ONE gram-keyed aggregation each for raw and target (count is
    algebraic — map-side partial aggregation collapses hot buckets before
    the shuffle, and the reduce side is at most ``n_buckets`` rows); the
    weight table is <= n_buckets rows and BROADCASTS, so scoring is a
    map-side join + one doc-keyed aggregation. The corpus never shuffles
    by gram. The raw-count lineage is re-evaluated for its total (a
    <=n_buckets-row aggregate) rather than held in a global window —
    at production scale persist the bucket-count stage; the paper's
    configuration is 10k buckets, well inside broadcast range.

    ``persist_grams=True`` localCheckpoints the raw (id, bucket) gram
    rows so the corpus is tokenized+hashed ONCE instead of once for the
    bucket counts and again for scoring (the p9 ``persist_stages``
    pattern) — trades ~12 bytes/gram of local disk for the second
    tokenize+md5 scan. Values unchanged either way."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    raw_rows = _dsir_gram_rows(docs, n_buckets, id_col, text_col)
    if persist_grams:
        raw_rows = raw_rows.localCheckpoint(eager=True)
    tgt_rows = _dsir_gram_rows(target, n_buckets, id_col, text_col)
    # The two bucket-count aggregates are <= n_buckets rows but each is
    # referenced twice (weights + its total); without materialization each
    # reference re-runs the tokenize+md5 gram scan over its corpus
    # (measured: 36.3 s -> 29.6 s best-of-2 at 500k docs, PERF.md round 9
    # continued). localCheckpoint pins the tiny reduced frame; values are
    # unchanged.
    raw_counts = (
        raw_rows.groupBy("b")
        .agg(F.count("*").alias("raw_cnt"))
        .localCheckpoint(eager=True)
    )
    tgt_counts = (
        tgt_rows.groupBy("b")
        .agg(F.count("*").alias("tgt_cnt"))
        .localCheckpoint(eager=True)
    )
    raw_tot = raw_counts.agg(F.sum("raw_cnt").alias("raw_total"))
    tgt_tot = tgt_counts.agg(F.sum("tgt_cnt").alias("tgt_total"))
    # ((p) / (q)) * SCALE with p, q each a single correctly-rounded double
    # division — the exact parenthesization the SQL twin spells out.
    p = F.col("tgt_cnt").cast("double") / F.col("tgt_total").cast("double")
    q = F.col("raw_cnt").cast("double") / F.col("raw_total").cast("double")
    w = F.when(
        F.coalesce(F.col("tgt_cnt"), F.lit(0)) == 0, F.lit(0).cast("long")
    ).otherwise(
        F.floor(F.least((p / q) * F.lit(_DSIR_SCALE), F.lit(_DSIR_CAP))).cast(
            "long"
        )
    )
    weights = (
        raw_counts.join(tgt_counts, on="b", how="left")
        .crossJoin(F.broadcast(raw_tot))
        .crossJoin(F.broadcast(tgt_tot))
        .select("b", w.alias("w"))
    )
    scored = (
        raw_rows.join(F.broadcast(weights), on="b", how="left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(F.coalesce(F.col("w"), F.lit(0))).alias("score_sum"),
        )
    )
    return docs.select(id_col).join(scored, on=id_col, how="left").select(
        id_col,
        F.coalesce(F.col("n_grams"), F.lit(0).cast("long")).alias("n_grams"),
        F.coalesce(F.col("score_sum"), F.lit(0).cast("long")).alias("score_sum"),
        F.when(
            F.coalesce(F.col("n_grams"), F.lit(0)) > 0,
            F.col("score_sum").cast("double") / F.col("n_grams").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("mean_score"),
    )


def dsir_select(
    docs: DataFrame,
    target: DataFrame,
    k: int,
    n_buckets: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic DSIR selection: the ``k`` raw documents whose hashed
    n-gram distribution best matches the target, by (mean_score DESC, id)
    — orderBy+limit compiles to a distributed TakeOrdered (per-partition
    top-k then a k-row driver merge; t9's vocabulary discipline), never a
    global sort. Ties break on id so the selected set is reproducible."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    scored = dsir_importance(docs, target, n_buckets, id_col, text_col)
    return scored.orderBy(F.col("mean_score").desc(), F.col(id_col)).limit(int(k))


def _dsir_gram_rows_sql(table: str, pred: str | None, n_buckets: int, col: str) -> str:
    """DuckDB (doc_id, b) gram-bucket rows over ``table`` (optionally
    predicate-filtered) — same tokenization, same 48-bit md5-prefix gram
    hashes, same modulo bucketing as ``_dsir_gram_rows``."""
    from stock_chart_kafka_streams_spark.operators.text import (
        ngram_hash_list_sql,
        tokens_sql,
    )

    where = f" WHERE {pred}" if pred else ""
    uni = "list_transform(tk, t -> ('0x' || substr(md5(t), 1, 12))::BIGINT)"
    return (
        f"SELECT doc_id, g % {int(n_buckets)} AS b FROM ("
        f"SELECT doc_id, unnest({uni} || {ngram_hash_list_sql('tk', 2)}) AS g "
        f"FROM (SELECT doc_id, {tokens_sql(col)} AS tk FROM {table}{where}))"
    )


def _dsir_sql(
    table: str, target_pred: str, n_buckets: int, col: str, suffix: str
) -> str:
    scale, cap = _DSIR_SCALE, _DSIR_CAP
    return f"""
WITH raw_rows AS ({_dsir_gram_rows_sql(table, None, n_buckets, col)}),
tgt_rows AS ({_dsir_gram_rows_sql(table, target_pred, n_buckets, col)}),
raw AS (SELECT b, CAST(count(*) AS BIGINT) AS raw_cnt FROM raw_rows GROUP BY b),
tgt AS (SELECT b, CAST(count(*) AS BIGINT) AS tgt_cnt FROM tgt_rows GROUP BY b),
tot AS (
    SELECT (SELECT CAST(SUM(raw_cnt) AS BIGINT) FROM raw) AS raw_total,
           (SELECT CAST(SUM(tgt_cnt) AS BIGINT) FROM tgt) AS tgt_total
),
w AS (
    SELECT r.b,
           CASE WHEN COALESCE(t.tgt_cnt, 0) = 0 THEN 0
                ELSE CAST(floor(least(
                    ((CAST(t.tgt_cnt AS DOUBLE) / CAST(tot.tgt_total AS DOUBLE))
                     / (CAST(r.raw_cnt AS DOUBLE) / CAST(tot.raw_total AS DOUBLE)))
                    * {scale}, {cap})) AS BIGINT)
           END AS w
    FROM raw r LEFT JOIN tgt t USING (b) CROSS JOIN tot
),
scored AS (
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
           CAST(SUM(COALESCE(w.w, 0)) AS BIGINT) AS score_sum
    FROM raw_rows LEFT JOIN w USING (b)
    GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(s.n_grams, 0) AS n_grams,
       COALESCE(s.score_sum, 0) AS score_sum,
       CASE WHEN COALESCE(s.n_grams, 0) > 0
            THEN CAST(s.score_sum AS DOUBLE) / CAST(s.n_grams AS DOUBLE)
            ELSE 0.0 END AS mean_score
FROM {table} d LEFT JOIN scored s USING (doc_id)
{suffix}"""


def dsir_importance_sql(
    table: str = "documents",
    target_pred: str = "doc_id % 97 = 0",
    n_buckets: int = 4096,
    col: str = "text",
) -> str:
    """DuckDB twin of ``dsir_importance`` for a target that is a
    predicate-selected subset of the corpus (the driver fixture — p4b's
    convention). Same gram hashing, same quantized ratio weights, same
    exact BIGINT sums."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    return _dsir_sql(table, target_pred, n_buckets, col, "")


def dsir_select_sql(
    table: str = "documents",
    target_pred: str = "doc_id % 97 = 0",
    k: int = 50,
    n_buckets: int = 4096,
    col: str = "text",
) -> str:
    """DuckDB twin of ``dsir_select`` (same tie-broken top-k order)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    return _dsir_sql(
        table,
        target_pred,
        n_buckets,
        col,
        f"ORDER BY mean_score DESC, d.doc_id LIMIT {int(k)}",
    )


# ---------------------------------------------------------------------------
# p12: epoch-capped mixture upsampling (round 9)
# ---------------------------------------------------------------------------

# Rate quantum: rates are fixed to integer MICRO-epochs in Python before
# either engine sees them, so the full-epoch count and the fractional
# threshold are BIGINT literals — no cross-engine float arithmetic at all.
_EPOCH_QUANT = 1_000_000


def epoch_mixture_upsample(
    docs: DataFrame,
    rates: dict[str, float],
    max_epochs: int = 4,
    strata_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "epochs-v1",
) -> DataFrame:
    """Epoch-capped mixture UPSAMPLING — the data-constrained complement
    to p10's downsampling (Muennighoff et al. 2023, "Scaling
    Data-Constrained Language Models", arXiv:2305.16264: repeating data
    up to ~4 epochs is nearly as good as fresh data, beyond that returns
    decay fast — so a mixture that wants MORE of a small source should
    replicate it a bounded number of epochs, never unboundedly). Each
    source's rate r (epochs of its own data) expands every document into
    ``floor(r)`` full copies plus membership in one fractional epoch with
    probability ``r - floor(r)``; rates clip at ``max_epochs``. Sources
    absent from ``rates`` are dropped (stratified_sample's drop-unlisted
    contract). Output = the input columns plus ``epoch`` (BIGINT,
    0-based) — (id, epoch) is the new key.

    Determinism: rates quantize to integer micro-epochs in PYTHON (both
    engines receive the same BIGINT literals); fractional membership is
    the p2/p3 md5-threshold rule on ``salt|epoch|id`` via exact BIGINT
    cross-multiplication — reproducible bit-for-bit on any cluster, and
    epochs of the same doc draw independently (the epoch is in the hash).

    Scale shape: one broadcast join (|rates| rows) + a per-row
    ``explode(sequence(0, full))`` + a map-side filter — the corpus never
    shuffles; output bytes are the only cost, exactly proportional to the
    requested epochs. This runs inside whole-stage codegen end-to-end."""
    if max_epochs < 1:
        raise ValueError(f"max_epochs must be >= 1, got {max_epochs}")
    if not rates:
        raise ValueError("rates must name at least one source")
    quantized = []
    for src, r in rates.items():
        if not r > 0:
            raise ValueError(f"rate for {src!r} must be > 0, got {r}")
        micros = min(int(r * _EPOCH_QUANT + 0.5), max_epochs * _EPOCH_QUANT)
        quantized.append((src, micros // _EPOCH_QUANT, micros % _EPOCH_QUANT))
    rates_df = F.broadcast(
        docs.sparkSession.createDataFrame(
            quantized, f"{strata_col} string, full long, frac_micros long"
        )
    )
    h = _hash_unit(
        F.concat_ws(
            "|",
            F.lit(salt),
            F.col("epoch").cast("string"),
            F.coalesce(F.col(id_col).cast("string"), F.lit(_NULL_ID_SENTINEL)),
        )
    )
    out_cols = docs.columns
    return (
        docs.join(rates_df, on=strata_col)
        .select(
            *out_cols,
            "full",
            "frac_micros",
            F.explode(F.sequence(F.lit(0).cast("long"), F.col("full"))).alias("epoch"),
        )
        .where(
            (F.col("epoch") < F.col("full"))
            | (h * F.lit(_EPOCH_QUANT) < F.col("frac_micros") * F.lit(_HASH_SPACE))
        )
        .select(*out_cols, F.col("epoch").cast("long").alias("epoch"))
    )


def epoch_mixture_upsample_sql(
    rates: dict[str, float],
    max_epochs: int = 4,
    table: str = "documents",
    strata_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "epochs-v1",
) -> str:
    """DuckDB twin of ``epoch_mixture_upsample`` (same Python-side rate
    quantization — identical BIGINT literals — same md5 membership)."""
    if max_epochs < 1:
        raise ValueError(f"max_epochs must be >= 1, got {max_epochs}")
    if not rates:
        raise ValueError("rates must name at least one source")
    vals = []
    for src, r in rates.items():
        if not r > 0:
            raise ValueError(f"rate for {src!r} must be > 0, got {r}")
        micros = min(int(r * _EPOCH_QUANT + 0.5), max_epochs * _EPOCH_QUANT)
        vals.append(
            f"('{src}', {micros // _EPOCH_QUANT}::BIGINT,"
            f" {micros % _EPOCH_QUANT}::BIGINT)"
        )
    h = (
        "('0x' || substr(md5('"
        + salt
        + "' || '|' || CAST(epoch AS VARCHAR) || '|' || "
        + f"COALESCE(CAST({id_col} AS VARCHAR), '{_NULL_ID_SENTINEL}')), 1, 8))::BIGINT"
    )
    return f"""
WITH rates({strata_col}, "full", frac_micros) AS (VALUES {", ".join(vals)}),
x AS (
    SELECT d.*, r."full", r.frac_micros
    FROM {table} d JOIN rates r USING ({strata_col})
),
e AS (
    SELECT x.*, unnest(range(0, "full" + 1)) AS epoch FROM x
)
SELECT * EXCLUDE ("full", frac_micros, epoch), CAST(epoch AS BIGINT) AS epoch
FROM e
WHERE epoch < "full"
   OR {h} * {_EPOCH_QUANT} < frac_micros * {_HASH_SPACE}
"""


# ---------------------------------------------------------------------------
# d10: domain cap + source mix stats (round 10)
# ---------------------------------------------------------------------------


def domain_cap(
    docs: DataFrame,
    cap: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    shards: int = 32,
) -> DataFrame:
    """Cap the number of documents kept per source/domain (d10) — the
    RefinedWeb/CCNet-style guard against boilerplate-heavy domains
    dominating a crawl-derived corpus: at most ``cap`` documents survive
    per ``source_col`` value, selected DETERMINISTICALLY (the cap-lowest
    ``(md5(id), id)`` ranks — a fixed pseudo-random sample per domain,
    the p2/p3 hash discipline, identical in the DuckDB twin).

    Scale posture: an exact per-domain rank is a window over the domain
    partition — precisely the hot-key funnel a mega-domain creates. This
    uses s5's TWO-PHASE cut: rank per (domain, shard) first and keep
    ranks <= cap, then rank the <= shards x cap survivors per domain —
    identical result to the flat window (every domain-global top-cap row
    is in its shard's top-cap) with every task bounded by the shard,
    never the domain. The twin uses the flat window (same row set).

    Returns the surviving rows, all columns."""
    from pyspark.sql.window import Window

    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    if shards < 1:
        raise ValueError(f"shards must be >= 1, got {shards}")
    okey = F.md5(F.col(id_col).cast("string"))
    w1 = Window.partitionBy(
        source_col, F.pmod(F.xxhash64(F.col(id_col)), F.lit(int(shards)))
    ).orderBy(okey.asc(), F.col(id_col).asc())
    w2 = Window.partitionBy(source_col).orderBy(okey.asc(), F.col(id_col).asc())
    return (
        docs.withColumn("__r1", F.row_number().over(w1))
        .where(F.col("__r1") <= cap)
        .withColumn("__r2", F.row_number().over(w2))
        .where(F.col("__r2") <= cap)
        .drop("__r1", "__r2")
    )


def domain_cap_sql(cap: int, table: str = "documents", source_col: str = "source") -> str:
    """DuckDB twin of ``domain_cap`` — flat per-domain window (the
    two-phase cut selects the identical row set)."""
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    return f"""
SELECT * EXCLUDE (__r) FROM (
    SELECT *, row_number() OVER (
        PARTITION BY {source_col}
        ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
    ) AS __r
    FROM {table}
) WHERE __r <= {int(cap)}
"""


def source_mix_stats(
    docs: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-source corpus composition stats (d10's companion — the table a
    mixture designer feeds into p10/p12 rate construction): document
    count, exact-duplicate rate (1 - distinct fingerprints / docs, the d1
    fingerprint), and mean normalized length. ONE map-side-combined
    aggregate over (source); output is |sources| rows.

    Returns (source, n_docs, n_unique, dup_rate, mean_chars), sorted by
    source for stable display."""
    from stock_chart_kafka_streams_spark.operators.text import fingerprint

    # mean as exact-BIGINT char sum / count — ONE double division of two
    # exact integers, bit-identical cross-engine (a float avg's summation
    # order drifts past the oracle's 9dp at corpus scale)
    return (
        docs.select(
            F.col(source_col).alias("source"),
            fingerprint(text_col).alias("__fp"),
            F.length(F.col(text_col)).cast("long").alias("__len"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("__fp").alias("n_unique"),
            (
                F.sum("__len").cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("mean_chars"),
        )
        .select(
            "source",
            "n_docs",
            "n_unique",
            (
                F.lit(1.0)
                - F.col("n_unique").cast("double") / F.col("n_docs").cast("double")
            ).alias("dup_rate"),
            "mean_chars",
        )
        .orderBy("source")
    )


def source_mix_stats_sql(table: str = "documents", source_col: str = "source") -> str:
    from stock_chart_kafka_streams_spark.operators.text import fingerprint_sql

    fp = fingerprint_sql("text")
    return f"""
SELECT source,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_unique AS BIGINT) AS n_unique,
       1.0 - CAST(n_unique AS DOUBLE) / CAST(n_docs AS DOUBLE) AS dup_rate,
       mean_chars
FROM (
    SELECT {source_col} AS source,
           count(*) AS n_docs,
           count(DISTINCT {fp}) AS n_unique,
           CAST(sum(CAST(length(text) AS BIGINT)) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) AS mean_chars
    FROM {table}
    GROUP BY {source_col}
)
ORDER BY source
"""
