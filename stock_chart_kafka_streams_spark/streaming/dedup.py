"""Streaming deduplication (SURVEY.md §2.9 scale path).

Exact-duplicate suppression on an unbounded stream with bounded state:
``dropDuplicatesWithinWatermark`` keeps one row per key and evicts state
once the watermark passes the key's event time + delay — the streaming
twin of ``operators/dedup.dedup_exact``. Use a content hash as the key so
state stores 32 hex chars per live key instead of full payloads.

At 100 TB-scale ingest the state is bounded by (unique keys per watermark
window), not stream length — the delay knob trades late-duplicate recall
for state size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream_exact(
    stream: DataFrame,
    key_cols: list[str] | None = None,
    ts_col: str = "ts",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Drop duplicate records (same key columns) arriving within the
    watermark delay of each other. Defaults to full-row content identity
    via an md5 over all non-timestamp columns."""
    if key_cols is None:
        key_cols_expr = [c for c in stream.columns if c != ts_col]
        keyed = stream.withColumn(
            "__key", F.md5(F.concat_ws("\x1f", *key_cols_expr))
        )
        out = keyed.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(
            ["__key"]
        )
        return out.drop("__key")
    return stream.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(
        key_cols
    )


def foreach_batch_corpus_ingest(
    corpus_path: str,
    mode: str = "exact",
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    band_cap: int | None = None,
    buckets_path: str | None = None,
):
    """``foreachBatch`` hook for CONTINUOUS corpus ingestion — the
    operational loop d9 exists for (round 10, r9 verdict #6): every
    micro-batch of documents is (1) deduplicated within itself (d1/d2 —
    d9's contract is strictly incoming-vs-existing), (2) deduplicated
    against the accumulated corpus at ``corpus_path`` via
    ``incremental_dedup`` (exact fingerprint anti-join, or MinHash-LSH
    band candidates + Jaccard verify; ``band_cap`` passes through —
    opt-in, see that docstring's measured broadcast-join analysis), and
    (3) APPENDED — never rewritten — to the corpus table.

    Idempotent under foreachBatch's at-least-once redelivery WITHOUT any
    batch-id bookkeeping: a replayed batch's documents are by then IN the
    corpus, so the exact mode drops them on their own fingerprints and
    the minhash mode drops them as Jaccard-1.0 self-candidates (every
    band collides with the persisted copy). Replay convergence is
    pytest-asserted, the compaction sink's discipline.

    Survivors are localCheckpoint-materialized BEFORE the append so the
    corpus scan feeding the anti-join never races its own output files.

    At 100 TB the minhash mode's corpus cost is RE-SHINGLING history
    every batch. ``buckets_path`` (minhash mode only) removes it: the
    (id, band_idx, band_val) artifact lives beside the corpus, each
    batch's candidate join reads the STORED buckets
    (``existing_buckets=``) instead of re-deriving them, and the
    survivors' own buckets are appended after the corpus write — so no
    document is ever shingled more than twice (once as a candidate
    verification, once for its stored buckets), regardless of how many
    snapshots follow. The exact mode's distinct-fingerprint table is the
    cheaper analogue. Candidate VERIFICATION still reads corpus text,
    but only for candidate ids (semi-join — d9's contract).
    The bucket append is ordered AFTER the corpus append: a crash
    between the two leaves missing buckets for the tail batch, which the
    next run would simply not use for candidates — to stay fail-safe the
    hook rebuilds buckets for any corpus ids absent from the artifact.
    The repair runs ON THE FIRST BATCH OF THE QUERY ONLY (closure flag):
    within a running query the hook's own appends are ordered, so a gap
    can only predate the query — checking every batch would anti-join
    the full artifact against all corpus ids per micro-batch, a
    corpus-proportional steady-state tax (r10 review #4)."""
    if mode not in ("exact", "minhash"):
        raise ValueError(f"mode must be 'exact' or 'minhash', got {mode!r}")
    if buckets_path is not None and mode != "minhash":
        raise ValueError("buckets_path applies only to mode='minhash'")

    from stock_chart_kafka_streams_spark.operators.dedup import (
        band_buckets,
        dedup_exact,
        dedup_minhash,
        incremental_dedup,
    )

    repaired = [False]  # once per query (see docstring)

    def _write(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        spark = batch.sparkSession
        within = (
            dedup_exact(batch, id_col=id_col, text_col=text_col)
            if mode == "exact"
            else dedup_minhash(batch, id_col=id_col, text_col=text_col)
        )
        # explicit existence probe (the MERGE sink's _table_exists
        # discipline) — a bare try/except around the read would also
        # swallow a CORRUPT corpus and silently ingest duplicates
        from stock_chart_kafka_streams_spark.streaming.sink import _table_exists

        stored_buckets = None
        if _table_exists(spark, corpus_path):
            # materialize the within-batch survivors ONCE (round 15):
            # incremental_dedup references its incoming THREE times (band
            # buckets, candidate-shingle semi-join, final anti-join), and
            # in the curation hook that lineage is the whole gate +
            # decontam + within-batch-dedup pipeline — re-executed per
            # reference without this pin (measured with the hook's gated
            # pin: per-batch wall ~31-35 s -> ~17-21 s at the tier-2
            # 100k-doc batch shape, identical corpus). The no-corpus
            # bootstrap path checkpoints `fresh` below anyway.
            within = within.localCheckpoint(eager=True)
            existing = spark.read.parquet(corpus_path)
            if buckets_path is not None and _table_exists(spark, buckets_path):
                stored_buckets = spark.read.parquet(buckets_path)
                if not repaired[0]:
                    # crash-recovery: ids appended to the corpus whose
                    # bucket append never landed get their buckets
                    # rebuilt (ids-only anti-join; empty when whole)
                    missing = existing.join(
                        stored_buckets.select(id_col).distinct(),
                        on=id_col,
                        how="left_anti",
                    )
                    repair = band_buckets(
                        missing, id_col, text_col
                    ).localCheckpoint(eager=True)
                    if not repair.isEmpty():
                        repair.write.mode("append").parquet(buckets_path)
                        stored_buckets = spark.read.parquet(buckets_path)
                    repaired[0] = True
            fresh = incremental_dedup(
                existing,
                within,
                mode=mode,
                threshold=threshold,
                id_col=id_col,
                text_col=text_col,
                band_cap=band_cap,
                existing_buckets=stored_buckets if mode == "minhash" else None,
            )
        else:
            fresh = within
        fresh = fresh.localCheckpoint(eager=True)
        fresh.write.mode("append").parquet(corpus_path)
        if buckets_path is not None:
            band_buckets(fresh, id_col, text_col).write.mode("append").parquet(
                buckets_path
            )

    return _write


def foreach_batch_curation_ingest(
    corpus_path: str,
    bench_path: str | None = None,
    mode: str = "minhash",
    threshold: float = 0.5,
    quality_mode: str = "gopher",
    keep_num: int = 1,
    keep_den: int = 2,
    gopher_min_words: int = 50,
    gopher_required_min: int = 2,
    decontam_mode: str = "ngram",
    decontam_threshold: float | None = None,
    ngram_n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    strata_col: str = "lang",
    band_cap: int | None = None,
    buckets_path: str | None = None,
):
    """Continuous CURATION ingestion (round 12) — the streaming
    composition of the batch p9 pipeline's gate stages with the d9
    operational loop: every micro-batch of raw documents is

    1. QUALITY-gated (``quality_stage`` — ``"gopher"`` default: the
       published rule set is a pure map-side boolean, the natural
       streaming form; ``"approx"``/``"exact"`` elect per-batch
       thresholds, deterministic per batch content so replay still
       converges, but their cut drifts with batch composition — a
       policy the caller opts into),
    2. DECONTAMINATED against a static held-out benchmark table at
       ``bench_path`` (broadcast gram/fingerprint set; ``"ngram"`` =
       p4b's 13-gram collision rule, ``"winnow"`` = p4's fuzzy overlap
       with ``decontam_threshold``). Contaminated rows drop BEFORE
       dedup, so a contaminated document can never become the stored
       canonical that suppresses a clean near-duplicate,
    3. DEDUPLICATED within the batch and against the accumulated curated
       corpus, and APPENDED — ``foreach_batch_corpus_ingest``'s loop
       verbatim, including the band-bucket artifact and its
       crash-repair discipline.

    Idempotency: stages 1-2 are deterministic row predicates against
    static state (the rule set / the benchmark table), and stage 3 is
    the redelivery-idempotent d9 loop — so a replayed batch converges to
    the same curated corpus (pytest: replay equals the batch-operator
    fold of the same snapshots)."""
    if decontam_mode not in ("ngram", "winnow"):
        raise ValueError(
            f"decontam_mode must be 'ngram' or 'winnow', got {decontam_mode!r}"
        )
    from stock_chart_kafka_streams_spark.operators.pipeline import quality_stage

    inner = foreach_batch_corpus_ingest(
        corpus_path,
        mode=mode,
        threshold=threshold,
        id_col=id_col,
        text_col=text_col,
        band_cap=band_cap,
        buckets_path=buckets_path,
    )

    def _write(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        spark = batch.sparkSession
        gated = quality_stage(
            batch,
            quality_mode=quality_mode,
            keep_num=keep_num,
            keep_den=keep_den,
            id_col=id_col,
            text_col=text_col,
            strata_col=strata_col,
            gopher_min_words=gopher_min_words,
            gopher_required_min=gopher_required_min,
        )
        if bench_path is not None:
            from stock_chart_kafka_streams_spark.operators.text import (
                DECONTAM_THRESHOLD,
                decontaminate,
                ngram_collision_decontaminate,
            )

            bench = spark.read.parquet(bench_path)
            if decontam_mode == "ngram":
                flags = ngram_collision_decontaminate(
                    gated, bench, n=ngram_n, id_col=id_col, text_col=text_col
                )
            else:
                flags = decontaminate(
                    gated,
                    bench,
                    threshold=(
                        DECONTAM_THRESHOLD
                        if decontam_threshold is None
                        else decontam_threshold
                    ),
                    id_col=id_col,
                    text_col=text_col,
                )
            # LEFT join: a doc too short to produce fingerprints/grams is
            # absent from the flag table and must pass, not vanish
            gated = (
                gated.join(
                    flags.select(id_col, "contaminated"), on=id_col, how="left"
                )
                .where(~F.coalesce(F.col("contaminated"), F.lit(False)))
                .drop("contaminated")
                # pin the gate+decontam output ONCE (round 15): the
                # within-batch dedup references its input three times
                # (band buckets, candidate-shingle semi-join, final
                # anti-join), and without the pin each reference re-runs
                # the gopher gate AND the decontam gram scan (measured
                # with the `within` pin below it: see OPTIMIZATION_r15).
                .localCheckpoint(eager=True)
            )
        inner(gated, batch_id)

    return _write
