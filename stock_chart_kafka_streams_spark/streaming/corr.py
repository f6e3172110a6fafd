"""Streaming correlation tier (round 12, r11 verdict #7): maintain the
w15 all-pairs rolling-correlation table INCREMENTALLY as candles stream
in, so the HTTP ``/api/charts/corr*`` routes read a materialized, current
overlay instead of recomputing window sums per request — the
cascade-upsert discipline applied to the engine's first cross-series
analytic.

Per micro-batch the recompute is bounded exactly like the gap fill
(``streaming.pipeline.affected_symbol_windows``): a changed close can
only live between the batch's stored-real anchors (the candle MERGE plus
any gap re-carry), and a rolling window of ``n`` buckets propagates a
changed close at bucket t into correlation rows at buckets [t, t+n-1] —
so the update span is the anchor window padded by (n-1) frame steps on
each side for input, discarding the leading pad from the output (those
rows' own windows reach before the pad and did not change). The MERGE
touches only the span's ``bucket_date`` partitions.

Row-window vs time-window: the w14/w15 window is (n-1) PRECEDING ROWS of
the pair's ALIGNED series, while the pad is measured in TIME — the two
coincide on a contiguous minute grid (the pipeline's ``fill_gaps=True``
materialization, or densely-traded symbols), and for sparse series the
update ADAPTIVELY WIDENS the pad (doubling) on BOTH sides until every
affected pair passes two sufficiency checks inside the slice:
backward — (n-1) aligned rows strictly before the pair's first
possibly-updated bucket, or the slice reaches the pair's history floor;
forward (round 13, r12 advice) — (n-1) aligned rows strictly after the
pair's last possibly-updated bucket, or the slice reaches the pair's
aligned ceiling (the EARLIER of the two legs' last stored buckets — no
aligned row can follow it). The forward check is what makes the bound
correct on sparse tables under mid-history backfill: a changed close at
aligned bucket t propagates into the next (n-1) ALIGNED pair rows,
which on a sparse series can lie arbitrarily far beyond t in TIME.
Exact in both regimes (pytest: the sparse-without-gap-fill tests,
including the sparse mid-history amend), with the widening loop costing
aligned-count probe aggregates only, never extra rewrites. Gap-filled
tables pass both checks on the first iteration.

Idempotency: the update derives from the STORED candle table, not from
batch contents, so a redelivered batch recomputes byte-identical rows and
the key-MERGE converges — the cascade sink's contract.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stock_chart_kafka_streams_spark.streaming.sink import (
    _bump_table_version,
    _publish_partitions,
    _table_exists,
    read_partition_dirs,
    recover_publish_crash,
)

CORR_KEY = ["sym_a", "sym_b", "bucket_start"]
CORR_PARTITION = ["bucket_date"]


def _with_corr_partition(df: DataFrame) -> DataFrame:
    return df.withColumn("bucket_date", F.to_date("bucket_start"))


def upsert_corr(spark: SparkSession, rows: DataFrame, path: str) -> None:
    """MERGE correlation rows into the materialized pair table on
    (sym_a, sym_b, bucket_start) — the candle sink's partition-scoped
    rewrite (new rows win, only touched ``bucket_date`` partitions are
    read or written), reused for the corr overlay's key shape."""
    # materialize once: the touched-partition collect, the key anti-join
    # and the union below each evaluate ``rows`` — without the pin a
    # window recompute (corr_batch_update's matrix) would re-run per
    # evaluation
    rows = _with_corr_partition(rows).localCheckpoint(eager=True)
    touched = rows.select(*CORR_PARTITION).distinct().collect()
    if not touched:
        # nothing to merge — and never bootstrap an EMPTY table (a
        # schemaless parquet dir breaks every later read)
        return
    if not _table_exists(spark, path):
        (
            rows.repartition(*CORR_PARTITION)
            .sortWithinPartitions(*CORR_KEY)
            .write.mode("overwrite")
            .partitionBy(*CORR_PARTITION)
            .parquet(path)
        )
        _bump_table_version(path)
        return
    # restore any partition a crashed publish orphaned BEFORE the merge
    # read below (sink.recover_publish_crash's ordering contract)
    recover_publish_crash(spark, path)
    dates = sorted({r["bucket_date"] for r in touched})
    data_cols = [c for c in rows.columns if c not in CORR_PARTITION]
    # dir-scoped read (round 13): listing AND scan are O(touched dates) —
    # a bare read of the table root walks every partition directory at
    # planning time, an O(table age) metadata cost per micro-batch
    existing = read_partition_dirs(
        spark, path, [f"bucket_date={d}" for d in dates]
    )
    if existing is None:
        merged = _with_corr_partition(rows.select(*data_cols))
    else:
        keep = existing.join(rows.select(*CORR_KEY), on=CORR_KEY, how="left_anti")
        merged = _with_corr_partition(
            keep.select(*data_cols).unionByName(rows.select(*data_cols))
        )
    # swap-publish (reader isolation, r12 verdict #3) with rows sorted by
    # (sym_a, sym_b, bucket_start) within each date file so parquet
    # min/max stats let a one-pair serving read skip row groups — the
    # overlay's point-read economics (compact_candles' key-sort
    # discipline)
    _publish_partitions(spark, merged, path, CORR_PARTITION, sort_cols=CORR_KEY)
    _bump_table_version(path)


def _symbol_extreme_buckets(
    spark: SparkSession,
    path: str,
    symbols: list[str],
    earliest: bool = True,
) -> dict:
    """Global first (``earliest=True``) or last stored MINUTE bucket per
    symbol — the corr tier's history floors / aligned ceilings. Bounded
    probe (r12 verdict #4: the old floors lookup full-scanned history per
    deficient symbol): partition directories are read from the matching
    end of the table's sorted ``bucket_date`` listing, DOUBLING the reach
    only while some requested symbol has no row yet. A prefix of sorted
    dates that contains any row of a symbol necessarily contains its
    global minimum (all earlier dates are in the prefix) — and the mirror
    holds for suffixes and maxima — so the probe is exact, costs reads
    proportional to the extreme's actual distance from the table edge,
    and reads nothing when ``symbols`` is empty. Includes gap rows by
    design: pair alignment is over stored rows regardless of ``is_gap``,
    matching the batch recompute's input. Symbols with no stored rows at
    all are absent from the result."""
    from stock_chart_kafka_streams_spark.streaming.pipeline import (
        minute_partition_dates,
    )

    symbols = list(symbols)
    if not symbols:
        return {}
    dates = minute_partition_dates(spark, path)
    if not dates:
        return {}
    out: dict = {}
    missing = set(symbols)
    k = 1
    while missing:
        sel = dates[:k] if earliest else dates[-k:]
        agg = F.min("bucket_start") if earliest else F.max("bucket_start")
        scoped = read_partition_dirs(
            spark,
            path,
            [f"time_frame=MINUTE/bucket_date={d}" for d in sel],
            assume_exists=True,  # sel is a slice of the listing
        )
        if scoped is None:
            break
        for r in (
            scoped.where(F.col("symbol").isin(sorted(missing)))
            .groupBy("symbol")
            .agg(agg.alias("__b"))
            .collect()
        ):
            out[r["symbol"]] = r["__b"]
            missing.discard(r["symbol"])
        if k >= len(dates):
            break
        k = min(len(dates), k * 2)
    return out


def corr_batch_update(
    spark: SparkSession,
    batch: DataFrame,
    candle_path: str,
    corr_path: str,
    n: int = 20,
    frame: str = "MINUTE",
    symbols: list[str] | None = None,
    win_rows=None,
) -> None:
    """Recompute and MERGE the correlation rows this batch can have
    changed (module docstring for the bound). Runs AFTER the batch's
    candle upsert (and gap fill, if enabled) — it reads the stored
    table, never the batch's own rows.

    ``symbols`` bounds the tracked pair universe (w15's S² knob applied
    to the maintained table): only pairs WITHIN the list are kept
    current — at 10k stored symbols the full matrix is ~50M pairs per
    bucket of storage, a policy decision the caller owns, not a default
    this tier should make.

    ``win_rows``: a precomputed ``affected_symbol_windows`` result for
    this batch (r13 verdict #2 — ``cascade_upsert_with_corr`` ran the
    identical anchor probe twice per micro-batch; the cascade body now
    passes its own probe through). Filtered to the tracked universe
    here, exactly as the batch itself would be."""
    from stock_chart_kafka_streams_spark.operators.windows_ext import (
        rolling_correlation_matrix,
    )
    from stock_chart_kafka_streams_spark.streaming.pipeline import (
        affected_symbol_windows,
    )

    if frame != "MINUTE":
        raise ValueError(
            "the streaming corr tier maintains the MINUTE overlay; coarse "
            "frames are cheap on-demand reads over it"
        )
    if symbols is not None:
        if win_rows is not None:
            keep = set(symbols)
            win_rows = [r for r in win_rows if r["symbol"] in keep]
            if not win_rows:
                return
        else:
            batch = batch.where(F.col("symbol").isin(list(symbols)))
            if batch.isEmpty():
                return
    if win_rows is None:
        win_rows = affected_symbol_windows(spark, batch, candle_path)
    if not win_rows:
        return
    out_lo = min(r["__wlo"] for r in win_rows)
    anchor_hi = max(r["__whi"] for r in win_rows)
    affected = [r["symbol"] for r in win_rows]

    from stock_chart_kafka_streams_spark.streaming.pipeline import (
        minute_partition_dates,
    )

    all_dates = minute_partition_dates(spark, candle_path)

    def _slice(in_lo, out_hi):
        # ALL tracked symbols with rows inside the rectangle participate:
        # a partner with no rows here has no aligned buckets here, hence
        # no corr rows to update — partners never need enumerating up
        # front. With a bounded universe, out-of-universe symbols never
        # even enter the pair join. Dir-scoped read: listing and scan
        # are both O(slice dates), the probe's discipline.
        sel = [d for d in all_dates if in_lo.date() <= d <= out_hi.date()]
        out = read_partition_dirs(
            spark,
            candle_path,
            [f"time_frame=MINUTE/bucket_date={d}" for d in sel],
            assume_exists=True,  # sel is clipped from the listing
        )
        if out is None:
            raise AssertionError(
                "corr_batch_update ran against a minute table with no "
                "partitions in the update window — the candle upsert "
                "must precede the corr update"
            )
        out = out.where(
            (F.col("bucket_start") >= F.lit(in_lo))
            & (F.col("bucket_start") <= F.lit(out_hi))
        )
        if symbols is not None:
            out = out.where(F.col("symbol").isin(list(symbols)))
        return out

    # Adaptive pad (round 12 backward; round 13 forward, r12 advice —
    # exactness without the contiguity caveat in EITHER direction): the
    # w15 window is (n-1) PRECEDING ALIGNED ROWS, so a fixed
    # (n-1)-minute pad under-covers sparse series both ways — backward,
    # the updated rows near out_lo would silently use shorter windows
    # than the batch recompute; forward, a mid-history amend at aligned
    # bucket t changes the pair rows at the NEXT (n-1) aligned buckets,
    # which in time can lie far past the anchor window. Verify per
    # affected-leg pair inside the slice:
    #   backward — (n-1) aligned buckets strictly before the pair's
    #   first possibly-updated bucket (__fu = first aligned >= out_lo;
    #   __fu also gates every merged OUTPUT row's window), or the slice
    #   reaches the pair's history floor (max of the legs' global first
    #   buckets — no aligned row precedes it);
    #   forward — (n-1) aligned buckets strictly after the pair's last
    #   possibly-updated bucket (__lu = last aligned <= anchor_hi;
    #   updates only land at aligned buckets in [out_lo, anchor_hi]), or
    #   the slice reaches the pair's aligned ceiling (MIN of the legs'
    #   global last buckets — no aligned row follows it);
    # and DOUBLE the deficient side's pad until every pair passes.
    # Gap-filled (contiguous) tables pass both on the first check; each
    # extra iteration is one slim aligned-count aggregate, never a
    # rewrite. Floors/ceilings are themselves bounded probes: partition
    # directories are read from the matching END of the table's date
    # range, doubling — never a full-history scan (r12 verdict #4).
    floors: dict[str, _dt.datetime] = {}
    ceils: dict[str, _dt.datetime] = {}
    back_pad = fwd_pad = n - 1
    while True:
        in_lo = out_lo - _dt.timedelta(minutes=back_pad)
        out_hi = anchor_hi + _dt.timedelta(minutes=fwd_pad)
        sl = _slice(in_lo, out_hi).select("symbol", "bucket_start")
        a = sl.select(
            F.col("symbol").alias("sym_a"), "bucket_start"
        )
        b = sl.select(F.col("symbol").alias("sym_b"), "bucket_start")
        aligned = (
            a.join(b, on="bucket_start")
            .where(F.col("sym_a") < F.col("sym_b"))
            .where(
                F.col("sym_a").isin(affected) | F.col("sym_b").isin(affected)
            )
        )
        fu = aligned.groupBy("sym_a", "sym_b").agg(
            F.min(
                F.when(
                    F.col("bucket_start") >= F.lit(out_lo), F.col("bucket_start")
                )
            ).alias("__fu"),
            F.max(
                F.when(
                    F.col("bucket_start") <= F.lit(anchor_hi),
                    F.col("bucket_start"),
                )
            ).alias("__lu"),
        )
        stats = (
            aligned.join(fu, on=["sym_a", "sym_b"])
            .where(F.col("__fu").isNotNull())
            .groupBy("sym_a", "sym_b")
            .agg(
                F.sum(
                    F.when(F.col("bucket_start") < F.col("__fu"), 1).otherwise(0)
                ).alias("__pre"),
                F.sum(
                    F.when(F.col("bucket_start") > F.col("__lu"), 1).otherwise(0)
                ).alias("__post"),
                F.first("__fu").alias("__fu"),
                F.first("__lu").alias("__lu"),
            )
            .where(
                (F.col("__pre") < F.lit(n - 1))
                | (
                    (F.col("__fu") <= F.lit(anchor_hi))
                    & (F.col("__post") < F.lit(n - 1))
                )
            )
            .collect()
        )
        back_bad = [r for r in stats if r["__pre"] < n - 1]
        fwd_bad = [
            r
            for r in stats
            if r["__fu"] <= anchor_hi and r["__post"] < n - 1
        ]
        if not back_bad and not fwd_bad:
            break
        need_floor = {s for r in back_bad for s in (r["sym_a"], r["sym_b"])}
        floors.update(
            _symbol_extreme_buckets(
                spark,
                candle_path,
                [s for s in need_floor if s not in floors],
                earliest=True,
            )
        )
        need_ceil = {s for r in fwd_bad for s in (r["sym_a"], r["sym_b"])}
        ceils.update(
            _symbol_extreme_buckets(
                spark,
                candle_path,
                [s for s in need_ceil if s not in ceils],
                earliest=False,
            )
        )
        widen_back = any(
            max(floors[r["sym_a"]], floors[r["sym_b"]]) < in_lo for r in back_bad
        )
        widen_fwd = any(
            min(ceils[r["sym_a"]], ceils[r["sym_b"]]) > out_hi for r in fwd_bad
        )
        if not widen_back and not widen_fwd:
            break  # deficient pairs already see their full aligned history
        if widen_back:
            back_pad *= 2
        if widen_fwd:
            fwd_pad *= 2

    # only pairs with an AFFECTED leg can have changed rows: every stored
    # pair row was written by the batch that delivered its later leg, so
    # restricting to affected-leg pairs is lossless — and it keeps the
    # per-batch window work O(affected × S), not O(S²), at wide universes
    updates = rolling_correlation_matrix(
        _slice(in_lo, out_hi), n=n, frame="MINUTE", pairs_with=affected
    ).where(F.col("bucket_start") >= F.lit(out_lo))
    upsert_corr(spark, updates, corr_path)


def cascade_upsert_with_corr(
    path: str,
    corr_path: str,
    frames: list[str] | None = None,
    fill_gaps: bool = True,
    corr_n: int = 20,
    corr_symbols: list[str] | None = None,
):
    """``foreachBatch`` hook: the full cascade sink (minute MERGE, gap
    fill, coarse rollups) followed by the incremental correlation-tier
    update — one hook wiring the whole serving surface per micro-batch.
    ``fill_gaps`` defaults True here: the corr tier's row-window ==
    time-window equivalence rides on the contiguous minute grid (module
    docstring). One anchor probe per batch (r13 verdict #2): the cascade
    body's probe result feeds the corr update — previously both ran the
    identical probe (two Spark job-pairs plus two partition-date
    listings per trigger for the same answer)."""
    from stock_chart_kafka_streams_spark.functions.timeframes import (
        FRAME_ORDER,
    )
    from stock_chart_kafka_streams_spark.streaming.pipeline import (
        _cascade_batch,
    )

    coarse = [
        f for f in FRAME_ORDER if f != "MINUTE" and f in (frames or FRAME_ORDER)
    ]

    def _write(batch: DataFrame, batch_id: int) -> None:
        # _cascade_batch evaluates the stateful micro-batch plan exactly
        # once (its checkpoint) and hands the pinned batch back — the
        # corr update's own probes/filters then run over the checkpoint
        # instead of re-running the whole plan (round 16)
        win, pinned = _cascade_batch(batch, path, coarse, fill_gaps)
        if pinned is None:
            return  # empty micro-batch
        corr_batch_update(
            pinned.sparkSession, pinned, path, corr_path,
            n=corr_n, symbols=corr_symbols, win_rows=win,
        )

    return _write


def expire_corr(spark: SparkSession, path: str, before) -> list[str]:
    """Retention for the materialized pair table: DROP whole
    ``bucket_date`` partition directories strictly before ``before`` —
    the candle store's ``expire_candles`` discipline (directory deletes
    only; kept partitions' files are never opened). Returns the dropped
    dates (empty = idempotent no-op). The usual policy pairs this with
    the candle table's own expiry: correlations over expired candles
    can no longer be recomputed, so they expire together."""
    import datetime as _dt

    from stock_chart_kafka_streams_spark.streaming.sink import (
        _bump_table_version as _bump,
    )

    cutoff = (
        before
        if isinstance(before, _dt.date) and not isinstance(before, _dt.datetime)
        else _dt.date.fromisoformat(str(before)[:10])
    )
    jvm = spark._jvm  # type: ignore[attr-defined]
    jsc = spark._jsc  # type: ignore[attr-defined]
    root = jvm.org.apache.hadoop.fs.Path(path)
    fs = root.getFileSystem(jsc.hadoopConfiguration())
    if not fs.exists(root):
        return []
    dropped: list[str] = []
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if not name.startswith("bucket_date="):
            continue
        try:
            bd = _dt.date.fromisoformat(name.split("=", 1)[1])
        except ValueError:
            continue  # never delete what we can't parse
        if bd < cutoff:
            fs.delete(st.getPath(), True)
            dropped.append(bd.isoformat())
    if dropped:
        _bump(path)
    return sorted(dropped)
