"""Continuous ANN-index ingestion (round 11): the d9 operational loop
(streaming/dedup.py::foreach_batch_corpus_ingest) applied to the persisted
serving index (operators/similarity.py::build_pq_index).

A production embedding pipeline never rebuilds its ANN index per corpus
snapshot — new vectors arrive continuously and the index must grow in
place. ``foreach_batch_index_ingest`` is the ``foreachBatch`` hook: each
micro-batch of (id, embedding) rows is appended to the index via
``extend_pq_index`` (encode with the STORED codebooks, list-assign with
the STORED coarse centroids — zero retrain per batch), and optionally to
a raw-vector corpus table so the exact-rerank fetch-back side grows in
lockstep.

Idempotent under foreachBatch's at-least-once redelivery without batch-id
bookkeeping: ``extend_pq_index`` anti-joins incoming ids against the code
table, so a replayed batch's vectors are by then IN the index and append
nothing; the corpus append runs its OWN anti-join against the corpus
table, so it is idempotent independently. Replay-equals-one-shot is
pytest-asserted (tests/test_pq_index.py), the compaction sink's
convergence discipline.

Ordering: the CODE rows append first, the raw-vector corpus second — a
crash between the two leaves ids that are in the index but not in the
corpus table; the exact rerank simply cannot return them (inner join on
id), and the next redelivery of the batch repairs the corpus append while
the index append no-ops. The reverse order would leave vectors invisible
to the candidate scan with nothing left to repair them. Because that
repair path arrives as a batch whose index append is a FULL no-op, the
corpus append must never be gated on the index appending anything (r11
advice): the two appends are guarded by their own anti-joins, each
against its own table, and both always run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def foreach_batch_index_ingest(
    index_path: str | None = None,
    corpus_path: str | None = None,
    index_root: str | None = None,
):
    """``foreachBatch`` hook: extend the persisted ANN index with each
    micro-batch of new embedding rows; when ``corpus_path`` is given,
    also append the batch's corpus-new raw rows there so rerank
    fetch-back serves them.

    Address the index one of two ways: ``index_path`` pins a single
    artifact directory; ``index_root`` names a blue/green versioned root
    (``refresh_pq_index``) and the hook re-resolves the CURRENT pointer
    EVERY batch — after a refresh flips the pointer mid-stream, the very
    next micro-batch extends the new version with zero coordination.
    Vectors ingested into the OLD version during the rebuild window are
    picked up by the refresh's ``reconcile_path`` pass (they are in the
    corpus table; the pre-flip reconcile anti-join appends them to the
    new version) — the pair of mechanisms that closes the
    refresh-under-ingest loss window.

    The corpus append bootstraps the table on the first batch (no
    read-before-create — the candle sink's ``_table_exists`` guard) and
    prunes its duplicate probe to the batch's own id range, the same
    footer-stat bound ``extend_pq_index`` uses for the code table."""
    from stock_chart_kafka_streams_spark.operators.similarity import (
        _batch_id_bounds,
        current_index_path,
        extend_pq_index,
        read_pq_index,
    )
    from stock_chart_kafka_streams_spark.streaming.sink import _table_exists

    if (index_path is None) == (index_root is None):
        raise ValueError("pass exactly one of index_path or index_root")

    def _write(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        target = (
            index_path if index_path is not None else current_index_path(index_root)
        )
        spark = batch.sparkSession
        # pin the batch: extend() runs an anti-join + count + encode over
        # it, and the corpus append below must see the identical rows
        batch = batch.localCheckpoint(eager=True)
        extend_pq_index(batch, target)
        if corpus_path is not None:
            # ALWAYS run the corpus append, even when the index appended
            # nothing: a crash between the index append and this one makes
            # the redelivered batch a full index no-op whose only remaining
            # job is exactly this repair (r11 advice — gating on n_new would
            # strand those ids index-only forever).
            meta, _, _ = read_pq_index(spark, target)
            id_col = meta["id_col"]
            if not _table_exists(spark, corpus_path):
                batch.write.mode("append").parquet(corpus_path)
            else:
                lo, hi = _batch_id_bounds(batch, id_col)
                existing = (
                    spark.read.parquet(corpus_path)
                    .select(id_col)
                    .where(F.col(id_col).between(lo, hi))
                )
                fresh = batch.join(existing, on=id_col, how="left_anti")
                # localCheckpoint so the append never races the scan above
                fresh = fresh.localCheckpoint(eager=True)
                if not fresh.isEmpty():
                    fresh.write.mode("append").parquet(corpus_path)
        if index_root is not None:
            # Pointer re-check (round 13, r12 verdict #2): if a blue/green
            # refresh flipped CURRENT while this batch was extending the
            # version it resolved at entry, re-extend the NEW version too.
            # Together with refresh_pq_index's post-flip reconcile pass
            # this closes the refresh-under-ingest window in every
            # interleaving: either this batch's corpus append landed
            # before the post-flip scan (the refresh delivers it), or it
            # landed after — in which case the flip preceded the append,
            # so this re-check observes the new pointer and delivers the
            # batch itself. extend's anti-join keeps the double path
            # idempotent.
            now = current_index_path(index_root)
            if now != target:
                extend_pq_index(batch, now)

    return _write
