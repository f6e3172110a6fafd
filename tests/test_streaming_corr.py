"""Streaming correlation tier (round 12, r11 verdict #7): the w15 pair
table maintained incrementally per micro-batch must equal the one-shot
batch recompute over the final stored candles (replay-equals-batch), stay
byte-stable under redelivery, touch only the batch's affected bucket_date
partitions (the mtime-pin discipline), and serve over HTTP from the live
materialized table."""

import datetime as dt
import glob
import json
import os
import urllib.request

import pytest
from pyspark.sql import functions as F

from stock_chart_kafka_streams_spark import CandleStore
from stock_chart_kafka_streams_spark.operators.windows_ext import (
    rolling_correlation_matrix,
)
from stock_chart_kafka_streams_spark.streaming.corr import (
    cascade_upsert_with_corr,
)
from tests.test_streaming import _mk_candle_batch

N = 3  # small window keeps the affected spans tight and assertions sharp


def _mk_batch(spark, start, minutes, closes):
    """closes: {symbol: base} -> dense per-minute candles for each symbol
    over [start, start + minutes)."""
    rows = []
    for sym, base in closes.items():
        for m in range(minutes):
            rows.append(
                (sym, start + dt.timedelta(minutes=m), base + 0.5 * m, 2)
            )
    return _mk_candle_batch(spark, rows)


def _corr_rows(df, n=N):
    return sorted(
        (
            r["sym_a"], r["sym_b"], r["bucket_start"],
            r["close_a"], r["close_b"], r[f"corr_{n}"],
        )
        for r in df.collect()
    )


@pytest.fixture()
def built(spark, tmp_path):
    path = str(tmp_path / "candles")
    corr = str(tmp_path / "corr")
    hook = cascade_upsert_with_corr(
        path, corr, frames=["MINUTE"], corr_n=N
    )
    d1 = dt.datetime(2024, 4, 1, 23, 50)
    d2 = dt.datetime(2024, 4, 2, 0, 0)
    batches = [
        _mk_batch(spark, d1, 10, {"A": 100.0, "B": 50.0, "C": 75.0}),
        _mk_batch(spark, d2, 10, {"A": 101.0, "B": 49.0, "C": 80.0}),
        _mk_batch(spark, d2 + dt.timedelta(minutes=10), 10,
                  {"A": 99.0, "B": 52.0, "C": 70.0}),
    ]
    return path, corr, hook, batches


def test_incremental_corr_equals_batch_recompute(spark, built):
    path, corr, hook, batches = built
    for i, b in enumerate(batches[:2]):
        hook(b, i)

    # bounded work: batch 2's span stays inside day 2 — day 1's corr
    # partition files must not be rewritten (r7 mtime discipline)
    day1 = {
        f: os.path.getmtime(f)
        for f in glob.glob(f"{corr}/bucket_date=2024-04-01/*.parquet")
    }
    assert day1
    hook(batches[2], 2)
    for f, mt in day1.items():
        assert os.path.exists(f) and os.path.getmtime(f) == mt, f

    stored = spark.read.parquet(path)
    want = rolling_correlation_matrix(
        stored.where(F.col("time_frame") == "MINUTE"), n=N
    )
    got = spark.read.parquet(corr)
    assert _corr_rows(got) == _corr_rows(want)

    # redelivery: replaying an old batch leaves both tables byte-stable
    before = _corr_rows(spark.read.parquet(corr))
    hook(batches[1], 99)
    assert _corr_rows(spark.read.parquet(corr)) == before
    assert _corr_rows(spark.read.parquet(corr)) == _corr_rows(want)

    # a batch touching ONE symbol updates only its pairs (the affected-
    # leg bound) — and the table still equals the full recompute, i.e.
    # the untouched B/C pair rows were already right and stayed put
    solo = _mk_batch(
        spark,
        dt.datetime(2024, 4, 2, 0, 20), 5, {"A": 98.0},
    )
    hook(solo, 3)
    stored2 = spark.read.parquet(path)
    want2 = rolling_correlation_matrix(
        stored2.where(F.col("time_frame") == "MINUTE"), n=N
    )
    assert _corr_rows(spark.read.parquet(corr)) == _corr_rows(want2)


def test_corr_tier_covers_gap_refill_and_backfill(spark, tmp_path):
    """A backfilled candle re-carries following gap closes; the corr
    tier's anchor window must propagate that into the pair rows (the
    hardest update path: closes changed OUTSIDE the batch's own
    buckets)."""
    path = str(tmp_path / "candles_bf")
    corr = str(tmp_path / "corr_bf")
    hook = cascade_upsert_with_corr(path, corr, frames=["MINUTE"], corr_n=N)
    t0 = dt.datetime(2024, 4, 5, 9, 0)

    # A trades every minute 0..10; B trades at 0 and 10 (gap-filled in
    # between), then B backfills minute 5 — gaps 6..9 re-carry
    hook(_mk_batch(spark, t0, 11, {"A": 100.0}), 0)
    hook(_mk_candle_batch(spark, [("B", t0, 50.0, 1)]), 1)
    hook(_mk_candle_batch(
        spark, [("B", t0 + dt.timedelta(minutes=10), 60.0, 1)]
    ), 2)
    hook(_mk_candle_batch(
        spark, [("B", t0 + dt.timedelta(minutes=5), 55.0, 1)]
    ), 3)

    stored = spark.read.parquet(path)
    want = rolling_correlation_matrix(
        stored.where(F.col("time_frame") == "MINUTE"), n=N
    )
    assert _corr_rows(spark.read.parquet(corr)) == _corr_rows(want)


def test_http_serves_materialized_corr_overlay(spark, built):
    path, corr, hook, batches = built
    for i, b in enumerate(batches):
        hook(b, i)

    from stock_chart_kafka_streams_spark.plans.http_api import (
        serve_in_background,
    )

    store = CandleStore.from_path(spark, path)
    store.attach_corr_table(corr, n=N)
    server, url = serve_in_background(store)
    try:
        with urllib.request.urlopen(
            f"{url}/api/charts/corr/A/B?n={N}&materialized=true", timeout=120
        ) as resp:
            got = json.loads(resp.read())
        assert resp.status == 200
        stored = spark.read.parquet(corr).where(
            (F.col("sym_a") == "A") & (F.col("sym_b") == "B")
        )
        want = {
            (r["bucket_start"], round(r[f"corr_{N}"], 9))
            for r in stored.collect()
            if r[f"corr_{N}"] is not None
        }
        got_set = {
            (dt.datetime.fromisoformat(r["bucketStart"].replace("Z", "+00:00"))
             .astimezone().replace(tzinfo=None), round(r["corr"], 9))
            for r in got
            if r["corr"] is not None
        }
        assert got_set == want and len(got) == stored.count()
        # pair label follows the CALLER's order; closes swap with it
        with urllib.request.urlopen(
            f"{url}/api/charts/corr/B/A?n={N}&materialized=true", timeout=120
        ) as resp:
            rev = json.loads(resp.read())
        assert {r["pair"] for r in rev} == {"B/A"}
        fwd_by_t = {r["bucketStart"]: r for r in got}
        for r in rev:
            f = fwd_by_t[r["bucketStart"]]
            assert r["closeA"] == f["closeB"] and r["closeB"] == f["closeA"]
            assert r["corr"] == f["corr"]

        # corrmatrix from the overlay
        with urllib.request.urlopen(
            f"{url}/api/charts/corrmatrix?n={N}&materialized=true", timeout=120
        ) as resp:
            mat = json.loads(resp.read())
        assert len(mat) == spark.read.parquet(corr).count()

        # overlay mismatch (different n) with materialized=true -> 400
        try:
            urllib.request.urlopen(
                f"{url}/api/charts/corr/A/B?n=7&materialized=true", timeout=120
            )
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as exc:
            assert exc.code == 400
        # strict parse
        try:
            urllib.request.urlopen(
                f"{url}/api/charts/corr/A/B?n={N}&materialized=yes", timeout=120
            )
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as exc:
            assert exc.code == 400
    finally:
        server.shutdown()


def test_materialized_corr_read_pushes_pair_filters(spark, built):
    """The overlay serve is a pruned READ: the pair equality predicates
    must reach the parquet scan (PushedFilters), where the upsert's
    within-file (sym_a, sym_b, bucket_start) sort lets row-group min/max
    stats skip other pairs — the point-read economics the tier exists
    for."""
    path, corr, hook, batches = built
    for i, b in enumerate(batches):
        hook(b, i)
    store = CandleStore.from_path(spark, path)
    store.attach_corr_table(corr, n=N)
    df = store.correlation("A", "B", n=N)
    plan = df._jdf.queryExecution().executedPlan().toString()
    pushed = plan.split("PushedFilters")[1][:300]
    assert "EqualTo(sym_a,A)" in pushed, pushed
    assert "EqualTo(sym_b,B)" in pushed, pushed


def test_materialized_corr_range_prunes_date_partitions(spark, built):
    """A ranged overlay read must prune bucket_date directories exactly
    like every other serving-table range read (the get_candles
    discipline): asking for day 2 only may list only day 2."""
    from tests.test_serving_table import _scan_stats

    path, corr, hook, batches = built
    for i, b in enumerate(batches):
        hook(b, i)
    store = CandleStore.from_path(spark, path)
    store.attach_corr_table(corr, n=N)
    on_disk, _, _ = _scan_stats(spark.read.parquet(corr))
    assert on_disk >= 2  # day 1 and day 2 exist
    ranged = store.correlation_matrix(
        n=N, start="2024-04-02T00:00:00", end="2024-04-02T23:59:00",
        materialized=True,
    )
    n_parts, _, md = _scan_stats(ranged)
    assert n_parts == 1, (n_parts, md)
    assert "bucket_date" in md["PartitionFilters"]


def test_expire_corr_drops_old_partitions_without_touching_kept(spark, built):
    from stock_chart_kafka_streams_spark.streaming.corr import expire_corr

    path, corr, hook, batches = built
    for i, b in enumerate(batches):
        hook(b, i)
    kept = {
        f: os.path.getmtime(f)
        for f in glob.glob(f"{corr}/bucket_date=2024-04-02/*.parquet")
    }
    assert kept
    assert expire_corr(spark, corr, "2024-04-02") == ["2024-04-01"]
    assert not os.path.exists(f"{corr}/bucket_date=2024-04-01")
    for f, mt in kept.items():
        assert os.path.exists(f) and os.path.getmtime(f) == mt
    # idempotent + missing table
    assert expire_corr(spark, corr, "2024-04-02") == []
    assert expire_corr(spark, str(corr) + ".nope", "2024-04-02") == []
    # the day-2 rows still serve
    assert (
        spark.read.parquet(corr)
        .where("bucket_date = '2024-04-02'")
        .count()
        > 0
    )


def test_corr_tier_exact_on_sparse_series_without_gap_fill(spark, tmp_path):
    """Adaptive pad (round 12): the w15 window is (n-1) preceding ALIGNED
    ROWS, so on a sparse, NON-gap-filled table a fixed (n-1)-minute pad
    under-covers it — the first updated rows after a long quiet stretch
    would silently use shorter windows than the batch recompute. The
    update must widen its read until every affected pair's window
    history is inside the slice."""
    from stock_chart_kafka_streams_spark.streaming.corr import (
        cascade_upsert_with_corr,
    )

    path = str(tmp_path / "candles_sparse")
    corr = str(tmp_path / "corr_sparse")
    hook = cascade_upsert_with_corr(
        path, corr, frames=["MINUTE"], fill_gaps=False, corr_n=N
    )
    t0 = dt.datetime(2024, 4, 8, 9, 0)

    # aligned rows at minutes 0,1,2 — then two hours of silence — then
    # new aligned rows at 120,121 whose windows reach back to minute 1
    hook(_mk_batch(spark, t0, 3, {"A": 100.0, "B": 50.0}), 0)
    hook(_mk_batch(
        spark, t0 + dt.timedelta(minutes=120), 2, {"A": 101.0, "B": 51.0}
    ), 1)

    stored = spark.read.parquet(path)
    want = rolling_correlation_matrix(
        stored.where(F.col("time_frame") == "MINUTE"), n=N
    )
    assert _corr_rows(spark.read.parquet(corr)) == _corr_rows(want)
    # the late rows really do carry full n-row windows (non-null corr
    # needs n>=2 aligned rows and both legs varying — minute 120's
    # window spans rows {1, 2, 120}, all present)
    late = [
        r for r in spark.read.parquet(corr).collect()
        if r["bucket_start"] >= t0 + dt.timedelta(minutes=120)
    ]
    assert len(late) == 2
    assert all(r[f"corr_{N}"] is not None for r in late)


def test_corr_tier_bounded_universe(spark, tmp_path):
    """corr_symbols bounds the maintained pair universe (the w15 S² knob
    applied to storage): pairs outside the list are never computed or
    stored, and the tracked pairs still equal the bounded batch
    recompute."""
    from stock_chart_kafka_streams_spark.streaming.corr import (
        cascade_upsert_with_corr,
    )

    path = str(tmp_path / "candles_u")
    corr = str(tmp_path / "corr_u")
    hook = cascade_upsert_with_corr(
        path, corr, frames=["MINUTE"], corr_n=N, corr_symbols=["A", "B"]
    )
    t0 = dt.datetime(2024, 4, 9, 9, 0)
    hook(_mk_batch(spark, t0, 8, {"A": 100.0, "B": 50.0, "C": 75.0}), 0)

    got = spark.read.parquet(corr)
    assert {
        (r["sym_a"], r["sym_b"])
        for r in got.select("sym_a", "sym_b").distinct().collect()
    } == {("A", "B")}
    stored = spark.read.parquet(path)
    want = rolling_correlation_matrix(
        stored.where(F.col("time_frame") == "MINUTE"),
        symbols=["A", "B"], n=N,
    )
    assert _corr_rows(got) == _corr_rows(want)


def test_corr_tier_random_sparse_out_of_order_patterns(spark, tmp_path):
    """Randomized adversarial replay (deterministic seeds): sparse minute
    sets for three symbols, shuffled into OUT-OF-ORDER batches — every
    delivery is potentially a backfill that re-carries gap rows and
    shifts pair windows. After the replay, (a) the stored minutes equal
    the batch gap fill of the real candles, and (b) the overlay equals
    the batch matrix recompute — the two invariants that define the
    tier, under patterns no hand-written case covers."""
    import random

    from stock_chart_kafka_streams_spark.operators.candles import (
        fill_candle_gaps,
    )
    from stock_chart_kafka_streams_spark.streaming.corr import (
        cascade_upsert_with_corr,
    )

    t0 = dt.datetime(2024, 4, 10, 9, 0)
    for trial in (0, 1):
        rng = random.Random(100 + trial)
        path = str(tmp_path / f"rc_candles_{trial}")
        corr = str(tmp_path / f"rc_corr_{trial}")
        hook = cascade_upsert_with_corr(
            path, corr, frames=["MINUTE"], corr_n=N
        )
        rows = []
        for si, sym in enumerate(("A", "B", "C")):
            minutes = sorted(rng.sample(range(0, 120), rng.randint(6, 14)))
            for m in minutes:
                rows.append(
                    (sym, t0 + dt.timedelta(minutes=m),
                     50.0 * (si + 1) + 0.25 * m, 1 + (m % 3))
                )
        rng.shuffle(rows)
        cuts = sorted(rng.sample(range(1, len(rows)), 2))
        batches = [
            rows[: cuts[0]], rows[cuts[0]:cuts[1]], rows[cuts[1]:],
        ]
        for i, b in enumerate(batches):
            hook(_mk_candle_batch(spark, b), i)

        stored = spark.read.parquet(path).where("time_frame = 'MINUTE'")
        sel = ["symbol", "bucket_start", "open", "high", "low", "close", "volume"]
        reals = stored.where("NOT is_gap").select(*sel)
        want_fill = fill_candle_gaps(reals, "MINUTE").select(*sel)
        got_fill = stored.select(*sel)
        assert got_fill.exceptAll(want_fill).count() == 0, trial
        assert want_fill.exceptAll(got_fill).count() == 0, trial

        want_corr = rolling_correlation_matrix(stored, n=N)
        assert _corr_rows(spark.read.parquet(corr)) == _corr_rows(want_corr), trial


def test_corr_sparse_mid_history_amend_propagates_forward(spark, tmp_path):
    """r12 advice (high): the forward update bound must be measured in
    ALIGNED ROWS, not time. On a sparse, non-gap-filled table, amending a
    close at aligned bucket t changes the pair rows at the next (n-1)
    ALIGNED buckets — which here sit two hours later, far beyond the old
    time-measured out_hi. The tier must widen forward until those rows
    are inside the recompute slice."""
    path = str(tmp_path / "candles_amend")
    corr = str(tmp_path / "corr_amend")
    hook = cascade_upsert_with_corr(
        path, corr, frames=["MINUTE"], fill_gaps=False, corr_n=N
    )
    t0 = dt.datetime(2024, 4, 12, 9, 0)

    # aligned rows at minutes 0,1,2 then 120,121 (the sparse-series shape)
    hook(_mk_batch(spark, t0, 3, {"A": 100.0, "B": 50.0}), 0)
    hook(_mk_batch(
        spark, t0 + dt.timedelta(minutes=120), 2, {"A": 101.0, "B": 51.0}
    ), 1)
    base = _corr_rows(spark.read.parquet(corr))

    # amend minute 1 for B: row at minute 120 (window {1, 2, 120} with
    # N=3) must change; the batch's anchor window is [0, 2]
    hook(_mk_candle_batch(
        spark, [("B", t0 + dt.timedelta(minutes=1), 58.0, 3)]
    ), 2)

    stored = spark.read.parquet(path)
    want = rolling_correlation_matrix(
        stored.where(F.col("time_frame") == "MINUTE"), n=N
    )
    got = _corr_rows(spark.read.parquet(corr))
    assert got == _corr_rows(want)
    assert got != base  # the amend really did move downstream pair rows
    # specifically: the minute-120 row (two hours past the amend) changed
    t120 = t0 + dt.timedelta(minutes=120)
    assert [r for r in got if r[2] == t120] != [r for r in base if r[2] == t120]


def test_corr_and_fill_respect_candle_expiry(spark, tmp_path):
    """r12 verdict #7 (expire coupling): after expire_candles drops
    partitions below T, later batches' anchor probes, gap fills and corr
    updates must not resurrect buckets < T — dropped directories are out
    of the partition listing, so nothing can reference them."""
    from stock_chart_kafka_streams_spark.streaming.corr import expire_corr
    from stock_chart_kafka_streams_spark.streaming.sink import expire_candles

    path = str(tmp_path / "candles_exp")
    corr = str(tmp_path / "corr_exp")
    hook = cascade_upsert_with_corr(path, corr, frames=["MINUTE"], corr_n=N)
    d1 = dt.datetime(2024, 4, 14, 23, 50)
    d2 = dt.datetime(2024, 4, 15, 0, 0)
    hook(_mk_batch(spark, d1, 5, {"A": 100.0, "B": 50.0}), 0)
    hook(_mk_batch(spark, d2, 5, {"A": 101.0, "B": 49.0}), 1)

    assert expire_candles(spark, path, "2024-04-15") == [
        ("MINUTE", "2024-04-14")
    ]
    assert expire_corr(spark, corr, "2024-04-15") == ["2024-04-14"]

    pre_expiry = {
        r[2]: r for r in _corr_rows(spark.read.parquet(corr))
    }

    # a later batch on day 2: anchors, fills and corr rows stay >= T
    hook(_mk_batch(
        spark, d2 + dt.timedelta(minutes=10), 3, {"A": 102.0, "B": 48.0}
    ), 2)
    cutoff = dt.date(2024, 4, 15)
    stored = spark.read.parquet(path)
    assert stored.where(F.col("bucket_date") < F.lit(cutoff)).count() == 0
    got_corr = spark.read.parquet(corr)
    assert got_corr.where(F.col("bucket_date") < F.lit(cutoff)).count() == 0
    assert not os.path.exists(f"{path}/time_frame=MINUTE/bucket_date=2024-04-14")
    assert not os.path.exists(f"{corr}/bucket_date=2024-04-14")

    # rows whose windows survived intact equal the batch recompute over
    # the truncated table; the first (n-1) post-cutoff rows legitimately
    # KEEP their pre-expiry trailing-window values (windows that reached
    # the expired candles — by design the overlay stores full-history
    # trailing windows, and the update must not half-rewrite them from a
    # truncated slice)
    edge = d2 + dt.timedelta(minutes=N - 1)
    want = rolling_correlation_matrix(
        stored.where(F.col("time_frame") == "MINUTE"), n=N
    ).where(F.col("bucket_start") >= F.lit(edge))
    got_rows = _corr_rows(got_corr)
    assert [r for r in got_rows if r[2] >= edge] == _corr_rows(want)
    for r in got_rows:
        if r[2] < edge:
            assert r == pre_expiry[r[2]]  # stable, not silently rewritten


def test_ranged_auto_corr_keeps_recompute_semantics(spark, built):
    """r12 advice: attaching the overlay must not silently change RANGED
    auto-mode results — the overlay stores full-history trailing windows,
    the recompute path starts windows at the range's first bucket. Auto +
    start => recompute (same rows before and after attach); explicit
    materialized=true opts into the overlay's trailing values; unranged
    auto still serves the overlay."""
    path, corr, hook, batches = built
    for i, b in enumerate(batches):
        hook(b, i)
    store = CandleStore.from_path(spark, path)
    start, end = "2024-04-02T00:00:00", "2024-04-02T23:59:00"

    def _key(df):
        return sorted(
            (r["bucket_start"], round(r[f"corr_{N}"], 9))
            for r in df.collect()
            if r[f"corr_{N}"] is not None
        )

    before_attach = _key(store.correlation("A", "B", n=N, start=start, end=end))
    store.attach_corr_table(corr, n=N)
    auto_ranged = _key(store.correlation("A", "B", n=N, start=start, end=end))
    assert auto_ranged == before_attach  # attach is invisible to ranged auto

    explicit = _key(
        store.correlation("A", "B", n=N, start=start, end=end, materialized=True)
    )
    # trailing windows reach behind the range start -> earliest ranged
    # buckets carry values the range-local recompute cannot have
    assert explicit != auto_ranged

    # unranged auto = the overlay (trailing) = explicit materialized
    un_auto = _key(store.correlation("A", "B", n=N))
    un_explicit = _key(store.correlation("A", "B", n=N, materialized=True))
    assert un_auto == un_explicit

    # matrix route: same rule
    m_auto = store.correlation_matrix(n=N, start=start, end=end)
    m_off = store.correlation_matrix(
        n=N, start=start, end=end, materialized=False
    )
    assert sorted(map(tuple, m_auto.collect())) == sorted(
        map(tuple, m_off.collect())
    )

def test_out_of_range_overlay_request_is_schema_stable_and_cheap(
    spark, built, tmp_path
):
    """r13 advice: a ranged materialized request matching no stored
    overlay dates must return a schema-stable empty frame WITHOUT a
    full-root listing — and must not throw when the overlay was attached
    but never written."""
    path, corr, hook, batches = built
    for i, b in enumerate(batches):
        hook(b, i)
    store = CandleStore.from_path(spark, path)
    store.attach_corr_table(corr, n=N)
    far = ("2030-01-01T00:00:00", "2030-01-02T00:00:00")
    df = store.correlation(
        "A", "B", n=N, materialized=True, start=far[0], end=far[1]
    )
    assert df.count() == 0
    assert df.columns == [
        "pair", "bucket_start", "close_a", "close_b", f"corr_{N}"
    ]

    # attached-but-never-written overlay: same contract, no exception
    store2 = CandleStore.from_path(spark, path)
    store2.attach_corr_table(str(tmp_path / "corr_never_written"), n=N)
    df2 = store2.correlation(
        "A", "B", n=N, materialized=True, start=far[0], end=far[1]
    )
    assert df2.count() == 0
    assert df2.columns == df.columns
    m2 = store2.correlation_matrix(
        n=N, materialized=True, start=far[0], end=far[1]
    )
    assert m2.count() == 0
    assert m2.columns == [
        "sym_a", "sym_b", "bucket_start", "close_a", "close_b", f"corr_{N}"
    ]

def test_one_anchor_probe_per_batch(spark, built, monkeypatch):
    """r13 verdict #2: cascade_upsert_with_corr ran the identical anchor
    probe twice per micro-batch (once in the gap fill, once in the corr
    update). The cascade body's probe result now feeds both — exactly
    ONE affected_symbol_windows call per trigger."""
    from stock_chart_kafka_streams_spark.streaming import pipeline as pl

    path, corr, hook, batches = built
    hook(batches[0], 0)  # bootstrap so the probe has stored history

    calls = {"n": 0}
    orig = pl.affected_symbol_windows

    def counting(*a, **kw):
        calls["n"] += 1
        return orig(*a, **kw)

    monkeypatch.setattr(pl, "affected_symbol_windows", counting)
    hook(batches[1], 1)
    assert calls["n"] == 1
