"""Property/invariant tests for the candle operators (SURVEY §5.4) on the
deterministic generator and the driver test data."""

import pytest
from pyspark.sql import functions as F

from stock_chart_kafka_streams_spark import (
    CandleStore,
    candles,
    load_trades,
    multi_frame_candles,
    rollup_candles,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def trades(spark):
    return load_trades(spark, SF_DIR).cache()


@pytest.fixture(scope="module")
def mf(trades):
    return multi_frame_candles(trades).cache()


def test_ohlc_invariants(mf):
    bad = mf.where(
        (F.col("low") > F.least("open", "close"))
        | (F.col("high") < F.greatest("open", "close"))
        | (F.col("volume") < 0)
        | (F.col("bucket_end") <= F.col("bucket_start"))
    )
    assert bad.count() == 0


def test_candle_uniqueness(mf):
    total = mf.count()
    distinct = mf.select("symbol", "time_frame", "bucket_start").distinct().count()
    assert total == distinct


def test_volume_conservation(trades, mf):
    """Σ volume per frame == Σ quantity of all trades."""
    total_qty = trades.agg(F.sum("quantity")).collect()[0][0]
    per_frame = {
        r["time_frame"]: r["v"]
        for r in mf.groupBy("time_frame").agg(F.sum("volume").alias("v")).collect()
    }
    for frame, v in per_frame.items():
        assert v == total_qty, frame


@pytest.mark.parametrize("frame", ["HOUR", "DAY", "MONTH"])
def test_rollup_equals_direct(trades, frame):
    """Associativity (SURVEY §2.7 Q6): minute-candle rollup == direct agg."""
    direct = candles(trades, frame)
    rolled = rollup_candles(candles(trades, "MINUTE"), frame)
    assert direct.exceptAll(rolled).count() == 0
    assert rolled.exceptAll(direct).count() == 0


def test_cascade_equals_independent(trades):
    a = multi_frame_candles(trades, cascade=True)
    b = multi_frame_candles(trades, cascade=False)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_salted_equals_plain(trades):
    """Skew-path associativity: two-phase salted aggregation == one-phase."""
    from stock_chart_kafka_streams_spark.operators.candles import candles_salted

    for frame in ["MINUTE", "DAY"]:
        plain = candles(trades, frame)
        salted = candles_salted(trades, frame, salt_buckets=8)
        assert plain.exceptAll(salted).count() == 0
        assert salted.exceptAll(plain).count() == 0


def test_recent_n_is_suffix_of_range(mf):
    store = CandleStore(mf)
    all_days = store.get_candles("click", "DAY").collect()
    recent = store.recent("click", "DAY", n=5).collect()
    assert recent == all_days[-5:]


def test_point_lookup_unique(mf):
    store = CandleStore(mf)
    rows = store.point("click", "DAY", 2024, 1, 5).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["symbol"] == "click" and r["time_frame"] == "DAY"


def test_rsi_bounds_and_extremes(spark):
    """RSI stays in [0, 100]; an all-up series pins 100, all-down pins 0,
    and the first row of a series (no change) is NULL."""
    import datetime

    from pyspark.sql import functions as F

    from stock_chart_kafka_streams_spark.operators.indicators import with_rsi

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    for i in range(20):
        ts = t0 + datetime.timedelta(hours=i)
        rows.append(("UP", "HOUR", ts, 100.0 + i))
        rows.append(("DOWN", "HOUR", ts, 100.0 - i))
    df = spark.createDataFrame(
        rows, "symbol string, time_frame string, bucket_start timestamp, close double"
    )
    out = with_rsi(df)
    vals = {(r.symbol, r.bucket_start): r.rsi_14 for r in out.collect()}
    assert vals[("UP", t0)] is None and vals[("DOWN", t0)] is None
    for (sym, ts), v in vals.items():
        if v is not None:
            assert 0.0 <= v <= 100.0
        if ts > t0:
            assert v == (100.0 if sym == "UP" else 0.0)


def test_drawdown_properties(spark):
    """drawdown <= 0 always, 0 exactly at running peaks, and the rolling
    worst equals the window minimum."""
    import datetime

    from stock_chart_kafka_streams_spark.operators.indicators import with_drawdown

    t0 = datetime.datetime(2024, 1, 1)
    closes = [100.0, 110.0, 99.0, 104.5, 88.0, 121.0, 121.0, 60.5]
    rows = [
        ("A", "HOUR", t0 + datetime.timedelta(hours=i), c)
        for i, c in enumerate(closes)
    ]
    df = spark.createDataFrame(
        rows, "symbol string, time_frame string, bucket_start timestamp, close double"
    )
    out = sorted(with_drawdown(df, n=4).collect(), key=lambda r: r.bucket_start)
    for i, r in enumerate(out):
        lo = max(0, i - 3)
        peak = max(closes[lo : i + 1])
        assert r.peak_4 == peak
        assert abs(r.drawdown - (closes[i] / peak - 1.0)) < 1e-12
        assert r.drawdown <= 0.0
    worst = [r.max_drawdown_4 for r in out]
    dds = [r.drawdown for r in out]
    for i in range(len(out)):
        assert abs(worst[i] - min(dds[max(0, i - 3) : i + 1])) < 1e-12


def test_fill_candle_gaps_synthesizes_flat_candles(spark):
    import datetime as dt

    from stock_chart_kafka_streams_spark.operators.candles import fill_candle_gaps

    t0 = dt.datetime(2024, 1, 1, 9, 0)
    rows = [
        ("A", t0, 10.0, 12.0, 9.0, 11.0, 100),
        # 9:01 and 9:02 missing
        ("A", t0 + dt.timedelta(minutes=3), 11.5, 13.0, 11.0, 12.0, 50),
        ("B", t0, 5.0, 5.0, 5.0, 5.0, 7),
    ]
    c = spark.createDataFrame(
        rows,
        "symbol string, bucket_start timestamp, open double, high double,"
        " low double, close double, volume long",
    )
    out = {
        (r["symbol"], r["bucket_start"].minute): r
        for r in fill_candle_gaps(c, "MINUTE").collect()
    }
    assert len(out) == 5  # A: 9:00-9:03 grid (4), B: single bucket
    for minute in (1, 2):
        g = out[("A", minute)]
        assert g["is_gap"] and g["volume"] == 0
        # flat at the prior real close
        assert g["open"] == g["high"] == g["low"] == g["close"] == 11.0
    assert not out[("A", 0)]["is_gap"] and not out[("A", 3)]["is_gap"]
    assert out[("A", 3)]["open"] == 11.5  # real rows untouched
    assert not out[("B", 0)]["is_gap"]


def test_fill_candle_gaps_month_frame_calendar_grid(spark):
    import datetime as dt

    from stock_chart_kafka_streams_spark.operators.candles import fill_candle_gaps

    rows = [
        ("A", dt.datetime(2024, 1, 1), 1.0, 1.0, 1.0, 2.0, 1),
        ("A", dt.datetime(2024, 4, 1), 3.0, 3.0, 3.0, 3.0, 1),
    ]
    c = spark.createDataFrame(
        rows,
        "symbol string, bucket_start timestamp, open double, high double,"
        " low double, close double, volume long",
    )
    got = sorted(
        (r["bucket_start"].month, r["is_gap"], r["close"], r["bucket_end"].month)
        for r in fill_candle_gaps(c, "MONTH").collect()
    )
    # calendar months 1..4; Feb/Mar are gaps flat at Jan's close; half-open
    # month ends land on the NEXT month's first day
    assert got == [(1, False, 2.0, 2), (2, True, 2.0, 3), (3, True, 2.0, 4), (4, False, 3.0, 5)]


def test_fill_candle_gaps_rejects_unknown_frame(spark):
    import pytest as _pytest

    from stock_chart_kafka_streams_spark.operators.candles import (
        fill_candle_gaps,
        fill_candle_gaps_sql,
    )

    df = spark.range(1)
    with _pytest.raises(ValueError, match="unknown time frame"):
        fill_candle_gaps(df, "WEEK")
    with _pytest.raises(ValueError, match="unknown time frame"):
        fill_candle_gaps_sql("SELECT 1", "WEEK")


def test_fill_candle_gaps_month_grid_cross_engine(spark):
    """The calendar-MONTH grid must agree across engines (Spark month-
    interval sequence + add_months vs DuckDB generate_series + interval
    arithmetic) — the one frame whose step is not a fixed duration."""
    import datetime as dt

    import duckdb

    from stock_chart_kafka_streams_spark.operators.candles import (
        fill_candle_gaps,
        fill_candle_gaps_sql,
    )

    rows = [
        ("A", dt.datetime(2023, 11, 1), 1.0, 2.0, 0.5, 1.5, 3),
        ("A", dt.datetime(2024, 3, 1), 4.0, 4.0, 4.0, 4.0, 1),
    ]
    c = spark.createDataFrame(
        rows,
        "symbol string, bucket_start timestamp, open double, high double,"
        " low double, close double, volume long",
    )
    got = sorted(map(tuple, fill_candle_gaps(c, "MONTH").collect()))
    con = duckdb.connect()
    con.sql(
        "CREATE TABLE cm(symbol VARCHAR, bucket_start TIMESTAMP,"
        " \"open\" DOUBLE, high DOUBLE, low DOUBLE, \"close\" DOUBLE,"
        " volume BIGINT)"
    )
    for r in rows:
        con.sql(
            f"INSERT INTO cm VALUES ('{r[0]}', TIMESTAMP '{r[1]}',"
            f" {r[2]}, {r[3]}, {r[4]}, {r[5]}, {r[6]})"
        )
    want = sorted(map(tuple, con.sql(
        fill_candle_gaps_sql("SELECT * FROM cm", "MONTH")
    ).fetchall()))
    con.close()
    assert got == want and len(got) == 5  # Nov..Mar inclusive


def test_fill_candle_gaps_rejects_misaligned_buckets(spark):
    """A bucket_start off the frame grid must RAISE, not silently vanish
    behind a synthetic flat candle at a stale close (r9 review)."""
    import datetime as dt

    import pytest as _pytest

    from stock_chart_kafka_streams_spark.operators.candles import fill_candle_gaps

    c = spark.createDataFrame(
        [
            ("A", dt.datetime(2024, 1, 1, 9, 0, 30), 1.0, 1.0, 1.0, 1.0, 1),
            ("A", dt.datetime(2024, 1, 1, 9, 2, 0), 2.0, 2.0, 2.0, 2.0, 1),
        ],
        "symbol string, bucket_start timestamp, open double, high double,"
        " low double, close double, volume long",
    )
    with _pytest.raises(Exception, match="off the MINUTE grid"):
        fill_candle_gaps(c, "MINUTE").collect()


def test_mad_outliers_null_prices_excluded_cross_engine(spark):
    """NULL prices are out of the statistics and n_trades in BOTH engines
    (r9 review: Spark sorts NULLs first under ASC, DuckDB last — an
    unfiltered positional median would diverge or silently NULL)."""
    import datetime as dt

    import duckdb

    from stock_chart_kafka_streams_spark.operators.windows_ext import (
        mad_outlier_stats,
        mad_outlier_stats_sql,
    )

    rows = [
        ("A", dt.datetime(2024, 1, 1, 9, 0), None, 1),
        ("A", dt.datetime(2024, 1, 1, 9, 1), 10.0, 1),
        ("A", dt.datetime(2024, 1, 1, 9, 2), 20.0, 1),
    ]
    trades = spark.createDataFrame(
        rows, "symbol string, ts timestamp, price double, quantity long"
    )
    got = sorted(map(tuple, mad_outlier_stats(trades).collect()))
    con = duckdb.connect()
    con.sql(
        "CREATE TABLE t(symbol VARCHAR, ts TIMESTAMP, price DOUBLE, quantity BIGINT)"
    )
    con.sql(
        "INSERT INTO t VALUES ('A', TIMESTAMP '2024-01-01 09:00:00', NULL, 1),"
        " ('A', TIMESTAMP '2024-01-01 09:01:00', 10.0, 1),"
        " ('A', TIMESTAMP '2024-01-01 09:02:00', 20.0, 1)"
    )
    want = sorted(
        map(tuple, con.sql(mad_outlier_stats_sql("trades AS (SELECT * FROM t)")).fetchall())
    )
    con.close()
    assert got == want
    assert got[0][2] == 2  # n_trades counts only non-null prices
    assert got[0][3] == 10.0  # lower median of [10, 20]


# -- hot-series pre-split (round 10, r9 verdict #3) -------------------------


def _dense_series(spark, n_rows=240, drop=()):
    """One hot symbol, dense minute candles with a deterministic price
    wiggle; ``drop`` removes minute indices to create gaps."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 9, 0)
    rows = []
    for i in range(n_rows):
        if i in drop:
            continue
        px = 100.0 + ((i * 37) % 50) - ((i * 13) % 23)
        rows.append(
            (
                "HOT",
                "MINUTE",
                t0 + dt.timedelta(minutes=i),
                px - 0.5,
                px + 1.0,
                px - 1.0,
                px,
                10 + i % 7,
            )
        )
    return spark.createDataFrame(
        rows,
        "symbol string, time_frame string, bucket_start timestamp,"
        " open double, high double, low double, close double, volume long",
    )


def _sorted_rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.mark.parametrize("split_seconds", [2700, 3600])
def test_indicators_split_equals_unsplit(spark, split_seconds):
    """2700s/3600s buckets hold 45/60 minute-rows — above every depth
    (4 for SMA, 14 for RSI, 38 for drawdown) — and 2700 misaligns the
    bucket boundary against the hour so frames routinely straddle it."""
    from stock_chart_kafka_streams_spark.operators.indicators import (
        with_drawdown,
        with_indicators,
        with_rsi,
    )

    series = _dense_series(spark)
    for fn in (with_indicators, with_rsi, with_drawdown):
        base = fn(series)
        split = fn(series, split_seconds=split_seconds)
        assert split.columns == base.columns, fn.__name__
        assert _sorted_rows(split) == _sorted_rows(base), (
            f"{fn.__name__} split_seconds={split_seconds}"
        )
    # with_indicators' depth is only 4: a 600s split (10-row buckets) is
    # legal there and must still match
    base = with_indicators(series)
    assert _sorted_rows(with_indicators(series, split_seconds=600)) == _sorted_rows(base)


def test_indicators_split_raises_on_sparse_bucket(spark):
    """A bucket thinner than the context depth cannot feed its
    successor's warm-up — must raise, never silently compute wrong
    warm-up values."""
    from stock_chart_kafka_streams_spark.operators.indicators import (
        with_drawdown,
    )

    # 600s buckets hold 10 minute-rows; drawdown n=20 needs depth 38
    series = _dense_series(spark, n_rows=40)
    with pytest.raises(ValueError, match="too fine"):
        with_drawdown(series, split_seconds=600).collect()


def test_indicators_split_rejects_nonpositive(spark):
    from stock_chart_kafka_streams_spark.operators.indicators import with_rsi

    with pytest.raises(ValueError, match="split_seconds"):
        with_rsi(_dense_series(spark, n_rows=30), split_seconds=-1)


def test_fill_candle_gaps_split_equals_unsplit(spark):
    from stock_chart_kafka_streams_spark.operators.candles import (
        fill_candle_gaps,
    )

    # gaps include a run (minutes 60-89) spanning THREE whole 600s coarse
    # buckets, so the carry must cross empty buckets, plus boundary-
    # adjacent single gaps
    drop = set(range(60, 90)) | {9, 10, 119, 120, 121}
    series = _dense_series(spark, n_rows=240, drop=drop).drop("time_frame")
    base = fill_candle_gaps(series, "MINUTE")
    for split in (600, 3600):
        split_df = fill_candle_gaps(series, "MINUTE", split_seconds=split)
        assert split_df.columns == base.columns
        assert _sorted_rows(split_df) == _sorted_rows(base), split

    with pytest.raises(ValueError, match="split_seconds"):
        fill_candle_gaps(series, "MINUTE", split_seconds=0)


# -- c17: arbitrary n-minute frames (round 10) -------------------------------


def test_n_minute_candles_merge_into_hour(trades):
    """5MIN frames partition each hour (60 % 5 == 0), so merging them with
    the rollup aggregates must reproduce the HOUR frame exactly — the
    SURVEY §2.7 Q6 associativity argument applied to the new grid."""
    from stock_chart_kafka_streams_spark.functions.ohlcv import merge_aggs
    from stock_chart_kafka_streams_spark.operators.candles import (
        candles_n_minutes,
    )

    five = candles_n_minutes(trades, 5)
    merged = (
        five.groupBy(
            "symbol", F.date_trunc("hour", "bucket_start").alias("bucket_start")
        )
        .agg(*merge_aggs())
        .select("symbol", "bucket_start", "open", "high", "low", "close", "volume")
    )
    direct = candles(trades, "HOUR").select(
        "symbol", "bucket_start", "open", "high", "low", "close", "volume"
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_n_minute_candles_one_minute_rejected_as_minute_alias(trades):
    """'1MIN' produces byte-identical buckets to 'MINUTE' (UTC
    date_trunc('minute') == floor(epoch/60)*60) but under a different
    time_frame TAG — one series stored as two "unrelated" series. Since
    r11 the numeric surface rejects the aliasing n values too (r10
    advice), pointing at the canonical name."""
    from stock_chart_kafka_streams_spark.operators.candles import (
        candles_n_minutes,
    )

    with pytest.raises(ValueError, match="use 'MINUTE'"):
        candles_n_minutes(trades, 1)
    with pytest.raises(ValueError, match="use 'HOUR'"):
        candles_n_minutes(trades, 60)


def test_n_minute_candles_rejects_nonpositive(trades):
    from stock_chart_kafka_streams_spark.operators.candles import (
        candles_n_minutes,
        candles_n_minutes_sql,
    )

    with pytest.raises(ValueError, match="n_minutes"):
        candles_n_minutes(trades, 0)
    with pytest.raises(ValueError, match="n_minutes"):
        candles_n_minutes_sql(-5)


def test_nmin_frame_name_flows_through_candles_and_store(trades):
    """'5MIN' is a first-class frame name since round 10: candles()
    equals candles_n_minutes, and the CandleStore range/recent/point
    surface serves it — including gap-fill on the 5-minute grid."""
    from stock_chart_kafka_streams_spark.operators.candles import (
        candles_n_minutes,
    )

    via_name = candles(trades, "5MIN")
    via_fn = candles_n_minutes(trades, 5)
    assert sorted(map(tuple, via_name.collect())) == sorted(
        map(tuple, via_fn.collect())
    )

    store = CandleStore(via_name)
    sym = via_name.select("symbol").first()["symbol"]
    rng = store.get_candles(sym, "5MIN").collect()
    assert len(rng) > 0 and all(r["time_frame"] == "5MIN" for r in rng)
    assert len(store.recent(sym, "5MIN", n=3).collect()) == 3
    first = rng[0]["bucket_start"]
    pt = store.point(
        sym, "5MIN", first.year, first.month, first.day, first.hour, first.minute
    ).collect()
    assert len(pt) == 1

    filled = store.get_candles(sym, "5MIN", fill_gaps=True).collect()
    starts = [r["bucket_start"] for r in filled]
    for a, b in zip(starts, starts[1:]):
        assert (b - a).total_seconds() == 300.0  # contiguous 5-min grid
    assert len(filled) >= len(rng)


def test_bad_frame_names_still_rejected(trades):
    from stock_chart_kafka_streams_spark.operators.candles import fill_candle_gaps

    store = CandleStore(candles(trades, "MINUTE"))
    for bad in ("0MIN", "-5MIN", "五MIN", "WEEK", "min"):
        with pytest.raises(ValueError, match="unknown time frame"):
            store.get_candles("x", bad)
        with pytest.raises(ValueError, match="unknown time frame"):
            candles(trades, bad)
        with pytest.raises(ValueError, match="unknown time frame"):
            fill_candle_gaps(trades, bad)
    # r10 advice: nMIN names that duplicate a canonical grid under a
    # different time_frame tag ('60MIN' == 'HOUR') would let one series be
    # stored twice as two "unrelated" series — rejected with a pointer.
    for alias, canonical in (("1MIN", "MINUTE"), ("60MIN", "HOUR"),
                             ("1440MIN", "DAY")):
        with pytest.raises(ValueError, match=f"use '{canonical}'"):
            store.get_candles("x", alias)
        with pytest.raises(ValueError, match="duplicates"):
            candles(trades, alias)


def test_multi_frame_rejects_nmin_instead_of_dropping(trades):
    with pytest.raises(ValueError, match="cascade frames"):
        multi_frame_candles(trades, ["MINUTE", "5MIN"])


def test_nmin_gap_fill_cross_engine(spark):
    """r10 review #6: the gap-fill twin must accept nMIN grids and
    hash-match the engine on a gappy 5-minute series."""
    import datetime as dt

    import duckdb
    import pandas as pd

    from stock_chart_kafka_streams_spark.operators.candles import (
        fill_candle_gaps,
        fill_candle_gaps_sql,
    )
    from tests.oracle import assert_matches_oracle

    t0 = dt.datetime(2024, 1, 1, 9, 0)
    rows = []
    for i in range(12):
        if i in (2, 3, 7):
            continue
        rows.append(
            ("A", t0 + dt.timedelta(minutes=5 * i), 10.0 + i, 12.0 + i,
             9.0 + i, 11.0 + i, 10 + i)
        )
    df = spark.createDataFrame(
        rows,
        "symbol string, bucket_start timestamp, open double, high double,"
        " low double, close double, volume long",
    )
    got = fill_candle_gaps(df, "5MIN")
    con = duckdb.connect()
    pdf = pd.DataFrame(
        rows,
        columns=["symbol", "bucket_start", "open", "high", "low", "close", "volume"],
    )
    con.register("c_in", pdf)
    assert_matches_oracle(
        got, con, fill_candle_gaps_sql("SELECT * FROM c_in", "5MIN")
    )
    con.close()


def test_unicode_digit_frame_names_rejected(trades):
    """r10 review #1: \\d matches Unicode digits — '1٥MIN' must NOT
    parse as 15MIN (two names aliasing one grid)."""
    from stock_chart_kafka_streams_spark.functions.timeframes import (
        frame_minutes,
        valid_frame,
    )

    assert frame_minutes("1٥MIN") is None
    assert not valid_frame("1٥MIN")
    with pytest.raises(ValueError, match="unknown time frame"):
        candles(trades, "1٥MIN")


def test_band_cap_rejected_in_exact_mode(spark):
    from stock_chart_kafka_streams_spark.operators.dedup import incremental_dedup

    df = spark.createDataFrame([(0, "alpha beta")], "doc_id long, text string")
    with pytest.raises(ValueError, match="band_cap"):
        incremental_dedup(df, df, mode="exact", band_cap=512)
