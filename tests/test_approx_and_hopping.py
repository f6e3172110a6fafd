"""Approximate aggregates (bounded error vs exact) and streaming hopping
windows (equal to batch hopping on a no-late replay)."""

from pyspark.sql import functions as F

from stock_chart_kafka_streams_spark import load_trades
from stock_chart_kafka_streams_spark.operators.windows_ext import (
    KMV_K,
    approx_daily_stats,
    daily_price_stats,
    hopping_candles,
    kmv_daily_stats,
)
from stock_chart_kafka_streams_spark.sources.trades import read_trades_json_stream
from stock_chart_kafka_streams_spark.streaming.pipeline import (
    streaming_hopping_candles,
)
from stock_chart_kafka_streams_spark.streaming.replay import (
    SENTINEL_CUTOFF,
    late_replay_trades,
    write_replay_batches,
)

SF_DIR = "/root/testdata/sf0.001"


def test_approx_stats_bounded_error(spark):
    trades = load_trades(spark, SF_DIR).cache()
    approx = approx_daily_stats(trades)
    exact = trades.groupBy(
        "symbol", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.countDistinct("price").alias("exact_distinct"),
        F.median("price").alias("exact_median"),
        F.min("price").alias("pmin"),
        F.max("price").alias("pmax"),
    )
    joined = approx.join(exact, on=["symbol", "day"]).collect()
    assert joined
    for r in joined:
        # HLL++ relative error: configured 2% rsd, allow 10% slack
        assert abs(r["approx_distinct_prices"] - r["exact_distinct"]) <= max(
            2, 0.10 * r["exact_distinct"]
        ), r
        # approx percentile is an actual data value within the day's range
        assert r["pmin"] <= r["approx_median_price"] <= r["pmax"], r


def test_kmv_stats_bounded_error(spark):
    """The deterministic KMV sketch (driver w9) must be exact below k and
    within the estimator's theoretical error above it; the deterministic
    sample median must land inside the day's price range."""
    trades = load_trades(spark, SF_DIR).cache()
    sk = kmv_daily_stats(trades)
    exact = trades.groupBy(
        "symbol", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.countDistinct(
            F.floor(F.col("price") * F.lit(100.0)).cast("long")
        ).alias("exact_ticks"),
        F.min("price").alias("pmin"),
        F.max("price").alias("pmax"),
        F.count("*").alias("n"),
    )
    joined = sk.join(exact, on=["symbol", "day"]).collect()
    assert joined
    rel_errs = []
    for r in joined:
        assert r["n_trades"] == r["n"], r
        if r["exact_ticks"] < KMV_K:
            assert r["kmv_distinct_ticks"] == float(r["exact_ticks"]), r
        else:
            rel_errs.append(
                abs(r["kmv_distinct_ticks"] - r["exact_ticks"]) / r["exact_ticks"]
            )
        if r["sample_median_price"] is not None:
            assert r["pmin"] <= r["sample_median_price"] <= r["pmax"], r
        # ~10% deterministic sample: loose two-sided bound per group
        assert r["sample_n"] <= r["n"]
    if rel_errs:
        # KMV std error ~ 1/sqrt(k-2) = 12.7% at k=64; individual groups can
        # wander a few sigma, the mean must not
        assert sum(rel_errs) / len(rel_errs) < 0.25, rel_errs


def test_streaming_hopping_matches_batch(spark, tmp_path):
    trades = late_replay_trades(spark, SF_DIR, batch_size=250)
    write_replay_batches(trades, str(tmp_path / "in"))
    stream = read_trades_json_stream(spark, str(tmp_path / "in"), max_files_per_trigger=1)
    q = (
        streaming_hopping_candles(stream, watermark_delay="31 days")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("hop_out")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = (
        spark.sql("select * from hop_out")
        .where(F.col("bucket_start") < F.lit(SENTINEL_CUTOFF).cast("timestamp"))
        .where(F.col("symbol") != "__heartbeat__")
    )
    want = hopping_candles(trades.drop("batch"))
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


# -- w13: median/MAD outlier screening --------------------------------------


def test_mad_outliers_flags_planted_spike(spark):
    import datetime as dt

    from stock_chart_kafka_streams_spark.operators.windows_ext import (
        mad_outlier_stats,
    )

    t0 = dt.datetime(2024, 3, 1, 10, 0)
    rows = [("A", t0 + dt.timedelta(minutes=i), 100.0 + (i % 5) * 0.1, 1)
            for i in range(50)]
    rows.append(("A", t0 + dt.timedelta(minutes=55), 900.0, 1))  # the spike
    rows += [("B", t0 + dt.timedelta(minutes=i), 50.0, 1) for i in range(10)]
    trades = spark.createDataFrame(
        rows, "symbol string, ts timestamp, price double, quantity long"
    )
    out = {r["symbol"]: r for r in mad_outlier_stats(trades).collect()}
    assert out["A"]["n_outliers"] == 1  # only the spike clears 5 MADs
    assert abs(out["A"]["med_price"] - 100.2) < 1e-9
    # a constant series has MAD 0 and, with dev 0 for every row, zero
    # outliers (0 > 0 is false) — the degenerate group is quiet, not noisy
    assert out["B"]["n_outliers"] == 0 and out["B"]["mad"] == 0.0


def test_mad_outliers_rejects_bad_k(spark):
    import pytest as _pytest

    from stock_chart_kafka_streams_spark.operators.windows_ext import (
        mad_outlier_stats,
        mad_outlier_stats_sql,
    )

    df = spark.range(1)
    with _pytest.raises(ValueError, match="rational"):
        mad_outlier_stats(df, k_num=-1)
    with _pytest.raises(ValueError, match="rational"):
        mad_outlier_stats_sql("trades AS (SELECT 1)", k_den=0)


# -- w14: rolling cross-series correlation (round 10) ------------------------


def test_rolling_correlation_pins_planted_extremes(spark):
    """A perfectly co-moving pair pins +1, a perfectly anti-moving pair
    pins -1 (up to the documented 1e-4 quantization), constant series
    yield NULL (zero variance), and every value stays in [-1, 1]."""
    import datetime as dt

    from pyspark.sql import functions as F

    from stock_chart_kafka_streams_spark.operators.windows_ext import (
        rolling_correlation,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(30):
        ts = t0 + dt.timedelta(minutes=i)
        base = 100.0 + ((i * 17) % 13)
        rows.append(("UP", "MINUTE", ts, base))
        rows.append(("COPY", "MINUTE", ts, 2.0 * base + 5.0))  # corr +1
        rows.append(("ANTI", "MINUTE", ts, 300.0 - base))      # corr -1
        rows.append(("FLAT", "MINUTE", ts, 42.0))              # zero var
    df = spark.createDataFrame(
        rows, "symbol string, time_frame string, bucket_start timestamp, close double"
    )
    plus = rolling_correlation(df, "UP", "COPY", n=10).collect()
    minus = rolling_correlation(df, "UP", "ANTI", n=10).collect()
    flat = rolling_correlation(df, "UP", "FLAT", n=10).collect()
    assert len(plus) == 30
    for r in plus[1:]:
        assert abs(r["corr_10"] - 1.0) < 1e-6
    for r in minus[1:]:
        assert abs(r["corr_10"] + 1.0) < 1e-6
    for r in flat:
        assert r["corr_10"] is None
    # warm-up row (window of 1) has zero variance -> NULL
    assert plus[0]["corr_10"] is None

    import pytest as _pytest

    from stock_chart_kafka_streams_spark.operators.windows_ext import (
        rolling_correlation_sql,
    )

    with _pytest.raises(ValueError, match="n must"):
        rolling_correlation(df, "UP", "COPY", n=1)
    with _pytest.raises(ValueError, match="n must"):
        rolling_correlation_sql("SELECT 1", "a", "b", n=0)


def test_rolling_correlation_high_prices_no_int64_wrap(spark, duck):
    """Regression (r10 advice, medium): with x = price*1e4, sum(x*x) over
    n=20 exceeds int64 above ~$15k prices — the original BIGINT window
    sums WRAPPED silently in Spark while DuckDB promoted to HUGEINT, so
    the twin diverged exactly where Spark was wrong. The DECIMAL(38,0)
    sums must (a) keep a perfectly co-moving BTC-scale pair pinned at
    corr=+1 and (b) hash-match the DuckDB twin row for row.

    Fixture teeth: int64 wrap-around CANCELS in the k*Σx² − (Σx)²
    difference when the TRUE difference still fits int64 (modular
    arithmetic), so small swings at high absolute prices would pass even
    under the old code. The real silent-wrong region is window variance:
    n²σ²·10⁸ > 2⁶³ ⇔ σ·10⁴ > 3.03e9/n — at n=20 a window price-σ above
    ~$15k. This fixture swings 20k→320k (σ ≈ 9e4), landing the true
    variance terms at ~3e20, firmly past int64."""
    import datetime as dt

    from stock_chart_kafka_streams_spark.operators.windows_ext import (
        rolling_correlation,
        rolling_correlation_sql,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(40):
        ts = t0 + dt.timedelta(minutes=i)
        base = 20_000.0 + 25_000.0 * ((i * 17) % 13)
        rows.append(("BIGA", "MINUTE", ts, base))
        rows.append(("BIGB", "MINUTE", ts, 1.5 * base + 1000.0))  # corr +1
    df = spark.createDataFrame(
        rows, "symbol string, time_frame string, bucket_start timestamp, close double"
    )
    got = rolling_correlation(df, "BIGA", "BIGB", n=20).collect()
    assert len(got) == 40
    for r in got[1:]:
        assert r["corr_20"] is not None
        assert abs(r["corr_20"] - 1.0) < 1e-6, r

    # exact twin parity on the same fixture (values, not just shape)
    inner = " UNION ALL ".join(
        f"SELECT '{s}' AS symbol, 'MINUTE' AS time_frame, "
        f"TIMESTAMP '{ts.isoformat(sep=' ')}' AS bucket_start, "
        f"CAST({c!r} AS DOUBLE) AS \"close\""
        for (s, _f, ts, c) in rows
    )
    want = duck.sql(
        rolling_correlation_sql(inner, "BIGA", "BIGB", n=20)
    ).fetchall()
    assert len(want) == len(got)
    for g, w in zip(got, want):
        assert g["bucket_start"] == w[1]
        if w[4] is None:
            assert g["corr_20"] is None
        else:
            assert g["corr_20"] == w[4], (g["bucket_start"], g["corr_20"], w[4])


# -- w15: all-pairs rolling correlation matrix (round 11) --------------------


def test_rolling_correlation_matrix_pins_extremes_and_equals_pairwise(spark, duck):
    """The matrix must (a) pin a co-moving pair at +1, an anti-moving
    pair at -1 and a constant series at NULL (the w14 planted extremes),
    (b) slice-equal the single-pair operator for every pair (one plan,
    not S^2 window passes, but identical values), and (c) hash-match the
    DuckDB twin on the full matrix."""
    import datetime as dt

    from stock_chart_kafka_streams_spark.operators.windows_ext import (
        rolling_correlation,
        rolling_correlation_matrix,
        rolling_correlation_matrix_sql,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(30):
        ts = t0 + dt.timedelta(minutes=i)
        base = 100.0 + ((i * 17) % 13)
        rows.append(("UP", "MINUTE", ts, base))
        rows.append(("COPY", "MINUTE", ts, 2.0 * base + 5.0))   # corr +1
        rows.append(("ANTI", "MINUTE", ts, 300.0 - base))       # corr -1
        rows.append(("FLAT", "MINUTE", ts, 42.0))               # zero var
    df = spark.createDataFrame(
        rows, "symbol string, time_frame string, bucket_start timestamp, close double"
    )
    mat = rolling_correlation_matrix(df, n=10).collect()
    # 4 symbols -> 6 upper-triangle pairs x 30 aligned buckets
    assert len(mat) == 6 * 30
    by_pair: dict = {}
    for r in mat:
        by_pair.setdefault((r["sym_a"], r["sym_b"]), []).append(r)
    assert set(by_pair) == {
        ("ANTI", "COPY"), ("ANTI", "FLAT"), ("ANTI", "UP"),
        ("COPY", "FLAT"), ("COPY", "UP"), ("FLAT", "UP"),
    }
    for r in by_pair[("COPY", "UP")][1:]:
        assert abs(r["corr_10"] - 1.0) < 1e-6
    for r in by_pair[("ANTI", "UP")][1:]:
        assert abs(r["corr_10"] + 1.0) < 1e-6
    for r in by_pair[("FLAT", "UP")]:
        assert r["corr_10"] is None

    # slice == single-pair operator (identical decimal sums)
    pair_df = rolling_correlation(df, "UP", "COPY", n=10).collect()
    want = {r["bucket_start"]: r["corr_10"] for r in pair_df}
    for r in by_pair[("COPY", "UP")]:
        # single-pair form tags (UP, COPY); matrix orders sym_a < sym_b —
        # correlation is symmetric so values must agree exactly
        assert r["corr_10"] == want[r["bucket_start"]]

    # full-matrix twin parity
    inner = " UNION ALL ".join(
        f"SELECT '{s}' AS symbol, 'MINUTE' AS time_frame, "
        f"TIMESTAMP '{ts.isoformat(sep=' ')}' AS bucket_start, "
        f"CAST({c!r} AS DOUBLE) AS \"close\""
        for (s, _f, ts, c) in rows
    )
    got = sorted(
        (r["sym_a"], r["sym_b"], r["bucket_start"], r["corr_10"]) for r in mat
    )
    want_rows = sorted(
        (w[0], w[1], w[2], w[5])
        for w in duck.sql(
            rolling_correlation_matrix_sql(inner, n=10)
        ).fetchall()
    )
    assert len(got) == len(want_rows)
    for g, w in zip(got, want_rows):
        assert g[:3] == w[:3]
        assert (g[3] is None) == (w[3] is None)
        if g[3] is not None:
            assert g[3] == w[3], (g, w)

    # symbols filter bounds the matrix; <2 symbols rejected
    small = rolling_correlation_matrix(df, symbols=["UP", "COPY"], n=10)
    assert small.count() == 30
    import pytest as _pytest

    with _pytest.raises(ValueError, match="at least 2"):
        rolling_correlation_matrix(df, symbols=["UP"], n=10)
    with _pytest.raises(ValueError, match="n must"):
        rolling_correlation_matrix(df, n=1)
