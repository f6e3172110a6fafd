"""Property-based check: engine candles vs an independent pandas OHLCV
implementation on hypothesis-generated trade sets (SURVEY §5.4)."""

import datetime as dt

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from stock_chart_kafka_streams_spark import candles

SYMBOLS = ["A", "B", "C"]
BASE = dt.datetime(2024, 1, 1)

trade_st = st.tuples(
    st.sampled_from(SYMBOLS),
    st.floats(min_value=0.01, max_value=1e6, allow_nan=False, allow_infinity=False),
    st.integers(min_value=0, max_value=1000),
    st.integers(min_value=0, max_value=3 * 24 * 3600),  # seconds offset, 3 days
)


def pandas_candles(rows, unit):
    df = pd.DataFrame(rows, columns=["symbol", "price", "quantity", "off"])
    df["ts"] = df["off"].map(lambda s: BASE + dt.timedelta(seconds=s))
    df["bucket"] = df["ts"].dt.floor(unit)
    out = {}
    for (sym, b), g in df.groupby(["symbol", "bucket"]):
        g = g.sort_values(["ts"], kind="stable")
        # event-time first/last; ties broken by min/max over tied rows the
        # same way min_by behaves is NOT guaranteed — avoid ts ties below
        out[(sym, b.to_pydatetime())] = (
            g.iloc[0]["price"],
            g["price"].max(),
            g["price"].min(),
            g.iloc[-1]["price"],
            int(g["quantity"].sum()),
        )
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(trade_st, min_size=1, max_size=60, unique_by=lambda t: (t[0], t[3])))
def test_candles_match_pandas_reference(spark, raw):
    # unique (symbol, offset) => no event-time ties => deterministic open/close
    rows = [
        (s, float(p), int(q), BASE + dt.timedelta(seconds=off))
        for s, p, q, off in raw
    ]
    df = spark.createDataFrame(
        rows, "symbol string, price double, quantity long, ts timestamp"
    )
    got = {
        (r["symbol"], r["bucket_start"]): (
            r["open"],
            r["high"],
            r["low"],
            r["close"],
            r["volume"],
        )
        for r in candles(df, "HOUR").collect()
    }
    want = pandas_candles(raw, "h")
    assert got == want
