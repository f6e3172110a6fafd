"""Thin HTTP entry points (plans/http_api.py) — reference Q9/Q10 parity.

The HTTP layer must be a pure adapter: every endpoint's JSON equals the
underlying oracle-checked CandleStore query serialized row-for-row, and
the error contract mirrors the reference controller's Spring behavior
(400 for bad params, 404 for unknown routes, 200 + [] for empty
results)."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest

from stock_chart_kafka_streams_spark.operators.candles import multi_frame_candles
from stock_chart_kafka_streams_spark.plans.http_api import (
    candle_rows_to_json,
    serve_in_background,
)
from stock_chart_kafka_streams_spark.plans.query_api import CandleStore
from stock_chart_kafka_streams_spark.sources.trades import load_trades

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def store(spark):
    return CandleStore(
        multi_frame_candles(load_trades(spark, SF_DIR), ["MINUTE", "HOUR"])
    )


@pytest.fixture(scope="module")
def base_url(store):
    server, url = serve_in_background(store)
    yield url
    server.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=120) as resp:
        return resp.status, json.loads(resp.read())


def _rows(df):
    return candle_rows_to_json(
        df.select(
            "symbol", "bucket_start", "bucket_end", "open", "high", "low",
            "close", "volume",
        ).collect()
    )


def test_symbols_endpoint_derives_catalog(store, base_url):
    status, got = _get(f"{base_url}/api/charts/symbols")
    assert status == 200
    want = [r["symbol"] for r in store.symbols().collect()]
    assert got == want and len(got) > 0


def test_range_endpoint_equals_store_query(store, base_url, spark):
    sym = store.symbols().collect()[0]["symbol"]
    lo, hi = "2024-01-01T00:00:00", "2026-01-01T00:00:00"
    status, got = _get(
        f"{base_url}/api/charts/{sym}?from={lo}&to={hi}&frame=HOUR"
    )
    assert status == 200
    assert got == _rows(store.get_candles(sym, "HOUR", lo, hi))
    assert len(got) > 0
    # serialized shape is the reference CandleStick record
    assert set(got[0]) == {
        "symbol", "open", "high", "low", "close", "volume",
        "startTime", "endTime",
    }
    assert got[0]["startTime"].endswith("Z")


def test_recent_endpoints_default_60_minutes(store, base_url):
    sym = store.symbols().collect()[0]["symbol"]
    want = _rows(store.recent(sym, "MINUTE", n=60))
    for path in (
        f"/api/charts/recent/{sym}",
        f"/api/charts/{sym}",  # no from/to -> recent branch, like the ref
    ):
        status, got = _get(f"{base_url}{path}")
        assert status == 200
        assert got == want


def test_recent_minutes_param(store, base_url):
    sym = store.symbols().collect()[0]["symbol"]
    status, got = _get(f"{base_url}/api/charts/recent/{sym}?minutes=5")
    assert status == 200
    assert got == _rows(store.recent(sym, "MINUTE", n=5))
    assert len(got) == 5


def test_unknown_symbol_is_empty_200(base_url):
    status, got = _get(f"{base_url}/api/charts/recent/NOPE")
    assert status == 200 and got == []


def _expect_status(url, code):
    try:
        urllib.request.urlopen(url, timeout=120)
    except urllib.error.HTTPError as exc:
        assert exc.code == code
        return json.loads(exc.read())
    raise AssertionError(f"expected HTTP {code} for {url}")


def test_error_contract(base_url):
    body = _expect_status(f"{base_url}/api/charts/X?frame=FORTNIGHT", 400)
    assert "error" in body
    _expect_status(f"{base_url}/api/charts/X?from=notadate&to=2024-01-01T00:00:00", 400)
    _expect_status(f"{base_url}/api/charts/recent/X?minutes=0", 400)
    _expect_status(f"{base_url}/api/charts/recent/X?minutes=abc", 400)
    _expect_status(f"{base_url}/api/nope", 404)
    _expect_status(f"{base_url}/api/charts/a/b/c", 404)


def test_http_over_disk_serving_table(spark, tmp_path):
    """The deployment shape: CandleStore.from_path over a partitioned
    serving table written by the MERGE sink, fronted by the HTTP layer —
    the bucket_date partition column must not leak into responses and
    range queries must still serve (pruned) correctly."""
    from stock_chart_kafka_streams_spark.streaming.sink import write_candles

    table = str(tmp_path / "serving")
    candles = multi_frame_candles(load_trades(spark, SF_DIR), ["HOUR"])
    write_candles(candles, table)
    disk_store = CandleStore.from_path(spark, table)
    server, url = serve_in_background(disk_store)
    try:
        status, syms = _get(f"{url}/api/charts/symbols")
        assert status == 200 and len(syms) > 0
        sym = syms[0]
        status, got = _get(
            f"{url}/api/charts/{sym}?from=2024-01-01T00:00:00"
            f"&to=2026-01-01T00:00:00&frame=HOUR"
        )
        assert status == 200 and len(got) > 0
        assert set(got[0]) == {
            "symbol", "open", "high", "low", "close", "volume",
            "startTime", "endTime",
        }
        want = _rows(
            disk_store.get_candles(
                sym, "HOUR", "2024-01-01T00:00:00", "2026-01-01T00:00:00"
            )
        )
        assert got == want
    finally:
        server.shutdown()
