"""asof_join: backward as-of semantics vs. a brute-force theta-join.

The operator (operators/joins.py::asof_join) is the union+running-last
plan; the brute force here is the semantic definition — for each left row,
the right row with the greatest right_ts <= left_ts per key. They must
agree exactly, including timestamp ties (>= semantics: a right row AT the
left timestamp matches) and left rows with no match (nulls).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from stock_chart_kafka_streams_spark.operators.joins import asof_join

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(minutes: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [
            ("A", _ts(0.5), 10.0),   # before any right row for A -> nulls
            ("A", _ts(2.0), 11.0),   # tie: right row exactly at 2.0 matches
            ("A", _ts(3.7), 12.0),
            ("B", _ts(1.0), 20.0),
            ("B", _ts(9.0), 21.0),
            ("C", _ts(5.0), 30.0),   # key with no right rows at all
        ],
        "symbol string, ts timestamp, price double",
    )
    right = spark.createDataFrame(
        [
            ("A", _ts(1.0), 100.0),
            ("A", _ts(2.0), 101.0),
            ("A", _ts(3.0), 102.0),
            ("B", _ts(0.0), 200.0),
            ("B", _ts(8.0), 201.0),
        ],
        "symbol string, rts timestamp, ref double",
    )
    return left, right


def _brute_force(left, right):
    """Greatest right_ts <= left_ts per key, via theta-join + max(struct)."""
    j = left.join(
        right,
        (left["symbol"] == right["symbol"]) & (right["rts"] <= left["ts"]),
        "left",
    ).select(
        left["symbol"], left["ts"], left["price"], right["rts"], right["ref"]
    )
    return (
        j.groupBy("symbol", "ts", "price")
        .agg(F.max(F.struct("rts", "ref")).alias("best"))
        .select("symbol", "ts", "price", F.col("best.ref").alias("ref"))
    )


def test_asof_matches_brute_force(sides):
    left, right = sides
    got = asof_join(left, right, on=["symbol"], left_ts="ts", right_ts="rts")
    want = _brute_force(left, right)
    key = lambda r: (r["symbol"], r["ts"])
    got_rows = {key(r): r.asDict() for r in got.collect()}
    want_rows = {key(r): r.asDict() for r in want.collect()}
    assert set(got_rows) == set(want_rows) and len(got_rows) == left.count()
    for k, w in want_rows.items():
        assert got_rows[k]["ref"] == w["ref"], k


def _brute_force_forward(left, right):
    """Least right_ts >= left_ts per key, via theta-join + min(struct)."""
    j = left.join(
        right,
        (left["symbol"] == right["symbol"]) & (right["rts"] >= left["ts"]),
        "left",
    ).select(
        left["symbol"], left["ts"], left["price"], right["rts"], right["ref"]
    )
    return (
        j.groupBy("symbol", "ts", "price")
        .agg(F.min(F.struct("rts", "ref")).alias("best"))
        .select("symbol", "ts", "price", F.col("best.ref").alias("ref"))
    )


def test_asof_forward_matches_brute_force(sides):
    left, right = sides
    got = asof_join(
        left, right, on=["symbol"], left_ts="ts", right_ts="rts",
        direction="forward",
    )
    want = _brute_force_forward(left, right)
    key = lambda r: (r["symbol"], r["ts"])
    got_rows = {key(r): r.asDict() for r in got.collect()}
    want_rows = {key(r): r.asDict() for r in want.collect()}
    assert set(got_rows) == set(want_rows) and len(got_rows) == left.count()
    for k, w in want_rows.items():
        assert got_rows[k]["ref"] == w["ref"], k


def test_asof_forward_tie_and_null_semantics(sides):
    left, right = sides
    rows = {
        (r["symbol"], r["ts"]): r
        for r in asof_join(
            left, right, on=["symbol"], left_ts="ts", right_ts="rts",
            payload=["rts", "ref"], direction="forward",
        ).collect()
    }
    assert rows[("A", _ts(0.5))]["ref"] == 100.0         # next right at 1.0
    assert rows[("A", _ts(2.0))]["ref"] == 101.0         # <= tie matches
    assert rows[("A", _ts(3.7))]["ref"] is None          # after last right row
    assert rows[("B", _ts(9.0))]["ref"] is None
    assert rows[("C", _ts(5.0))]["ref"] is None          # key absent on right


def test_asof_rejects_bad_direction(sides):
    left, right = sides
    with pytest.raises(ValueError, match="direction"):
        asof_join(left, right, on=["symbol"], left_ts="ts", right_ts="rts",
                  direction="nearest")


def test_asof_tie_and_null_semantics(sides):
    left, right = sides
    rows = {
        (r["symbol"], r["ts"]): r
        for r in asof_join(
            left, right, on=["symbol"], left_ts="ts", right_ts="rts",
            payload=["rts", "ref"],
        ).collect()
    }
    assert rows[("A", _ts(0.5))]["ref"] is None          # before first right row
    assert rows[("A", _ts(2.0))]["ref"] == 101.0         # >= tie matches
    assert rows[("A", _ts(3.7))]["ref"] == 102.0
    assert rows[("C", _ts(5.0))]["ref"] is None          # key absent on right
    assert rows[("C", _ts(5.0))]["rts"] is None


def test_asof_plan_has_no_nested_loop(sides):
    """The whole point: the plan must be shuffle+sort+window, never a
    BroadcastNestedLoopJoin over the non-equi condition."""
    left, right = sides
    plan = (
        asof_join(left, right, on=["symbol"], left_ts="ts", right_ts="rts")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan
    assert "Window" in plan


def _rows_by_key(df):
    return {
        (r["symbol"], r["ts"]): tuple(sorted(r.asDict().items()))
        for r in df.collect()
    }


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("split_seconds", [60, 90, 3600])
def test_asof_split_equals_unsplit(sides, direction, split_seconds):
    """split_seconds (r9 verdict #3) must be a pure execution-shape
    change: identical rows to the unsplit join for every split width —
    including widths that land ties and carry-across-empty-bucket cases
    on bucket boundaries (60s puts each minute in its own bucket, so
    most matches cross buckets; 90s misaligns the boundary)."""
    left, right = sides
    base = asof_join(
        left, right, on=["symbol"], left_ts="ts", right_ts="rts",
        direction=direction,
    )
    split = asof_join(
        left, right, on=["symbol"], left_ts="ts", right_ts="rts",
        direction=direction, split_seconds=split_seconds,
    )
    assert sorted(split.columns) == sorted(base.columns)
    assert _rows_by_key(split.select(*base.columns)) == _rows_by_key(base)


def test_asof_split_carries_per_column_nulls(spark):
    """The unsplit form carries each payload column independently
    (last NON-NULL per column); the bucket carry must reproduce that,
    not 'whole latest row' semantics: a right row with a NULL in one
    payload column must not blank the carried value of that column."""
    left = spark.createDataFrame(
        [("A", _ts(10.0), 1.0)], "symbol string, ts timestamp, price double"
    )
    right = spark.createDataFrame(
        [
            ("A", _ts(1.0), 100.0, 7.0),
            ("A", _ts(2.0), 101.0, None),  # latest row, NULL in col2
        ],
        "symbol string, rts timestamp, ref double, extra double",
    )
    for split in (None, 60):
        rows = asof_join(
            left, right, on=["symbol"], left_ts="ts", right_ts="rts",
            split_seconds=split,
        ).collect()
        assert len(rows) == 1
        assert rows[0]["ref"] == 101.0 and rows[0]["extra"] == 7.0, split


def test_asof_rejects_nonpositive_split(sides):
    left, right = sides
    with pytest.raises(ValueError, match="split_seconds"):
        asof_join(left, right, on=["symbol"], left_ts="ts", right_ts="rts",
                  split_seconds=0)


def test_asof_rejects_colliding_payload(sides):
    """A payload column that already exists on the left would silently
    produce duplicate/ambiguous output columns — must raise instead."""
    left, right = sides
    with pytest.raises(ValueError, match="payload column"):
        asof_join(
            left,
            right.withColumnRenamed("ref", "price"),  # collides with left.price
            on=["symbol"],
            left_ts="ts",
            right_ts="rts",
        )


def test_backlog_matches_duckdb_oracle(spark, duck):
    """j4 vs. the DuckDB unnest(generate_series) oracle at sf0.001."""
    from stock_chart_kafka_streams_spark.operators.joins import (
        OPEN_ORDER_BACKLOG_SQL,
        open_order_backlog_by_day,
    )

    got = {
        r["day"]: (r["n_open"], r["qty_open"])
        for r in open_order_backlog_by_day(spark, "/root/testdata/sf0.001").collect()
    }
    want = {
        r.day.to_pydatetime(): (int(r.n_open), int(r.qty_open))
        for r in duck.sql(OPEN_ORDER_BACKLOG_SQL).df().itertuples()
    }
    assert got == want and len(got) > 0


# -- j8: bucketized range-lookup join --------------------------------------


def test_range_lookup_join_semantics(spark):
    from stock_chart_kafka_streams_spark.operators.joins import range_lookup_join

    facts = spark.createDataFrame(
        [(1, 5.0), (2, 150.0), (3, 250.0), (4, 9999.0)], "id long, v double"
    )
    ranges = spark.createDataFrame(
        [("a", 0.0, 200.0), ("b", 100.0, 300.0)], "tag string, lo double, hi double"
    )
    out = range_lookup_join(facts, ranges, "v", bucket_width=50.0)
    got = sorted((r["id"], r["tag"]) for r in out.collect())
    # 5.0 -> a only; 150.0 -> both (overlap); 250.0 -> b only ([lo,hi)
    # half-open); 9999.0 -> no range, dropped (inner)
    assert got == [(1, "a"), (2, "a"), (2, "b"), (3, "b")]
    # hi is exclusive
    edge = range_lookup_join(
        spark.createDataFrame([(9, 200.0)], "id long, v double"),
        ranges,
        "v",
        bucket_width=50.0,
    )
    assert [r["tag"] for r in edge.collect()] == ["b"]


def test_range_lookup_join_plans_equi_not_nested_loop(spark):
    """The whole point: the bucketized form must plan as a broadcast
    EQUI-join (hash join on the bucket id), never BroadcastNestedLoopJoin
    — per-fact work is co-bucketed candidates, not |ranges|."""
    from stock_chart_kafka_streams_spark.operators.joins import range_lookup_join

    facts = spark.range(1000).select(F.col("id"), (F.col("id") * 7.7).alias("v"))
    ranges = spark.createDataFrame(
        [(k, float(k * k), float((k + 1) * (k + 1))) for k in range(20)],
        "band long, lo double, hi double",
    )
    out = range_lookup_join(facts, ranges, "v", bucket_width=100.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_range_lookup_join_rejects_bad_width(spark):
    from stock_chart_kafka_streams_spark.operators.joins import range_lookup_join

    facts = spark.createDataFrame([(1, 5.0)], "id long, v double")
    with pytest.raises(ValueError, match="bucket_width"):
        range_lookup_join(facts, facts, "v", bucket_width=0.0)
