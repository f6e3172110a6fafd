"""Relational join operators over the star schema.

The reference has no joins of any kind (SURVEY §2.6) — its one "entity" is
the trade stream. A real analytics engine joins fact tables against
dimensions, so these queries exercise Spark's two join strategies on the
driver's TPC-H-ish tables and pin the planning decisions this engine wants:

- **broadcast** for small dimensions (region/nation/customer): the dim side
  ships to every executor, the fact scan stays shuffle-free. `broadcast()`
  hints make it explicit rather than relying on the autoBroadcast
  threshold — at 100 TB the fact side must never shuffle for a dim join.
- **shuffle hash/sort-merge** for fact-to-fact (orders ⋈ lineitem): both
  sides hash-partition on the key; AQE picks hash vs merge and splits skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stock_chart_kafka_streams_spark.session import tune_session


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune_session(spark)
    return spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")


def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-nation revenue rollup: fact-to-fact shuffle join
    (lineitem ⋈ orders) plus broadcast dimension joins
    (customer → nation → region)."""
    lineitem = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")

    # money rounded to cents PER ROW then summed as integers: the per-row
    # double arithmetic is bit-identical across engines, and integer sums
    # are order-independent — unlike a double sum over 100k+ rows, whose
    # accumulation-order error exceeds the oracle's 9dp rounding.
    revenue_cents = F.sum(
        F.round(
            lineitem["l_extendedprice"] * (1 - lineitem["l_discount"]) * 100
        ).cast("long")
    ).alias("revenue_cents")
    return (
        lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
        .join(
            F.broadcast(customer), orders["o_custkey"] == customer["c_custkey"]
        )
        .join(F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .groupBy(
            region["r_name"].alias("region_name"),
            nation["n_name"].alias("nation_name"),
        )
        .agg(
            revenue_cents,
            F.count("*").alias("n_items"),
        )
    )


REVENUE_BY_NATION_SQL = """
SELECT r.r_name AS region_name,
       n.n_name AS nation_name,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name
"""


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary over lineitem (pure aggregation —
    the classic scan-heavy benchmark shape)."""
    li = _t(spark, sf_dir, "lineitem")
    cutoff = F.lit("1998-09-02").cast("timestamp")
    return (
        li.where(F.col("l_shipdate") <= cutoff)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            # quantities are integral; money summed as per-row cents (see
            # revenue_by_nation) — both order-independent exact integers
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
                "sum_base_price_cents"
            ),
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                ).cast("long")
            ).alias("sum_disc_price_cents"),
            F.avg("l_quantity").alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_price_cents,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_price_cents,
       avg(l_quantity) AS avg_qty,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def top_revenue_orders(
    spark: SparkSession,
    sf_dir: str,
    segment: str = "BUILDING",
    cutoff: str = "1995-03-15",
    k: int = 10,
) -> DataFrame:
    """TPC-H Q3-shaped top-k: the k highest-revenue orders from one customer
    segment, ordered before ``cutoff`` with lineitems shipped after it.

    Planning shape this engine wants at 100 TB: the segment filter prunes
    customer BEFORE the broadcast (semi-join reduction), orders ⋈ lineitem
    is the one fact-fact shuffle, and the final top-k is a TakeOrdered —
    per-partition heap + driver merge of k rows, never a global sort.
    """
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"
    )
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    cust = (
        _t(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == segment)
        .select("c_custkey")
    )
    cut = F.lit(cutoff).cast("timestamp")
    return (
        li.where(F.col("l_shipdate") > cut)
        .join(
            orders.where(F.col("o_orderdate") < cut).join(
                F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"]
            ),
            li["l_orderkey"] == orders["o_orderkey"],
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                ).cast("long")
            ).alias("revenue_cents")
        )
        .orderBy(
            F.col("revenue_cents").desc(),
            F.col("o_orderdate").asc(),
            F.col("l_orderkey").asc(),
        )
        .limit(k)
    )


def top_revenue_orders_sql(segment: str = "BUILDING", cutoff: str = "1995-03-15", k: int = 10) -> str:
    return f"""
SELECT l.l_orderkey,
       o.o_orderdate,
       o.o_orderpriority,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = '{segment}'
  AND o.o_orderdate < TIMESTAMP '{cutoff} 00:00:00'
  AND l.l_shipdate > TIMESTAMP '{cutoff} 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue_cents DESC, o.o_orderdate ASC, l.l_orderkey ASC
LIMIT {k}
"""


def customers_without_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join surface (NOT EXISTS): customers that never placed an
    URGENT-priority order, rolled up per market segment.

    LEFT ANTI join is the set-difference plan Spark executes without
    materializing the non-matching side's payload — the right side reduces
    to its join key before the shuffle (here further shrunk by the
    priority filter), which is what makes NOT EXISTS tractable when the
    right side is a 100 TB fact table."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment", "c_acctbal")
    urgent = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        cust.join(urgent, cust["c_custkey"] == urgent["o_custkey"], "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(F.round(F.col("c_acctbal") * 100).cast("long")).alias(
                "acctbal_cents"
            ),
        )
    )


CUSTOMERS_WITHOUT_URGENT_SQL = """
SELECT c.c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS BIGINT) AS acctbal_cents
FROM customer c
WHERE NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
)
GROUP BY c.c_mktsegment
"""


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload: list[str] | None = None,
    direction: str = "backward",
    split_seconds: int | None = None,
) -> DataFrame:
    """As-of join: enrich each ``left`` row with the payload of the
    latest ``right`` row whose ``right_ts`` <= ``left_ts`` per ``on`` key
    (``direction="backward"``, the default), or the earliest right row
    whose ``right_ts`` >= ``left_ts`` (``direction="forward"``).

    The canonical time-series join the reference's domain implies (price vs.
    last completed candle) but never implements (SURVEY §2.6 — no joins of
    any kind). Matches DuckDB ``ASOF LEFT JOIN .. ON l.key = r.key AND
    l.ts >= r.ts`` (backward) / ``l.ts <= r.ts`` (forward) and pandas
    ``merge_asof(direction="backward"|"forward")``.

    Implementation — union + running ``last(ignorenulls)`` — NOT a range
    join: both sides are tagged and unioned, sorted once per key on
    (timestamp, side) with right rows winning timestamp ties (>= semantics),
    and the right payload is carried forward by a running window. Cost is
    ONE hash-partition shuffle on ``on`` plus one sort — linear in
    |left| + |right|, with none of the candidate-pair explosion of the
    naive ``l.ts >= r.ts`` theta-join (which Spark plans as
    BroadcastNestedLoop for non-equi conditions).

    Scale posture: the window partitions by ``on`` alone, so one key's full
    history lands in one task; key cardinality = symbols and rows-per-key =
    trades/symbol, which sorts in-memory per task at any realistic symbol
    count. For a HOT key (one symbol spanning years of ticks),
    ``split_seconds`` (round 10, r9 verdict #3 — previously a docstring
    instruction to the caller) automates the coarse-bucket pre-split:

    - every unioned row gets a coarse bucket ``floor(epoch / split)``;
    - the carry ACROSS buckets is computed at bucket granularity: per
      (key, bucket) the right side reduces map-side to its last (backward;
      first, forward) non-NULL value PER PAYLOAD COLUMN (``max_by``/
      ``min_by`` keyed on the timestamp only where the column is non-NULL,
      mirroring the per-column ``last(ignorenulls)`` carry semantics of
      the unsplit form exactly), and one tiny window over those
      one-row-per-bucket aggregates — ordered so a bucket sees only
      STRICTLY earlier (backward) / later (forward) buckets — yields each
      left bucket's carry-in;
    - the carry-in enters the bucket as a synthetic right row sorted
      before every real row, and the running window partitions by
      (key, bucket) instead of (key).

    Identical results by construction (equality-tested on ties, NULL
    payloads, and empty buckets); the per-task sort shrinks from the
    key's full history to one bucket. Requires non-NULL timestamps on
    both sides (bucket assignment); pick ``split_seconds`` so a bucket
    holds ~10⁶ rows of the hot key.

    ``right`` must be unique per (``on``, ``right_ts``) — e.g. a candle
    frame keyed by bucket — otherwise which tied right row wins is
    plan-dependent.
    """
    from pyspark.sql.window import Window

    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    payload = payload if payload is not None else [
        c for c in right.columns if c not in set(on) | {right_ts}
    ]
    left_payload = [c for c in left.columns if c not in on]
    clash = sorted(set(payload) & set(left_payload))
    if clash:
        raise ValueError(
            f"asof_join payload column(s) {clash} already exist on the left "
            "side; rename them on one side (e.g. right.withColumnRenamed) or "
            "pass an explicit non-colliding `payload` list"
        )
    rtypes = dict(right.dtypes)
    ltypes = dict(left.dtypes)

    u_left = left.select(
        *on,
        F.col(left_ts).alias("__asof_ts"),
        F.lit(0).alias("__asof_side"),
        *left_payload,
        *[F.lit(None).cast(rtypes[c]).alias(f"__asof_{c}") for c in payload],
    )
    u_right = right.select(
        *on,
        F.col(right_ts).alias("__asof_ts"),
        F.lit(1).alias("__asof_side"),
        *[F.lit(None).cast(ltypes[c]).alias(c) for c in left_payload],
        *[F.col(c).alias(f"__asof_{c}") for c in payload],
    )
    if direction == "backward":
        # right rows sort BEFORE left rows at equal ts (side desc) so a
        # tied right row is inside the running frame: >= semantics.
        order = [F.col("__asof_ts").asc(), F.col("__asof_side").desc()]
    else:
        # forward: sort time DESCENDING (right still first at equal ts for
        # <= tie semantics); the running last() then carries the SMALLEST
        # right_ts >= left_ts. Deliberately NOT a currentRow..
        # unboundedFollowing frame: Spark has no running-frame optimization
        # for UNBOUNDED FOLLOWING and re-aggregates the suffix per row —
        # O(rows²) per key, measured as a hang at 5M rows. The reversed
        # running frame is O(rows), identical cost to backward.
        order = [F.col("__asof_ts").desc(), F.col("__asof_side").desc()]

    part_cols: list[str] = list(on)
    u = u_left.unionByName(u_right)
    if split_seconds is not None:
        from stock_chart_kafka_streams_spark.functions.timeframes import (
            coarse_bucket,
        )

        backward = direction == "backward"
        ts_type = dict(u_left.dtypes)["__asof_ts"]
        cb = coarse_bucket("__asof_ts", split_seconds)
        ul = u_left.withColumn("__asof_cb", cb)
        ur = u_right.withColumn("__asof_cb", cb)
        # Per (key, bucket): the right side's last/first non-NULL value
        # per payload column — map-side-combinable aggregates, so the hot
        # key's rows reduce to one row per bucket before any wide window.
        pick = F.max_by if backward else F.min_by
        rb = ur.groupBy(*on, "__asof_cb").agg(
            *[
                pick(
                    F.col(f"__asof_{c}"),
                    F.when(
                        F.col(f"__asof_{c}").isNotNull(), F.col("__asof_ts")
                    ),
                ).alias(f"__asof_{c}")
                for c in payload
            ]
        )
        lb = ul.select(*on, "__asof_cb").distinct()
        blb = lb.select(
            *on,
            "__asof_cb",
            F.lit(0).alias("__bside"),
            *[F.lit(None).cast(rtypes[c]).alias(f"__asof_{c}") for c in payload],
        )
        brb = rb.select(
            *on,
            "__asof_cb",
            F.lit(1).alias("__bside"),
            *[F.col(f"__asof_{c}") for c in payload],
        )
        # A left bucket must see only STRICTLY earlier (backward) / later
        # (forward) right buckets: at equal cb the left bucket-row sorts
        # first (__bside asc), so same-bucket right rows stay out of its
        # running frame (they are handled inside the bucket window).
        border = [
            F.col("__asof_cb").asc() if backward else F.col("__asof_cb").desc(),
            F.col("__bside").asc(),
        ]
        bw = (
            Window.partitionBy(*on)
            .orderBy(*border)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carry_in = (
            blb.unionByName(brb)
            .select(
                *on,
                "__asof_cb",
                "__bside",
                *[
                    F.last(f"__asof_{c}", ignorenulls=True).over(bw).alias(
                        f"__asof_{c}"
                    )
                    for c in payload
                ],
            )
            .where(F.col("__bside") == 0)
            .drop("__bside")
        )
        pre = carry_in.select(
            *on,
            F.lit(None).cast(ts_type).alias("__asof_ts"),
            F.lit(1).alias("__asof_side"),
            *[F.lit(None).cast(ltypes[c]).alias(c) for c in left_payload],
            *[F.col(f"__asof_{c}") for c in payload],
            "__asof_cb",
            F.lit(1).alias("__asof_pre"),
        )
        u = (
            ul.withColumn("__asof_pre", F.lit(0))
            .unionByName(ur.withColumn("__asof_pre", F.lit(0)))
            .unionByName(pre)
        )
        part_cols = list(on) + ["__asof_cb"]
        order = [F.col("__asof_pre").desc()] + order
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carry = F.last
    return (
        u.select(
            *on,
            *left_payload,
            F.col("__asof_side"),
            *[
                carry(f"__asof_{c}", ignorenulls=True).over(w).alias(c)
                for c in payload
            ],
        )
        .where(F.col("__asof_side") == 0)
        .drop("__asof_side")
    )


def prev_close_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enrich every trade with the close (and bucket) of the most recent
    COMPLETED minute candle — i.e. as-of join trades against minute candles
    on ``bucket_end <= ts``. Trades before their symbol's first completed
    candle get nulls (left join)."""
    from stock_chart_kafka_streams_spark.operators.candles import candles
    from stock_chart_kafka_streams_spark.sources.trades import load_trades

    trades = load_trades(spark, sf_dir)
    mc = candles(trades, "MINUTE").select(
        "symbol",
        F.col("bucket_end"),
        F.col("close").alias("prev_close"),
        F.col("bucket_start").alias("prev_bucket_start"),
    )
    return asof_join(
        trades.select("symbol", "ts", "price"),
        mc,
        on=["symbol"],
        left_ts="ts",
        right_ts="bucket_end",
        payload=["prev_close", "prev_bucket_start"],
    )


def prev_close_enrichment_sql(trades_cte: str) -> str:
    """DuckDB oracle twin of :func:`prev_close_enrichment` — the native
    ``ASOF LEFT JOIN`` against the same minute-candle derivation."""
    return f"""
WITH {trades_cte},
minute_candles AS (
    SELECT symbol,
           date_trunc('minute', ts) AS bucket_start,
           date_trunc('minute', ts) + INTERVAL 1 MINUTE AS bucket_end,
           arg_max(price, ts) AS cls
    FROM trades GROUP BY 1, 2
)
SELECT t.symbol, t.ts, t.price,
       c.cls AS prev_close, c.bucket_start AS prev_bucket_start
FROM trades t
ASOF LEFT JOIN minute_candles c
  ON t.symbol = c.symbol AND t.ts >= c.bucket_end
"""


def next_open_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of twin of :func:`prev_close_enrichment`: enrich every
    trade with the open (and bucket) of the next minute candle STARTING at
    or after the trade — e.g. \"what does the market open at next?\" for
    event-study alignment. Trades after their symbol's last bucket start
    get nulls."""
    from stock_chart_kafka_streams_spark.operators.candles import candles
    from stock_chart_kafka_streams_spark.sources.trades import load_trades

    trades = load_trades(spark, sf_dir)
    mc = candles(trades, "MINUTE").select(
        "symbol",
        F.col("open").alias("next_open"),
        F.col("bucket_start").alias("next_bucket_start"),
    )
    return asof_join(
        trades.select("symbol", "ts", "price"),
        mc,
        on=["symbol"],
        left_ts="ts",
        right_ts="next_bucket_start",
        payload=["next_open", "next_bucket_start"],
        direction="forward",
    )


def next_open_enrichment_sql(trades_cte: str) -> str:
    """DuckDB oracle twin — native forward ``ASOF LEFT JOIN`` (l.ts <= r.ts)
    against the same minute-candle derivation."""
    return f"""
WITH {trades_cte},
minute_candles AS (
    SELECT symbol,
           date_trunc('minute', ts) AS bucket_start,
           arg_min(price, ts) AS opn
    FROM trades GROUP BY 1, 2
)
SELECT t.symbol, t.ts, t.price,
       c.opn AS next_open, c.bucket_start AS next_bucket_start
FROM trades t
ASOF LEFT JOIN minute_candles c
  ON t.symbol = c.symbol AND t.ts <= c.bucket_start
"""


def open_order_backlog_by_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily backlog: for each day, how many lineitems were ordered but not
    yet shipped (30-day horizon) and how much quantity they represent.

    The scalable pattern for point-in-interval analytics: instead of a
    non-equi range join (calendar ⋈ [start, end] — BroadcastNestedLoop in
    Spark), each interval EXPLODES into its member days via
    ``sequence(start, end, interval 1 day)`` and a plain groupBy counts
    them. Row expansion is bounded by the horizon (≤30×), the explode is
    map-side (no shuffle), and the single shuffle is the final small
    groupBy on day. The horizon cap is what makes this safe at 100 TB —
    unbounded interval lengths would need the bucketed-range-join variant.
    """
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity", "l_shipdate")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    j = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.date_trunc("day", "o_orderdate").alias("o_day"),
            F.date_trunc("day", "l_shipdate").alias("ship_day"),
            F.col("l_quantity"),
        )
        .where(F.col("ship_day") > F.col("o_day"))
    )
    day = F.explode(
        F.sequence(
            F.col("o_day"),
            F.least(
                F.col("ship_day") - F.expr("INTERVAL 1 DAY"),
                F.col("o_day") + F.expr("INTERVAL 29 DAY"),
            ),
            F.expr("INTERVAL 1 DAY"),
        )
    ).alias("day")
    return (
        j.select(day, "l_quantity")
        .groupBy("day")
        .agg(
            F.count("*").alias("n_open"),
            F.sum(F.col("l_quantity").cast("long")).alias("qty_open"),
        )
    )


OPEN_ORDER_BACKLOG_SQL = """
WITH intervals AS (
    SELECT date_trunc('day', o.o_orderdate) AS o_day,
           date_trunc('day', l.l_shipdate) AS ship_day,
           l.l_quantity
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE date_trunc('day', l.l_shipdate) > date_trunc('day', o.o_orderdate)
),
days AS (
    SELECT unnest(generate_series(
               o_day,
               least(ship_day - INTERVAL 1 DAY, o_day + INTERVAL 29 DAY),
               INTERVAL 1 DAY)) AS day,
           l_quantity
    FROM intervals
)
SELECT CAST(day AS TIMESTAMP) AS day,
       CAST(count(*) AS BIGINT) AS n_open,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_open
FROM days
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# j8: bucketized range-lookup join (round 9)
# ---------------------------------------------------------------------------


def range_lookup_join(
    facts: DataFrame,
    ranges: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_width: float = 1000.0,
    broadcast_ranges: bool = True,
) -> DataFrame:
    """Point-in-range lookup join — classify every fact row into the
    range rows whose half-open interval ``[lo, hi)`` contains its value
    (IP->geo, price->band, timestamp->maintenance-window: the lookup
    shape every warehouse needs). A naive non-equi join plans as
    BroadcastNestedLoopJoin — every fact row evaluates EVERY range, which
    is quadratic work even when the ranges broadcast. This is the
    standard bucketization fix: each range explodes into the fixed-width
    buckets it covers, facts compute their bucket map-side
    (``floor(value / width)``), the join becomes an EQUI-join on the
    bucket id, and the exact containment predicate filters the handful of
    co-bucketed candidates. Per-fact work drops from O(|ranges|) to
    O(ranges overlapping one bucket) — O(1) when ``bucket_width`` is near
    the median range width.

    Overlapping ranges emit one output row per match (plain join
    semantics); facts matching no range drop (inner). At 100 TB the fact
    side never shuffles when ``broadcast_ranges`` (the exploded range
    table is |ranges| x mean-buckets-per-range rows — broadcastable for
    any realistic lookup table); set it False to shuffle both sides by
    bucket when the range table is itself huge.

    The bucket id is ``floor(v / width)`` in double arithmetic — one
    correctly-rounded division + exact floor, so the DuckDB twin buckets
    identically."""
    if not bucket_width > 0:
        raise ValueError(f"bucket_width must be > 0, got {bucket_width}")
    w = F.lit(float(bucket_width))
    b = ranges.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / w).cast("long"),
                F.floor(F.col(hi_col) / w).cast("long"),
            )
        ),
    )
    if broadcast_ranges:
        b = F.broadcast(b)
    v = F.col(value_col)
    return (
        facts.withColumn("__bucket", F.floor(v / w).cast("long"))
        .join(b, on="__bucket")
        .where((v >= F.col(lo_col)) & (v < F.col(hi_col)))
        .drop("__bucket")
    )


def price_band_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """j8 driver fixture: classify every lineitem's extended price into
    quadratically-widening price bands (band k covers
    [k^2 * 100, (k+1)^2 * 100) — deliberately irregular against the
    fixed 1000-wide buckets so ranges span 0..n buckets and buckets hold
    0..n ranges), then roll up count and exact-cents revenue per band."""
    lineitem = _t(spark, sf_dir, "lineitem")
    bands = spark.range(0, 25).select(
        F.col("id").alias("band"),
        (F.col("id") * F.col("id") * 100).cast("double").alias("lo"),
        ((F.col("id") + 1) * (F.col("id") + 1) * 100).cast("double").alias("hi"),
    )
    joined = range_lookup_join(
        lineitem.select("l_extendedprice"), bands, "l_extendedprice"
    )
    cents = F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
    return (
        joined.groupBy("band")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(cents).alias("revenue_cents"),
        )
        .orderBy("band")
    )


PRICE_BAND_LOOKUP_SQL = """
WITH bands AS (
    SELECT CAST(k AS BIGINT) AS band,
           CAST(k * k * 100 AS DOUBLE) AS lo,
           CAST((k + 1) * (k + 1) * 100 AS DOUBLE) AS hi
    FROM range(0, 25) AS t(k)
),
b AS (
    SELECT band, lo, hi,
           unnest(range(CAST(floor(lo / 1000.0) AS BIGINT),
                        CAST(floor(hi / 1000.0) AS BIGINT) + 1)) AS bucket
    FROM bands
)
SELECT b.band,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS revenue_cents
FROM lineitem l
JOIN b ON b.bucket = CAST(floor(l.l_extendedprice / 1000.0) AS BIGINT)
WHERE l.l_extendedprice >= b.lo AND l.l_extendedprice < b.hi
GROUP BY b.band
ORDER BY b.band
"""
