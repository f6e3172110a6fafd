"""Custom stateful streaming operator: running VWAP per symbol.

Demonstrates the engine's extension point for operators Spark's built-in
windowed aggregations cannot express: arbitrary per-key state evolved
across micro-batches with ``applyInPandasWithState`` (the PySpark
equivalent of the reference's hand-written RocksDB aggregator callbacks,
``CandlestickAggregator.kt:391-450`` — but per-batch Arrow-vectorized
instead of per-record).

Running VWAP (volume-weighted average price since stream start) needs two
scalars of state per symbol: Σ(price·quantity) and Σ(quantity). Each
micro-batch emits one row per active symbol with the updated cumulative
VWAP — a continuously-refined metric no tumbling window produces.

State size: 16 bytes per symbol, independent of stream length — safe at
any scale; hot symbols cost one task each per batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

OUTPUT_SCHEMA = (
    "symbol string, batch_trades long, cum_volume long, cum_notional double, "
    "vwap double"
)
STATE_SCHEMA = "cum_pv double, cum_vol long"


def running_vwap(trades: DataFrame) -> DataFrame:
    """Per-symbol cumulative VWAP, one emission per symbol per micro-batch.

    The update function is self-contained (pandas only) so Python workers
    need no package path.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        import pandas as pd

        (symbol,) = key
        if state.exists:
            cum_pv, cum_vol = state.get
        else:
            cum_pv, cum_vol = 0.0, 0
        n = 0
        for pdf in pdfs:
            n += len(pdf)
            cum_pv += float((pdf["price"] * pdf["quantity"]).sum())
            cum_vol += int(pdf["quantity"].sum())
        state.update((cum_pv, cum_vol))
        yield pd.DataFrame(
            [
                {
                    "symbol": symbol,
                    "batch_trades": n,
                    "cum_volume": cum_vol,
                    "cum_notional": cum_pv,
                    "vwap": cum_pv / cum_vol if cum_vol else None,
                }
            ]
        )

    return trades.groupBy("symbol").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
