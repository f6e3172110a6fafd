"""Query plans / read API over the candle serving table."""
