"""Relational operators: candles, dedup, similarity, text, multimodal."""
