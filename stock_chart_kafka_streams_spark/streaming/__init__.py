"""Structured Streaming pipeline and idempotent serving-table sink."""
