"""Scalar / aggregate expression builders (pure Column functions)."""
