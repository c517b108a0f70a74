"""Structured Streaming top-n (incremental rollup maintenance)."""
