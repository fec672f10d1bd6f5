"""Incremental ingest: Structured Streaming over arriving span documents."""
