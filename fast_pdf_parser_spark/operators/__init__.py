"""Dataflow operators: hierarchical chunker, Spark pipeline, dedup,
similarity search, distribution analysis."""
