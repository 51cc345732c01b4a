"""Structured Streaming: incremental ingest and windowed aggregations."""
