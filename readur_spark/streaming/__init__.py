"""Structured Streaming ingest (watch-folder analog)."""
