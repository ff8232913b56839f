"""Structured Streaming variants of the ingest/extraction path."""
