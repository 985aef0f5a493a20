"""Structured Streaming ingest (SURVEY EP1: stream → foreachBatch
upsert → queryable table)."""
