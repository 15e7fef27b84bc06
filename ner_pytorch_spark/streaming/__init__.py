"""Structured Streaming variants of the ingestion stages."""
