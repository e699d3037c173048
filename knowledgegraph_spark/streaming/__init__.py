"""Streaming & incremental ingestion."""
