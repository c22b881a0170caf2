"""Structured Streaming ingestion (SURVEY §2.8 / §7.2 M7)."""
