"""Structured-streaming ingestion (extension beyond the pure-batch
reference — SURVEY.md §2.8)."""
