"""Structured Streaming tier (SURVEY.md §2.10 extensions)."""
