"""Streaming + batch sources (SURVEY.md §2.A)."""
