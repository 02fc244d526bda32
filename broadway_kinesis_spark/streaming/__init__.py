"""Streaming semantics (sources, windows, health) — SURVEY.md §2.A."""
