"""Batch operator surface (SURVEY.md §2.B) — each module registers named queries."""
