"""Placeholder — populated in subsequent commits."""
