"""Deterministic rule sieves (SURVEY.md §2.5)."""
