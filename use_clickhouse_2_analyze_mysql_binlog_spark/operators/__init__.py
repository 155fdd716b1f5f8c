"""Batch analytics operators (SURVEY.md §2)."""
