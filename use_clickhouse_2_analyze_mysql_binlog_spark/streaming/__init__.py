"""Structured Streaming jobs (SURVEY.md §2.8, §7 Phase 2)."""
