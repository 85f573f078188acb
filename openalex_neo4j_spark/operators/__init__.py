"""Reusable DataFrame operators (SURVEY.md §2 inventory + scale additions)."""
