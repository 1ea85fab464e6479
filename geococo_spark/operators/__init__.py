"""Relational + spatial operators of the engine (SURVEY.md §2)."""
