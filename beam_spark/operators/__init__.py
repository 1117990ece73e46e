"""Operator library — one module per family from SURVEY.md §2."""
