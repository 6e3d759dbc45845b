"""Operator library — the relational + LLM-data-pipeline surface
(SURVEY.md §2.3 inventory)."""
