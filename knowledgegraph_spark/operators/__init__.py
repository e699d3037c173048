"""Operator library: each module is one stage/operator family from SURVEY.md §2."""
