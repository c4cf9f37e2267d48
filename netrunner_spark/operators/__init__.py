"""Frontier/relational operators (SURVEY.md §2.3-2.7) + training-data ops."""
