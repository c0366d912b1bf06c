"""Custom Spark data sources (SURVEY.md §4.2)."""
