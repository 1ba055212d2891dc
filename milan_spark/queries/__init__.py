"""Named queries exercising each operator (SURVEY.md §2) with DuckDB oracles."""
