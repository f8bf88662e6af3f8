"""windows operators — filled in by its milestone (SURVEY.md §2)."""
