"""streaming_batch operators — filled in by its milestone (SURVEY.md §2)."""
