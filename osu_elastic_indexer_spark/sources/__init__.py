"""Sources, sinks, fixtures, and the versioned-index catalog (SURVEY.md §2.1, §2.10)."""
