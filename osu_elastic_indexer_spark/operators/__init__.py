"""Engine operators (SURVEY.md §2): build, search, dedup, similarity, routing."""
