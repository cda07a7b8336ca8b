"""Incremental / streaming semantics (SURVEY.md §2.8): cursor resume,
add/delete routing, two-phase cutover, compaction."""
