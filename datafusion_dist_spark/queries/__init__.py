"""Named query corpus — one module per SURVEY.md §2 capability group."""
