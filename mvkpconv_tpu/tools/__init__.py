"""Command-line entry points (reference L6 scripts, SURVEY.md §1)."""
