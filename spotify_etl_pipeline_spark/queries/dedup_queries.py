"""Placeholder — populated in a later phase (see SURVEY.md §7)."""
