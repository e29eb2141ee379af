"""Placeholder — populated in a later milestone (SURVEY §7.1)."""
