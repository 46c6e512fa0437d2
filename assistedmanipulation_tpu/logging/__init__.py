"""Structured CSV logging (reference L4 schema) for offline analysis."""
