"""Deterministic synthetic fixtures (FIXTURES.md schemas)."""
