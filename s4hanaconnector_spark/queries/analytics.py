"""Declared queries: batch analytics surface (SURVEY §2.3 E23-E29).

Filled in Phase 2."""
