"""Declared queries: LLM-data-pipeline operators (SURVEY §2.3 E19-E22).

Filled in Phase 3."""
