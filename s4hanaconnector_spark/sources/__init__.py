"""Sources: fixture loaders and deterministic synthetic CDC feeds."""
