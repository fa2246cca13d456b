"""Column-level helper functions (hashing, span algebra, text stats)."""
