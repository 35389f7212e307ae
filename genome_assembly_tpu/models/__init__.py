"""Pipeline-level models: parity and fast assembly engines."""
