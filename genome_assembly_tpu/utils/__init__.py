"""Utilities: caching, metrics, profiling, checkpointing, plotting."""
